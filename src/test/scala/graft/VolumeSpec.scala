package graft

import org.apache.spark.sql.functions._
import graft.operators.Volume

/** T1 hand-computed tests for the volume operator set (flexcalc R4-R26
  * analogs on the chunked-slab data model).
  */
class VolumeSpec extends SparkSpec {

  /** 4×4×4 volume, value = z*100 + y*10 + x (uniquely identifies voxels). */
  private def vol4 = Volume.fromArray(spark, "v",
    Array.tabulate(4, 4, 4)((z, y, x) => (z * 100 + y * 10 + x).toFloat))

  test("fromArray round-trips shape and values") {
    val df = vol4
    assert(df.count() === 16) // 4z × 4y lines
    val line = df.filter(col("z") === 2 && col("y") === 3).head().getSeq[Float](3)
    assert(line === Seq(230f, 231f, 232f, 233f))
  }

  test("crop selects the sub-volume and re-bases indices (R26)") {
    val c = Volume.crop(vol4, 1, 3, 1, 3, 1, 3)
    assert(c.count() === 4) // 2z × 2y
    val line = c.filter(col("z") === 0 && col("y") === 0).head().getSeq[Float](3)
    assert(line === Seq(111f, 112f)) // original (z=1,y=1,x=1..2)
  }

  test("binPool(2) averages 2×2×2 neighborhoods (R26)") {
    val b = Volume.binPool(vol4, 2)
    assert(b.count() === 4) // 2z × 2y lines of length 2
    val line = b.filter(col("z") === 0 && col("y") === 0).head().getSeq[Float](3)
    // mean of z∈{0,1}, y∈{0,1}, x∈{0,1}: 100*0.5 + 10*0.5 + 0.5 = 55.5
    assert(line.head === 55.5f)
    assert(line(1) === 57.5f) // x∈{2,3} → +2
  }

  test("binPool on lines narrower than k pools to empty, not garbage") {
    val thin = Volume.fromArray(spark, "t", Array.tabulate(2, 2, 3)((_, _, x) => x.toFloat))
    val pooled = Volume.binPool(thin, 4)
    assert(pooled.collect().forall(_.getSeq[Float](3).isEmpty))
  }

  test("hardThreshold zeroes below-threshold voxels only (R14)") {
    val t = Volume.hardThreshold(vol4, 200.0)
    val kept = t.select(explode(col("xs")).as("v")).filter(col("v") > 0).count()
    // surviving voxels: value >= 200 → z in {2,3} → 32 voxels
    assert(kept === 32)
  }

  test("histogram conserves voxel count (R16)") {
    val h = Volume.histogram(vol4, 0, 400, 4).collect()
    assert(h.map(_.getLong(1)).sum === 64)
    // bins of width 100 ↔ z-planes of 16 voxels each
    assert(h.map(_.getLong(1)).toSeq === Seq(16L, 16L, 16L, 16L))
  }

  test("centreOfMass of a single bright voxel is that voxel (R18)") {
    val one = Volume.fromArray(spark, "p",
      Array.tabulate(3, 3, 3)((z, y, x) => if (z == 2 && y == 1 && x == 0) 7f else 0f))
    val (cx, cy, cz) = Volume.centreOfMass(one)
    assert((cx, cy, cz) === ((0.0, 1.0, 2.0)))
  }

  test("boundingBox finds the above-threshold extent (R19)") {
    val bb = Volume.boundingBox(vol4, 310.0) // z=3, y>=1 region
    assert(bb.contains(((0, 3), (1, 3), (3, 3))))
    assert(Volume.boundingBox(vol4, 1e9).isEmpty)
  }

  test("translate shifts centre of mass by (dx, dy, dz) (R11)") {
    val one = Volume.fromArray(spark, "p",
      Array.tabulate(4, 4, 4)((z, y, x) => if (z == 1 && y == 1 && x == 1) 5f else 0f))
    val t = Volume.translate(one, 1, 1, 2)
    val (cx, cy, cz) = Volume.centreOfMass(t)
    assert((cx, cy, cz) === ((3.0, 2.0, 2.0)))
    // negative x-shift drops data off the edge, keeps shape
    val back = Volume.translate(one, 0, 0, -1)
    assert(back.head().getSeq[Float](3).length === 4)
  }

  test("stitch feather-blends the overlap (R10)") {
    val a = Volume.fromArray(spark, "s", Array.tabulate(1, 1, 2)((_, _, _) => 1f))
    val b = Volume.fromArray(spark, "s", Array.tabulate(1, 1, 2)((_, _, _) => 3f))
    val st = Volume.stitch(a, b)
    assert(st.count() === 1)
    assert(st.head().getSeq[Float](3) === Seq(2f, 2f)) // mean of 1 and 3
  }

  test("equalizeIntensity matches means (R9); cast2type hits full range (R15)") {
    val a = Volume.fromArray(spark, "a", Array.tabulate(1, 1, 4)((_, _, _) => 10f))
    val b = Volume.fromArray(spark, "b", Array.tabulate(1, 1, 4)((_, _, x) => (x + 1).toFloat))
    val eq = Volume.equalizeIntensity(a, b)
    val meanB = eq.select(explode(col("xs")).as("v")).agg(avg("v")).head().getDouble(0)
    assert(math.abs(meanB - 10.0) < 1e-6)
    val c = Volume.cast2type(vol4, 255)
    val r = c.select(explode(col("xs")).as("v")).agg(min("v"), max("v")).head()
    assert(r.getInt(0) === 0 && r.getInt(1) === 255)
  }

  test("flatDarkCorrect computes -log((p-dark)/(flat-dark)) (R4)") {
    val proj = Volume.fromArray(spark, "p",
      Array.tabulate(1, 2, 3)((_, _, _) => 0.5f))
    val flat = Volume.fromArray(spark, "f",
      Array.tabulate(1, 2, 3)((_, _, _) => 1.0f)).filter(col("z") === 0)
    val dark = Volume.fromArray(spark, "d",
      Array.tabulate(1, 2, 3)((_, _, _) => 0.0f)).filter(col("z") === 0)
    val out = Volume.flatDarkCorrect(proj, flat, dark)
    val v = out.head().getSeq[Float](3).head
    assert(math.abs(v - math.log(2.0)) < 1e-6) // -log(0.5) = ln 2
  }

  test("subtractAir removes per-projection air level (R5)") {
    // projection z has constant value z+10; air window = whole line
    val p = Volume.fromArray(spark, "p",
      Array.tabulate(2, 2, 4)((z, _, _) => (z + 10).toFloat))
    val out = Volume.subtractAir(p, 0, 4)
    val vs = out.select(explode(col("xs")).as("v")).agg(min("v"), max("v")).head()
    assert(vs.getFloat(0) === 0f && vs.getFloat(1) === 0f)
  }

  test("residualRings subtracts the per-pixel angular median (R6)") {
    // constant-over-z stripe at x=1 → fully removed; varying signal survives
    val p = Volume.fromArray(spark, "p",
      Array.tabulate(3, 1, 3)((z, _, x) => if (x == 1) 5f else z.toFloat))
    val out = Volume.residualRings(p)
    val stripe = out.select(explode(col("xs")).as("v")).collect().map(_.getFloat(0))
    // x=1 column becomes 0 everywhere; x=0/2 become z - median(z) = z-1
    assert(out.filter(col("z") === 1).head().getSeq[Float](3) === Seq(0f, 0f, 0f))
    assert(out.filter(col("z") === 0).head().getSeq[Float](3) === Seq(-1f, 0f, -1f))
    assert(stripe.length === 9)
  }

  test("expandGap inserts an interpolated ramp (R8)") {
    val p = Volume.fromArray(spark, "p", Array(Array(Array(1f, 4f))))
    val out = Volume.expandGap(p, 1, 2) // insert 2 cols between 1 and 4
    assert(out.head().getSeq[Float](3) === Seq(1f, 2f, 3f, 4f))
  }

  test("applyTransferCurve interpolates piecewise-linearly (R13)") {
    val p = Volume.fromArray(spark, "p", Array(Array(Array(-1f, 0f, 5f, 10f, 20f))))
    val out = Volume.applyTransferCurve(p, Seq((0.0, 0.0), (10.0, 100.0)))
    assert(out.head().getSeq[Float](3) === Seq(0f, 0f, 50f, 100f, 100f))
  }

  test("intensityRange and otsuThreshold split a bimodal volume (R17/R20)") {
    val bimodal = Volume.fromArray(spark, "b",
      Array.tabulate(2, 2, 8)((z, _, x) => if (x < 4) 1f else 9f))
    val (p05, p95) = Volume.intensityRange(bimodal, 0.05)
    assert(p05 === 1.0 && p95 === 9.0)
    val thr = Volume.otsuThreshold(bimodal, 0, 10, 10)
    assert(thr > 1.0 && thr <= 9.0)
    val kept = Volume.hardThreshold(bimodal, thr)
      .select(explode(col("xs")).as("v")).filter(col("v") > 0).count()
    assert(kept === 16) // exactly the bright half survives
  }

  test("affine 90° rotation is exact and rotate(90)^4 is the identity (R11)") {
    // rotate 90° about the plane centre: (y, x) -> (3 - x, y)
    def rot(df: org.apache.spark.sql.DataFrame) =
      Volume.rotateScale(df, 90.0, 1.0, 1.5, 1.5, (4, 4, 4))
    val once = rot(vol4)
    val got = once.collect()
      .map(r => (r.getInt(1), r.getInt(2)) -> r.getSeq[Float](3)).toMap
    for (z <- 0 until 4; yo <- 0 until 4; xo <- 0 until 4) {
      // output (yo, xo) pulls from input (y = xo, x = 3 - yo)
      val expect = (z * 100 + xo * 10 + (3 - yo)).toFloat
      assert(math.abs(got((z, yo))(xo) - expect) < 1e-3,
        s"($z,$yo,$xo) = ${got((z, yo))(xo)} expect $expect")
    }
    val four = rot(rot(rot(once)))
    val diff = four.withColumnRenamed("xs", "r_xs")
      .join(vol4, Seq("dataset_id", "z", "y"))
      .select(explode(zip_with(col("r_xs"), col("xs"),
        (a, b) => abs(a - b).cast("double"))).as("d"))
      .agg(max("d")).head().getDouble(0)
    assert(diff < 1e-2, s"rotate^4 max voxel diff $diff")
  }

  test("affine scale-2 doubles extent, preserves values on a constant block (R11)") {
    val block = Volume.fromArray(spark, "b",
      Array.tabulate(1, 4, 4)((_, _, _) => 3f))
    val scaled = Volume.rotateScale(block, 0.0, 2.0, 0.0, 0.0, (1, 8, 8))
    // gather semantics: every output cell sampling inside the block is
    // exactly 3 (odd cells interpolate 3↔3); the far edge (source 3.5)
    // blends with the zero outside → 1.5 fringe
    val interior = scaled.filter(col("y").between(0, 6))
      .select(explode(slice(col("xs"), 1, 7)).as("v")).collect().map(_.getFloat(0))
    assert(interior.length === 49 && interior.forall(v => math.abs(v - 3f) < 1e-3))
    val fringe = scaled.filter(col("y") === 7).head().getSeq[Float](3)
    assert(math.abs(fringe(3) - 1.5f) < 1e-3)
    val bb = Volume.boundingBox(scaled, 0.5)
    assert(bb.contains(((0, 7), (0, 7), (0, 0)))) // 0..3.5 support maps to 0..7
  }

  test("affine 45° rotation of a radial blob ≈ identity (R11 property)") {
    val n = 15
    val c = (n - 1) / 2.0
    def blob(y: Int, x: Int): Float =
      math.exp(-((y - c) * (y - c) + (x - c) * (x - c)) / 8.0).toFloat
    val base = Volume.fromArray(spark, "g",
      Array.tabulate(1, n, n)((_, y, x) => blob(y, x)))
    val rot = Volume.rotateScale(base, 45.0, 1.0, c, c, (1, n, n))
    val err = rot.withColumnRenamed("xs", "r_xs")
      .join(base, Seq("dataset_id", "z", "y"))
      .select(explode(zip_with(col("r_xs"), col("xs"),
        (a, b) => (a - b) * (a - b))).as("d"))
      .agg(sum("d")).head().getDouble(0)
    val norm = base.select(explode(col("xs")).as("v"))
      .agg(sum(col("v") * col("v"))).head().getDouble(0)
    assert(math.sqrt(err / norm) < 0.1,
      s"relative L2 error ${math.sqrt(err / norm)}")
  }

  test("fitTransferCurve recovers a synthetic beam-hardening model (R13)") {
    import spark.implicits._
    val (mu0, beta0) = (0.21, 0.013)
    val samples = (1 to 400).map { i =>
      val t = i / 20.0 // thickness 0.05 .. 20
      (t, math.exp(-(mu0 * t + beta0 * t * t)))
    }.toDF("thickness", "transmission")
    val (mu, beta, curve) = Volume.fitTransferCurve(samples)
    assert(math.abs(mu - mu0) < 1e-9, s"mu $mu")
    assert(math.abs(beta - beta0) < 1e-9, s"beta $beta")
    // the emitted inverse curve maps measured attenuation back to thickness
    val atten5 = mu0 * 5 + beta0 * 25
    val vol = Volume.fromArray(spark, "m", Array(Array(Array(atten5.toFloat))))
    val eq = Volume.applyTransferCurve(vol, curve).head().getSeq[Float](3).head
    assert(math.abs(eq - 5.0) < 0.05, s"equivalent thickness $eq")
  }

  test("registerVolumes refines past a biased moment init (R12)") {
    // the true shift pushes part of the blob off the canvas, so the
    // centre-of-mass init is biased; hill-climb recovers the exact peak
    val base = Volume.fromArray(spark, "r", Array.tabulate(7, 7, 7)((z, y, x) =>
      math.max(0.0, 4.0 - (z - 1) * (z - 1) - (y - 3) * (y - 3) - (x - 3) * (x - 3)).toFloat))
    val moved = Volume.translate(base, -2, 0, 1) // clips the z<2 cap
      .filter(col("z").between(0, 6))
    val off = Volume.registerVolumes(moved, base)
    assert(off === ((-2, 0, 1)))
  }

  test("interpolateHoles fills zero runs from x-line neighbors (R7)") {
    val holey = Volume.fromArray(spark, "h", Array(Array(
      Array(0f, 0f, 2f, 0f, 0f, 8f, 0f), // edge run, interior run, tail run
      Array(0f, 0f, 0f, 0f, 0f, 0f, 0f)))) // all-zero stays zero
    val filled = Volume.interpolateHoles(holey).collect()
      .map(r => r.getInt(2) -> r.getSeq[Float](3)).toMap
    assert(filled(0) === Seq(2f, 2f, 2f, 4f, 6f, 8f, 8f))
    assert(filled(1) === Seq(0f, 0f, 0f, 0f, 0f, 0f, 0f))
  }

  test("optimizeRotationCenter recovers the detector offset (R27)") {
    val w = 32
    val centre = 2 // pixels; opposing reversed projection leads by 2*centre
    val profile = Array.tabulate(w)(x =>
      (math.sin(x * 0.7) + 0.3 * x % 5).toFloat) // asymmetric, structured
    val revB = Array.tabulate(w)(i =>
      if (i + 2 * centre < w) profile(i + 2 * centre) else 0f)
    val data = Array(Array(profile), Array(revB.reverse))
    val proj = Volume.fromArray(spark, "p", data)
    val got = Volume.optimizeRotationCenter(proj, nAngles = 2, maxShift = 5)
    assert(math.abs(got - centre) < 0.51, s"centre $got expect $centre")
  }

  test("boundaryFaces + writeStl: voxel surface extraction (R22)") {
    // isolated voxel → 6 faces; 2×2×2 cube → 24 faces (8 voxels × 3
    // exposed faces each)
    val one = Volume.fromArray(spark, "m",
      Array.tabulate(3, 3, 3)((z, y, x) => if (z == 1 && y == 1 && x == 1) 1f else 0f))
    assert(Volume.boundaryFaces(one, 0.5).count() === 6)
    val cube = Volume.fromArray(spark, "c",
      Array.tabulate(4, 4, 4)((z, y, x) =>
        if (z < 2 && y < 2 && x < 2) 1f else 0f))
    val faces = Volume.boundaryFaces(cube, 0.5)
    assert(faces.count() === 24)
    // outward normals balance: the cube is closed
    val net = faces.agg(sum("dx"), sum("dy"), sum("dz")).head()
    assert((net.getLong(0), net.getLong(1), net.getLong(2)) === ((0L, 0L, 0L)))
    val stl = java.nio.file.Files.createTempDirectory("graft_stl")
      .resolve("cube.stl").toString
    Volume.writeStl(faces, stl)
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(stl)), "UTF-8")
    assert(text.startsWith("solid graft"))
    assert(text.split("\n").count(_.startsWith("facet")) === 48) // 2 tris/face
  }

  test("fbp reconstructs a centred disk phantom from its sinogram (R23)") {
    val (w, nAng, outN) = (64, 60, 48)
    val r = 10.0
    val sc = (w - 1) / 2.0
    // parallel projection of a unit disk is angle-independent: the chord
    // length 2*sqrt(r^2 - d^2) at ray offset d from centre
    val chord = Array.tabulate(w) { x =>
      val d = x - sc
      if (math.abs(d) < r) (2.0 * math.sqrt(r * r - d * d)).toFloat else 0f
    }
    val sino = Volume.fromArray(spark, "p",
      Array.tabulate(nAng, 1, w)((_, _, x) => chord(x)))
    val rec = Volume.fbp(sino, nAng, outN).collect()
      .map(ro => ro.getInt(2) -> ro.getSeq[Float](3)).toMap
    val c = (outN - 1) / 2.0
    val (in, out) = (scala.collection.mutable.ArrayBuffer[Float](),
      scala.collection.mutable.ArrayBuffer[Float]())
    for (u <- 0 until outN; v <- 0 until outN) {
      val d = math.hypot(u - c, v - c)
      if (d < r - 3) in += rec(u)(v)
      else if (d > r + 3 && d < c) out += rec(u)(v)
    }
    val (inMean, outMean) = (in.sum / in.size, out.sum / out.size)
    info(f"disk interior mean $inMean%.3f, exterior mean $outMean%.3f")
    assert(math.abs(inMean - 1.0) < 0.15, f"interior $inMean%.3f should be ~1")
    assert(math.abs(outMean) < 0.1, f"exterior $outMean%.3f should be ~0")
  }

  test("affineCubic reproduces a quadratic field exactly on the interior (R11 order-3)") {
    // f(y,x) = (x + 2y)²; half-voxel oblique shift. Keys a=−½ has
    // approximation order 3 ⇒ interior result is EXACTLY f(y−½, x−½);
    // trilinear is first-order and must miss on the same field — the gap
    // between the two is the order-3 claim, not just agreement.
    val slab = Volume.fromArray(spark, "q",
      Array.tabulate(1, 8, 8)((_, y, x) => ((x + 2 * y) * (x + 2 * y)).toFloat))
    val ident = Array(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0), Array(0.0, 0.0, 1.0))
    def interior(df: org.apache.spark.sql.DataFrame): Map[(Int, Int), Float] =
      df.collect().flatMap { r =>
        val y = r.getInt(2)
        r.getSeq[Float](3).zipWithIndex.collect {
          case (v, x) if y >= 2 && y <= 5 && x >= 2 && x <= 5 => (y, x) -> v
        }
      }.toMap
    val cub = interior(Volume.affineCubic(slab, ident, (0.0, 0.5, 0.5), (1, 8, 8)))
    val tri = interior(Volume.affine(slab, ident, (0.0, 0.5, 0.5), (1, 8, 8)))
    var triMaxErr = 0.0
    for (((y, x), v) <- cub) {
      val exact = math.pow(x - 0.5 + 2 * (y - 0.5), 2)
      assert(math.abs(v - exact) < 1e-3, s"cubic ($y,$x): $v vs $exact")
      triMaxErr = math.max(triMaxErr, math.abs(tri((y, x)) - exact))
    }
    assert(triMaxErr > 0.5, f"trilinear err $triMaxErr%.3f should be visibly first-order")
  }

  test("affineCubic is exact on grid-aligned transforms (kernel collapses to identity)") {
    val rot = Volume.affineCubic(vol4,
      Array(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0), Array(0.0, 0.0, 1.0)),
      (0.0, 0.0, 0.0), (4, 4, 4)).collect()
      .map(r => (r.getInt(1), r.getInt(2)) -> r.getSeq[Float](3)).toMap
    for (z <- 0 until 4; y <- 0 until 4; x <- 0 until 4)
      assert(math.abs(rot((z, y))(x) - (z * 100 + y * 10 + x)) < 1e-4)
  }

  test("fdk at r→∞ converges to parallel fbp; finite r stays a faithful disk (R23 cone)") {
    val (w, nAng, outN, nRows) = (32, 24, 24, 3)
    val sc = (w - 1) / 2.0
    val r0 = 6.0
    val chord = Array.tabulate(w) { x =>
      val d = x - sc
      if (math.abs(d) < r0) (2.0 * math.sqrt(r0 * r0 - d * d)).toFloat else 0f
    }
    val sino = Volume.fromArray(spark, "p",
      Array.tabulate(nAng, nRows, w)((_, _, x) => chord(x)))
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(ro => (ro.getInt(1), ro.getInt(2)) -> ro.getSeq[Float](3)).toMap
    val par = asMap(Volume.fbp(sino, nAng, outN))
    val cone = asMap(Volume.fdk(sino, nAng, outN, 1e8, nRows))
    assert(cone.keySet === par.keySet)
    var maxDiff = 0.0
    for ((k, pv) <- par; (a, b) <- pv.zip(cone(k)))
      maxDiff = math.max(maxDiff, math.abs(a - b))
    info(f"max |fdk(r=1e8) − fbp| = $maxDiff%.2e")
    assert(maxDiff < 1e-3, f"fdk should converge to fbp, max diff $maxDiff%.2e")
    // finite-r sanity: the centre slice still reconstructs the disk
    val rec = asMap(Volume.fdk(sino, nAng, outN, 500.0, nRows))
    val c = (outN - 1) / 2.0
    val in = for {
      ((sl, u), xs) <- rec.toSeq if sl == 1
      v <- 0 until outN if math.hypot(u - c, v - c) < r0 - 3
    } yield xs(v)
    val inMean = in.sum / in.size
    assert(math.abs(inMean - 1.0) < 0.15, f"finite-r interior $inMean%.3f should be ~1")
  }

  test("fdkShortScan: Parker-weighted short scan matches the full-scan disk; r→∞ reduces to fbp") {
    val (w, nAng, outN, nRows) = (32, 36, 24, 3)
    val sc = (w - 1) / 2.0
    val r0 = 6.0
    val chord = Array.tabulate(w) { x =>
      val d = x - sc
      if (math.abs(d) < r0) (2.0 * math.sqrt(r0 * r0 - d * d)).toFloat else 0f
    }
    // the centred disk's parallel projection is angle-independent, so the
    // same sinogram serves any sweep interpretation
    val sino = Volume.fromArray(spark, "ss",
      Array.tabulate(nAng, nRows, w)((_, _, x) => chord(x)))
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(ro => (ro.getInt(1), ro.getInt(2)) -> ro.getSeq[Float](3)).toMap
    // r → ∞: fan collapses, sweep → π, every Parker weight → 1 ⇒ fbp
    val par = asMap(Volume.fbp(sino, nAng, outN))
    val shortInf = asMap(Volume.fdkShortScan(sino, nAng, outN, 1e8, nRows))
    var maxDiff = 0.0
    for ((k, pv) <- par; (a, b) <- pv.zip(shortInf(k)))
      maxDiff = math.max(maxDiff, math.abs(a - b))
    info(f"max |fdkShortScan(r=1e8) − fbp| = $maxDiff%.2e")
    assert(maxDiff < 1e-3, f"short-scan should reduce to fbp, max diff $maxDiff%.2e")
    // finite r (real fan): the short-scan reconstruction's interior and
    // exterior means match the full-scan fdk's on the same phantom
    def means(rec: Map[(Int, Int), Seq[Float]]): (Double, Double) = {
      val c = (outN - 1) / 2.0
      val in = scala.collection.mutable.ArrayBuffer[Float]()
      val out = scala.collection.mutable.ArrayBuffer[Float]()
      for (((sl, u), xs) <- rec.toSeq if sl == 1; v <- 0 until outN) {
        val d = math.hypot(u - c, v - c)
        if (d < r0 - 3) in += xs(v)
        else if (d > r0 + 3 && d < c) out += xs(v)
      }
      (in.sum.toDouble / in.size, out.sum.toDouble / out.size)
    }
    val (inS, outS) = means(asMap(Volume.fdkShortScan(sino, nAng, outN, 100.0, nRows)))
    val (inF, outF) = means(asMap(Volume.fdk(sino, nAng, outN, 100.0, nRows)))
    info(f"short-scan interior $inS%.3f / exterior $outS%.3f; full-scan $inF%.3f / $outF%.3f")
    assert(math.abs(inS - 1.0) < 0.2, f"short-scan interior $inS%.3f should be ~1")
    assert(math.abs(outS) < 0.1, f"short-scan exterior $outS%.3f should be ~0")
    assert(math.abs(inS - inF) < 0.15 && math.abs(outS - outF) < 0.1,
      "short-scan and full-scan means should agree")
  }

  test("registerTranslation recovers a known shift (R12) and normL2 (R21)") {
    val base = Volume.fromArray(spark, "r",
      Array.tabulate(5, 5, 5)((z, y, x) => if (z == 1 && y == 1 && x == 1) 4f else 0f))
    val moved = Volume.translate(base, 2, 1, 1)
    assert(Volume.registerTranslation(moved, base) === ((2, 1, 1)))
    assert(math.abs(Volume.normL2(base) - 4.0) < 1e-9)
  }
}
