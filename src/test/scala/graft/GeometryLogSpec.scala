package graft

import org.apache.spark.sql.functions._
import graft.sources.GeometryLog

/** T1 tests for scanner-settings parsing (flexdata
  * data.py::read_flexraylog analog): vendor log text → canonical geometry
  * record, including the derived magnification/pixel formulas, alias
  * dialects, unit-suffix extraction, and the strict completeness gate.
  */
class GeometryLogSpec extends SparkSpec {

  private def toLines(id: String, text: String) = {
    import spark.implicits._
    text.split("\n").toSeq.toDF("line").select(lit(id).as("dataset_id"), col("line"))
  }

  test("parses a FlexRay-style settings block into the canonical record") {
    val log =
      """FlexRay acquisition settings
        |SOD : 304.0
        |SDD : 742.0
        |Binning value : 2
        |# Projections : 1441
        |Start angle : 0
        |Last angle : 360
        |Tube voltage : 90 kV
        |Tube power : 45 W
        |Number of averages : 1
        |Exposure time (ms) : 99 ms
        |ver_tube : -2.5
        |tra_det : 1.25
        |ROI (LTRB) : 10, 20, 950, 760
        |Comment : calibration run 7""".stripMargin
    val r = GeometryLog.parseSettings(toLines("s1", log)).head()
    def d(n: String) = r.getDouble(r.fieldIndex(n))
    def l(n: String) = r.getLong(r.fieldIndex(n))
    assert(r.getString(r.fieldIndex("dataset_id")) === "s1")
    assert(d("src2obj") === 304.0 && d("src2det") === 742.0)
    assert(d("det2obj") === 438.0)
    assert(l("binning") === 2L && l("theta_count") === 1441L)
    assert(d("theta_first") === 0.0 && d("theta_last") === 360.0)
    // unit suffixes must not leak into the numeric parse
    assert(d("voltage") === 90.0 && d("power") === 45.0 && d("exposure_ms") === 99.0)
    assert(d("src_vrt") === -2.5 && d("det_hrz") === 1.25)
    assert(l("roi_l") === 10L && l("roi_t") === 20L &&
      l("roi_r") === 950L && l("roi_b") === 760L)
    // public flexdata formulas: mag = sdd/sod, det_pixel = binning × pitch,
    // img_pixel = det_pixel / mag
    assert(d("magnification") === math.rint(742.0 / 304.0 * 1e6) / 1e6)
    assert(d("det_pixel") === 0.149666)
    assert(d("img_pixel") === math.rint(2 * 0.074833 * 304.0 / 742.0 * 1e6) / 1e6)
  }

  test("alias dialects and case/whitespace-insensitive keys co-resolve") {
    val a = GeometryLog.parseSettings(toLines("a",
      "Number of projections : 600\nsdd:700\n  sod  :  300\nbinning : 1")).head()
    assert(a.getLong(a.fieldIndex("theta_count")) === 600L)
    assert(a.getDouble(a.fieldIndex("src2obj")) === 300.0)
    assert(a.getDouble(a.fieldIndex("magnification")) ===
      math.rint(700.0 / 300.0 * 1e6) / 1e6)
  }

  test("unknown keys are ignored; missing fields surface as null") {
    val r = GeometryLog.parseSettings(toLines("m",
      "SOD : 300\nSDD : 700\nSample name : widget 9\nOperator : 5")).head()
    assert(r.isNullAt(r.fieldIndex("binning")))
    assert(r.isNullAt(r.fieldIndex("voltage")))
    assert(r.isNullAt(r.fieldIndex("roi_l")))
    // derived fields needing binning stay null too, never garbage
    assert(r.isNullAt(r.fieldIndex("det_pixel")))
  }

  test("requireComplete passes a full record, rejects a missing SDD") {
    val ok = GeometryLog.parseSettings(toLines("ok",
      "SOD : 300\nSDD : 700\nBinning value : 1"))
    assert(GeometryLog.requireComplete(ok).count() === 1)
    val bad = GeometryLog.parseSettings(toLines("bad", "SOD : 300\nBinning value : 1"))
    val e = intercept[IllegalArgumentException](GeometryLog.requireComplete(bad))
    assert(e.getMessage.contains("bad"))
  }

  test("projectionVectors: hand-checked θ=0/90° cone vectors from a parsed record") {
    val geo = GeometryLog.parseSettings(toLines("v",
      """SOD : 300
        |SDD : 700
        |Binning value : 2
        |# Projections : 4
        |Start angle : 0
        |Last angle : 360
        |ver_tube : -2.5
        |tra_det : 1.25""".stripMargin))
    val rows = GeometryLog.projectionVectors(geo).orderBy("k").collect()
    assert(rows.length === 4) // endpoint-exclusive: 0, 90, 180, 270
    def d(r: org.apache.spark.sql.Row, n: String) = r.getDouble(r.fieldIndex(n))
    val p = 2 * 0.074833 // det_pixel carries the binning
    val r0 = rows(0)
    assert(d(r0, "theta_deg") === 0.0)
    // θ=0: source behind the axis, detector ahead, u along +x, v axial
    assert(math.abs(d(r0, "src_x") - 0.0) < 1e-9 &&
      math.abs(d(r0, "src_y") + 300.0) < 1e-9 && d(r0, "src_z") === -2.5)
    assert(math.abs(d(r0, "det_x") - 1.25) < 1e-9 &&
      math.abs(d(r0, "det_y") - 400.0) < 1e-9)
    assert(math.abs(d(r0, "u_x") - p) < 1e-12 && math.abs(d(r0, "u_y")) < 1e-12)
    assert(d(r0, "v_x") === 0.0 && d(r0, "v_y") === 0.0 && d(r0, "v_z") === p)
    val r90 = rows(1)
    assert(d(r90, "theta_deg") === 90.0)
    // R(90°): (x, y) → (−y, x)
    assert(math.abs(d(r90, "src_x") - 300.0) < 1e-9 &&
      math.abs(d(r90, "src_y")) < 1e-9)
    assert(math.abs(d(r90, "det_x") + 400.0) < 1e-9 &&
      math.abs(d(r90, "det_y") - 1.25) < 1e-9)
    assert(math.abs(d(r90, "u_x")) < 1e-12 && math.abs(d(r90, "u_y") - p) < 1e-12)
    // the per-angle fan-out is narrow: no shuffle in the plan
    val plan = GeometryLog.projectionVectors(geo).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") || plan.indexOf("Exchange") >
      plan.indexOf("Generate"), s"vector fan-out should not reshuffle:\n$plan")
  }

  test("formatSettings round-trips: parse(format(parse(x))) == parse(x), nulls omitted") {
    val log =
      """SOD : 304.0
        |SDD : 742.0
        |Binning value : 2
        |# Projections : 1441
        |Start angle : 0
        |Last angle : 360
        |Tube voltage : 90 kV
        |ver_tube : -2.5
        |ROI (LTRB) : 10, 20, 950, 760""".stripMargin
    val rec1 = GeometryLog.parseSettings(toLines("rt", log))
    val lines2 = GeometryLog.formatSettings(rec1)
    // the partial record emits only its present fields (9 lines: 8 nums + roi)
    assert(lines2.count() === 9)
    val rec2 = GeometryLog.parseSettings(lines2)
    val (a, b) = (rec1.head(), rec2.head())
    assert(a.schema.fieldNames.toSeq === b.schema.fieldNames.toSeq)
    for (f <- a.schema.fieldNames)
      assert(a.get(a.fieldIndex(f)) === b.get(b.fieldIndex(f)), s"field $f drifted")
  }

  test("end-to-end chain: settings log → record → FDK with geometry-derived distance") {
    // The reference user's day-one path: parse the scanner log, derive
    // the source distance in isocenter-pixel units (src2obj / img_pixel —
    // the virtual-detector pitch after magnification), reconstruct.
    val geo = GeometryLog.parseSettings(toLines("e2e",
      "SOD : 300\nSDD : 700\nBinning value : 2\n# Projections : 24")).head()
    val src2obj = geo.getDouble(geo.fieldIndex("src2obj"))
    val imgPixel = geo.getDouble(geo.fieldIndex("img_pixel"))
    val rPix = src2obj / imgPixel
    assert(math.abs(rPix - 300.0 / 0.064143) < 1.0) // unit conversion sanity
    val (w, nAng, outN, nRows) = (32, 24, 24, 3)
    val sc = (w - 1) / 2.0
    val r0 = 6.0
    val chord = Array.tabulate(w) { x =>
      val d = x - sc
      if (math.abs(d) < r0) (2.0 * math.sqrt(r0 * r0 - d * d)).toFloat else 0f
    }
    val sino = graft.operators.Volume.fromArray(spark, "e2e",
      Array.tabulate(nAng, nRows, w)((_, _, x) => chord(x)))
    val rec = graft.operators.Volume.fdk(sino, nAng, outN, rPix, nRows).collect()
      .map(ro => (ro.getInt(1), ro.getInt(2)) -> ro.getSeq[Float](3)).toMap
    val c = (outN - 1) / 2.0
    val in = for {
      ((sl, u), xs) <- rec.toSeq if sl == 1
      v <- 0 until outN if math.hypot(u - c, v - c) < r0 - 3
    } yield xs(v)
    val inMean = in.sum / in.size
    assert(math.abs(inMean - 1.0) < 0.15,
      f"geometry-driven FDK interior $inMean%.3f should be ~1")
  }

  test("geometry propagation: crop/bin/angle-crop record arithmetic matches hand-adjusted values") {
    val geo = GeometryLog.parseSettings(toLines("prop",
      """SOD : 300
        |SDD : 700
        |Binning value : 2
        |# Projections : 24
        |Start angle : 0
        |Last angle : 360
        |ver_det : 1.5
        |tra_det : -0.25
        |ROI (LTRB) : 100, 200, 1060, 968""".stripMargin))
    val detPixel0 = 2 * 0.074833 // binning × pitch
    // asymmetric detector crop of a 384×480 window: rows [64,320), cols [96,480)
    val cropped = GeometryLog.cropGeometry(geo, 64, 320, 96, 480, 384, 480).head()
    def d(r: org.apache.spark.sql.Row, f: String) = r.getDouble(r.fieldIndex(f))
    def l(r: org.apache.spark.sql.Row, f: String) = r.getLong(r.fieldIndex(f))
    // retained-centre shift: rows ((64+320-1)-(384-1))/2 = 0; cols ((96+480-1)-(480-1))/2 = 48
    assert(d(cropped, "det_vrt") === math.rint((1.5 + 0.0 * detPixel0) * 1e6) / 1e6)
    assert(d(cropped, "det_hrz") === math.rint((-0.25 + 48 * detPixel0) * 1e6) / 1e6)
    // ROI tracks the crop in unbinned pixels (binning 2)
    assert(l(cropped, "roi_l") === 100 + 96 * 2)
    assert(l(cropped, "roi_t") === 200 + 64 * 2)
    assert(l(cropped, "roi_r") === 100 + 96 * 2 + 384 * 2)
    assert(l(cropped, "roi_b") === 200 + 64 * 2 + 256 * 2)
    // 2× binning: binning/det_pixel/img_pixel scale; magnification fixed
    val binned = GeometryLog.binGeometry(geo, 2).head()
    assert(l(binned, "binning") === 4)
    assert(d(binned, "det_pixel") === math.rint(2 * detPixel0 * 1e6) / 1e6)
    assert(d(binned, "img_pixel") ===
      math.rint(2 * (math.rint(detPixel0 * 300.0 / 700.0 * 1e6) / 1e6) * 1e6) / 1e6)
    assert(d(binned, "magnification") === d(geo.head(), "magnification"))
    // angle crop [6,18) of a 24-projection 0..360 sweep: step 15° →
    // sweep becomes 90..270 over 12 projections
    val ang = GeometryLog.cropAnglesGeometry(geo, 6, 18).head()
    assert(d(ang, "theta_first") === 90.0)
    assert(d(ang, "theta_last") === 270.0)
    assert(l(ang, "theta_count") === 12)
  }

  test("geometry propagation: GeoProjections crop→bin→fdk needs no hand bookkeeping") {
    import graft.operators.Volume
    // Scan log → record; sinogram is a centered disk phantom on a 64-wide,
    // 2-row detector. The pipeline crops the detector to its central
    // 32 columns, bins 2×, then reconstructs with every scalar derived
    // from the PROPAGATED record — and must agree with the hand-adjusted
    // run a flexcalc user would have had to compute.
    val geo = GeometryLog.parseSettings(toLines("gp",
      "SOD : 300\nSDD : 700\nBinning value : 2\n# Projections : 24"))
    val (w, nAng, nRows) = (64, 24, 2)
    val sc = (w - 1) / 2.0
    val r0 = 6.0
    val chord = Array.tabulate(w) { x =>
      val dd = x - sc
      if (math.abs(dd) < r0) (2.0 * math.sqrt(r0 * r0 - dd * dd)).toFloat else 0f
    }
    val sino = Volume.fromArray(spark, "gp",
      Array.tabulate(nAng, nRows, w)((_, _, x) => chord(x)))
    val gp = Volume.GeoProjections(sino, geo).cropDetector(0, nRows, 16, 48).bin(2)
    // the frame really shrank: 16 columns, 1 row, angles untouched
    val d0 = gp.proj.agg(max(col("z")), max(col("y")), max(size(col("xs")))).head()
    assert(d0.getInt(0) === nAng - 1 && d0.getInt(1) === 0 && d0.getInt(2) === 16)
    // auto-derived source distance == hand-adjusted (img_pixel doubles)
    val imgPixel0 = math.rint(2 * 0.074833 * 300.0 / 700.0 * 1e6) / 1e6
    val rHand = 300.0 / (math.rint(2 * imgPixel0 * 1e6) / 1e6)
    assert(math.abs(gp.rPix - rHand) < 1e-9)
    // and the geometry-driven reconstruction is physically sane: the
    // binned sinogram's line integrals are in ORIGINAL pixel-length
    // units, so the interior reconstructs to ≈ the bin factor (2)
    val outN = 16
    val rec = gp.fdk(nAng, outN).collect()
      .map(ro => (ro.getInt(1), ro.getInt(2)) -> ro.getSeq[Float](3)).toMap
    val c = (outN - 1) / 2.0
    val in = for {
      ((sl, u), xs) <- rec.toSeq if sl == 0
      v <- 0 until outN if math.hypot(u - c, v - c) < r0 / 2 - 1.5
    } yield xs(v)
    val inMean = in.sum / in.size
    assert(math.abs(inMean - 2.0) < 0.4,
      f"geometry-driven FDK interior $inMean%.3f should be ~2 (bin factor)")
  }

  test("property: parse∘format∘parse fixpoint over random records incl. scientific notation") {
    // Deterministic random corpus (house style: seeded, not forAll): 30
    // datasets, each a random subset of vendor keys with values spanning
    // plain decimals, negatives, and exponent notation (1.2E-6 … 9E8) —
    // the rendering Spark's double→string cast produces, which the
    // parser's exponent arm must survive for the fixpoint to hold.
    val rnd = new scala.util.Random(77)
    def v(): String = rnd.nextInt(3) match {
      case 0 => f"${(rnd.nextDouble() - 0.5) * 2000}%.3f"
      case 1 => (rnd.nextInt(2000) - 500).toString
      case _ => s"${1 + rnd.nextInt(9)}.${rnd.nextInt(100)}E${rnd.nextInt(17) - 8}"
    }
    val vendorKeys = Seq("SOD", "SDD", "Binning value", "# Projections",
      "Start angle", "Last angle", "Tube voltage", "Tube power",
      "Number of averages", "Exposure time (ms)", "ver_tube", "ver_det",
      "tra_det", "tra_obj", "tra_tube")
    import spark.implicits._
    val lines = (0 until 30).flatMap { i =>
      val ks = vendorKeys.filter(_ => rnd.nextBoolean())
      val num = ks.map(k => (f"ds$i%02d", s"$k : ${v()}"))
      val roi = if (rnd.nextBoolean())
        Seq((f"ds$i%02d", s"ROI (LTRB) : ${rnd.nextInt(100)}, ${rnd.nextInt(100)}, " +
          s"${900 + rnd.nextInt(100)}, ${700 + rnd.nextInt(100)}")) else Nil
      num ++ roi
    }.toDF("dataset_id", "line")
    val p1 = GeometryLog.parseSettings(lines)
    val p2 = GeometryLog.parseSettings(GeometryLog.formatSettings(p1))
    val (a, b) = (p1.orderBy("dataset_id").collect(), p2.orderBy("dataset_id").collect())
    // datasets whose random subset was empty vanish from both sides alike
    assert(a.map(_.getString(0)).toSeq === b.map(_.getString(0)).toSeq)
    for ((ra, rb) <- a.zip(b); f <- ra.schema.fieldNames)
      assert(ra.get(ra.fieldIndex(f)) === rb.get(rb.fieldIndex(f)),
        s"${ra.getString(0)}.$f drifted: ${ra.get(ra.fieldIndex(f))} vs ${rb.get(rb.fieldIndex(f))}")
  }

  test("readSettingsDir keys each file's lines by its parent directory") {
    val root = java.nio.file.Files.createTempDirectory("graft_geo")
    for ((ds, sod) <- Seq("scanA" -> 300, "scanB" -> 330)) {
      val dir = root.resolve(ds)
      java.nio.file.Files.createDirectory(dir)
      java.nio.file.Files.write(dir.resolve("scan settings.txt"),
        s"SOD : $sod\nSDD : 700\nBinning value : 1".getBytes("UTF-8"))
    }
    val geo = GeometryLog.parseSettings(
      GeometryLog.readSettingsDir(spark, s"$root/*/*.txt"))
      .orderBy("dataset_id").collect()
    assert(geo.map(_.getString(0)).toSeq === Seq("scanA", "scanB"))
    assert(geo.map(r => r.getDouble(r.fieldIndex("src2obj"))).toSeq ===
      Seq(300.0, 330.0))
  }
}
