package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.CentroidAgg

/** Dense-volume operators on the chunked-slab data model (SURVEY §1.2):
  * a 3-D float volume is a DataFrame of x-lines —
  * `(dataset_id string, z int, y int, xs array<float>)` — one row per
  * (z, y) line. Slabs are independently processable, so every per-voxel
  * operator below is a narrow map stage and every reduction is a
  * partial-aggregated shuffle: the layout that scales a flexcalc pipeline
  * to a 100 TB volume store (the reference's Buffer/memmap chunking,
  * flexcalc/batch.py::Buffer, done by partitioning instead).
  *
  * Operator ↔ reference mapping (module::symbol, mount empty at survey
  * time — SURVEY §0): preprocess/-log R4, crop/bin R26, hard_threshold
  * R14, histogram R16, centre R18, bounding_box R19, translate R11,
  * append/stitch R10, equalize_intensity R9, norm R21, cast2type R15,
  * register (moment init) R12.
  */
object Volume {

  /** Build a slab frame from an in-memory [z][y][x] array (tests/demos). */
  def fromArray(spark: SparkSession, id: String,
      data: Array[Array[Array[Float]]]): DataFrame = {
    import spark.implicits._
    (for {
      (plane, z) <- data.zipWithIndex
      (line, y) <- plane.zipWithIndex
    } yield (id, z, y, line.toSeq)).toSeq.toDF("dataset_id", "z", "y", "xs")
  }

  /** R4 (process.py::preprocess): flat/dark-field correction + -log.
    * flat/dark are per-(y,x) reference lines — broadcast-joined on y, then
    * per-voxel `-log((p - dark) / (flat - dark))` clipped at `eps`, all
    * inside one codegen'd map stage.
    */
  def flatDarkCorrect(proj: DataFrame, flat: DataFrame, dark: DataFrame,
      eps: Double = 1e-6): DataFrame = {
    val f = broadcast(flat.select(col("y").as("fy"), col("xs").as("flat_xs")))
    val d = broadcast(dark.select(col("y").as("dy"), col("xs").as("dark_xs")))
    proj.join(f, col("y") === col("fy")).join(d, col("y") === col("dy"))
      .withColumn("num", zip_with(col("xs"), col("dark_xs"), (p, dk) => p - dk))
      .withColumn("den", zip_with(col("flat_xs"), col("dark_xs"), (fl, dk) => fl - dk))
      .withColumn("xs", zip_with(col("num"), col("den"), (n, dd) =>
        (-log(greatest(n / dd, lit(eps)))).cast("float")))
      .select("dataset_id", "z", "y", "xs")
  }

  /** R26 (batch.py crop node): sub-volume selection; x-range via array
    * slice so column pruning and predicate pushdown both apply.
    */
  def crop(vol: DataFrame, z0: Int, z1: Int, y0: Int, y1: Int,
      x0: Int, x1: Int): DataFrame =
    vol.filter(col("z").between(z0, z1 - 1) && col("y").between(y0, y1 - 1))
      .withColumn("xs", slice(col("xs"), x0 + 1, x1 - x0))
      .withColumn("z", col("z") - z0).withColumn("y", col("y") - y0)

  /** R26 (bin node): k× average pooling in all three axes. X pools inside
    * the row (HOF); y/z pool via groupBy(z/k, y/k) + the element-wise mean
    * Aggregator — map-side partial aggregation keeps the shuffle at
    * 1/k³ of the input.
    */
  def binPool(vol: DataFrame, k: Int): DataFrame = {
    val cen = udaf(CentroidAgg)
    poolX(vol, k)
      .groupBy(col("dataset_id"), (col("z") / k).cast("int").as("z"),
        (col("y") / k).cast("int").as("y"))
      .agg(cen(col("xs")).as("xs_d"))
      .withColumn("xs", expr("transform(xs_d, v -> cast(v as float))"))
      .select("dataset_id", "z", "y", "xs")
  }

  /** k× average pooling WITHIN the row only (x axis). The CASE guard: for
    * lines narrower than k, `size div k - 1` is negative and Spark's
    * sequence(0, -2) would run DESCENDING, producing garbage slices —
    * clamp so the pooled line is empty instead.
    */
  private def poolX(vol: DataFrame, k: Int): DataFrame =
    vol.withColumn("xs",
      expr(s"""CASE WHEN size(xs) >= $k THEN
        transform(sequence(0, size(xs) div $k - 1),
          i -> cast(aggregate(slice(xs, i * $k + 1, $k),
            cast(0.0 as double), (a, v) -> a + v) / $k as float))
        ELSE cast(array() as array<float>) END"""))

  /** R26 (bin node, PROJECTION form): k× average pooling of the detector
    * axes only — x inside the row, y across rows — leaving z (the angle
    * index) untouched. [[binPool]] pools all three axes, which is correct
    * for a reconstructed volume but silently averages unrelated ANGLES
    * when applied to a projection stack; detector binning on projections
    * must go through here (and the geometry record through
    * `GeometryLog.binGeometry` — see [[GeoProjections]]).
    */
  def binDetector(proj: DataFrame, k: Int): DataFrame = {
    val cen = udaf(CentroidAgg)
    poolX(proj, k)
      .groupBy(col("dataset_id"), col("z"),
        (col("y") / k).cast("int").as("y"))
      .agg(cen(col("xs")).as("xs_d"))
      .withColumn("xs", expr("transform(xs_d, v -> cast(v as float))"))
      .select("dataset_id", "z", "y", "xs")
  }

  /** R14 (process.py::hard_threshold): zero out voxels below `t`. */
  def hardThreshold(vol: DataFrame, t: Double): DataFrame =
    vol.withColumn("xs",
      expr(s"transform(xs, v -> CASE WHEN v < cast($t AS FLOAT) THEN cast(0.0 AS FLOAT) ELSE v END)"))

  /** R16 (analyze.py::histogram): fixed-range binned voxel counts. */
  def histogram(vol: DataFrame, lo: Double, hi: Double, nBins: Int): DataFrame = {
    val w = (hi - lo) / nBins
    vol.select(explode(col("xs")).as("v"))
      .groupBy(least(greatest(floor((col("v") - lo) / w), lit(0)), lit(nBins - 1))
        .cast("int").as("bin"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("bin")
  }

  /** R18 (analyze.py::centre): intensity-weighted centre of mass. */
  def centreOfMass(vol: DataFrame): (Double, Double, Double) = {
    val r = vol
      .select(col("z"), col("y"), posexplode(col("xs")).as(Seq("x", "v")))
      .agg(sum(col("v")).as("m"),
        sum(col("v") * col("x")).as("mx"),
        sum(col("v") * col("y")).as("my"),
        sum(col("v") * col("z")).as("mz"))
      .head()
    val m = r.getDouble(0)
    (r.getDouble(1) / m, r.getDouble(2) / m, r.getDouble(3) / m) // (x, y, z)
  }

  /** R19 (analyze.py::bounding_box): extent of voxels above `thr`;
    * returns ((x0,x1),(y0,y1),(z0,z1)) inclusive, or None if empty.
    */
  def boundingBox(vol: DataFrame, thr: Double):
      Option[((Int, Int), (Int, Int), (Int, Int))] = {
    val rows = vol
      .select(col("z"), col("y"), posexplode(col("xs")).as(Seq("x", "v")))
      .filter(col("v") > thr)
      .agg(min("x"), max("x"), min("y"), max("y"), min("z"), max("z"))
      .head()
    if (rows.isNullAt(0)) None
    else Some(((rows.getInt(0), rows.getInt(1)), (rows.getInt(2), rows.getInt(3)),
      (rows.getInt(4), rows.getInt(5))))
  }

  /** R11 (process.py::translate, integer case): shift by (dz, dy, dx);
    * x-shift splices zeros (same-shape semantics as scipy shift with
    * constant fill), z/y shifts are key rewrites — no data movement.
    */
  def translate(vol: DataFrame, dz: Int, dy: Int, dx: Int): DataFrame = {
    val shifted =
      if (dx == 0) vol
      else if (dx > 0) vol.withColumn("xs",
        expr(s"slice(concat(array_repeat(cast(0.0 as float), $dx), xs), 1, size(xs))"))
      else vol.withColumn("xs",
        expr(s"concat(slice(xs, ${-dx + 1}, size(xs) + $dx), array_repeat(cast(0.0 as float), ${-dx}))"))
    shifted.withColumn("z", col("z") + dz).withColumn("y", col("y") + dy)
  }

  /** R10 (process.py::append_volume): stitch volumes onto one canvas;
    * overlapping (z, y) lines are feather-blended by element-wise mean.
    * Overlapping lines must have equal width (CentroidAgg rejects ragged
    * input) — crop/pad tiles to the canvas grid first, as the reference
    * does before appending.
    */
  def stitch(vols: DataFrame*): DataFrame = {
    val cen = udaf(CentroidAgg)
    vols.reduce(_ unionByName _)
      .groupBy("dataset_id", "z", "y")
      .agg(cen(col("xs")).as("xs_d"))
      .withColumn("xs", expr("transform(xs_d, v -> cast(v as float))"))
      .select("dataset_id", "z", "y", "xs")
  }

  /** R9 (process.py::equalize_intensity): scale `b` so its mean matches
    * `a` — the reference's aggregate→decide→reapply shape (§3.3): two
    * scalar aggregations, then one broadcast-literal map stage.
    */
  def equalizeIntensity(a: DataFrame, b: DataFrame): DataFrame = {
    def meanOf(v: DataFrame): Double =
      v.select(explode(col("xs")).as("v")).agg(avg("v")).head().getDouble(0)
    val scale = meanOf(a) / meanOf(b)
    b.withColumn("xs", expr(s"transform(xs, v -> cast(v * $scale as float))"))
  }

  /** R21 (analyze.py::norm): L2 norm of the whole volume. */
  def normL2(vol: DataFrame): Double =
    math.sqrt(vol.select(explode(col("xs")).as("v"))
      .agg(sum(col("v") * col("v"))).head().getDouble(0))

  /** R15 (batch.py::scheduler.cast2type): rescale to the dynamic range of
    * a target integer type and cast — global min/max, then map.
    */
  def cast2type(vol: DataFrame, maxVal: Int = 255): DataFrame = {
    val r = vol.select(explode(col("xs")).as("v")).agg(min("v"), max("v")).head()
    val (lo, hi) = (r.getFloat(0), r.getFloat(1))
    val scale = if (hi > lo) maxVal / (hi - lo).toDouble else 0.0
    vol.withColumn("xs",
      expr(s"transform(xs, v -> cast(round((v - cast($lo as float)) * $scale, 0) as int))"))
  }

  /** R12 (process.py::register_volumes, moment-based init): integer
    * translation aligning `b`'s centre of mass to `a`'s.
    */
  def registerTranslation(a: DataFrame, b: DataFrame): (Int, Int, Int) = {
    val (ax, ay, az) = centreOfMass(a)
    val (bx, by, bz) = centreOfMass(b)
    (math.round(az - bz).toInt, math.round(ay - by).toInt, math.round(ax - bx).toInt)
  }

  private def inv3(m: Array[Array[Double]]): Array[Array[Double]] = {
    val d = m(0)(0) * (m(1)(1) * m(2)(2) - m(1)(2) * m(2)(1)) -
      m(0)(1) * (m(1)(0) * m(2)(2) - m(1)(2) * m(2)(0)) +
      m(0)(2) * (m(1)(0) * m(2)(1) - m(1)(1) * m(2)(0))
    require(math.abs(d) > 1e-12, "singular affine matrix")
    Array(
      Array((m(1)(1) * m(2)(2) - m(1)(2) * m(2)(1)) / d,
        (m(0)(2) * m(2)(1) - m(0)(1) * m(2)(2)) / d,
        (m(0)(1) * m(1)(2) - m(0)(2) * m(1)(1)) / d),
      Array((m(1)(2) * m(2)(0) - m(1)(0) * m(2)(2)) / d,
        (m(0)(0) * m(2)(2) - m(0)(2) * m(2)(0)) / d,
        (m(0)(2) * m(1)(0) - m(0)(0) * m(1)(2)) / d),
      Array((m(1)(0) * m(2)(1) - m(1)(1) * m(2)(0)) / d,
        (m(0)(1) * m(2)(0) - m(0)(0) * m(2)(1)) / d,
        (m(0)(0) * m(1)(1) - m(0)(1) * m(1)(0)) / d))
  }

  /** R11 (process.py::affine, general case): resampling under the forward
    * map (z',y',x') = A·(z,y,x) + o, computed as an inverse-map GATHER
    * (scipy `affine_transform` semantics): each output cell samples the
    * input at A⁻¹·(out − o) by trilinear interpolation, zero outside the
    * input — so upscaling leaves no holes (the forward-splat alternative
    * does) and grid-aligned transforms (90° rotations, integer
    * translations) are exact. Plan shape: output grid (spark.range, no
    * driver materialization) × 8 corner keys, one shuffle equi-join
    * against the input voxels, one partial-aggregated groupBy per cell,
    * one line-reassembly groupBy — all linear in voxels, scale-safe.
    * Output lines whose every sample falls outside the input are absent
    * (all-zero by construction).
    */
  def affine(vol: DataFrame, a: Array[Array[Double]],
      offset: (Double, Double, Double), outShape: (Int, Int, Int)): DataFrame = {
    require(a.length == 3 && a.forall(_.length == 3), "3x3 matrix over (z,y,x)")
    // 8 corner samples; weight per axis is (1-frac) for the floor corner,
    // frac for the ceil corner — abs(1 - d - frac) covers both arms.
    resampleGather(vol, inv3(a), Array(offset._1, offset._2, offset._3),
      outShape,
      """flatten(transform(array(0, 1), dz ->
           flatten(transform(array(0, 1), dy ->
             transform(array(0, 1), dx -> struct(
               cast(floor(sz) as int) + dz as z,
               cast(floor(sy) as int) + dy as y,
               cast(floor(sx) as int) + dx as x,
               abs(1 - dz - (sz - floor(sz))) *
               abs(1 - dy - (sy - floor(sy))) *
               abs(1 - dx - (sx - floor(sx))) as w))))))""")
  }

  /** R11 (process.py::affine, spline order 3 analog): the same inverse-map
    * gather as [[affine]] with Keys cubic-convolution interpolation
    * (R. Keys 1981, a = −1/2 — the public kernel scipy's order-3 map is
    * closest to in fidelity): 64 taps at floor−1 … floor+2 per axis,
    * per-axis weight u(d − frac). Approximation order 3: polynomial
    * fields of degree ≤ 2 are reproduced EXACTLY wherever the full
    * 4³ stencil lies inside the volume (VolumeSpec pins this), and
    * grid-aligned transforms collapse the kernel to {0, 1} — exact like
    * trilinear. Outside the input the volume is zero, so fidelity within
    * two voxels of an edge is reduced (the reference's spline `mode=`
    * padding options are out of scope; callers crop a 2-voxel margin when
    * edge exactness matters). Identical plan shape and scale behavior as
    * [[affine]] — the tap fan-out is 64× instead of 8×, still constant.
    */
  def affineCubic(vol: DataFrame, a: Array[Array[Double]],
      offset: (Double, Double, Double), outShape: (Int, Int, Int)): DataFrame = {
    require(a.length == 3 && a.forall(_.length == 3), "3x3 matrix over (z,y,x)")
    // Keys kernel, Horner form, on s = |d − frac|:
    //   s ≤ 1:     1.5s³ − 2.5s² + 1
    //   1 < s < 2: −0.5s³ + 2.5s² − 4s + 2
    def cw(d: String, c: String): String = {
      val s = s"abs($d - ($c - floor($c)))"
      s"""(CASE WHEN $s <= 1.0 THEN ((1.5 * $s - 2.5) * $s) * $s + 1.0
                WHEN $s < 2.0 THEN ((-0.5 * $s + 2.5) * $s - 4.0) * $s + 2.0
                ELSE 0.0 END)"""
    }
    resampleGather(vol, inv3(a), Array(offset._1, offset._2, offset._3),
      outShape,
      s"""flatten(transform(sequence(-1, 2), dz ->
            flatten(transform(sequence(-1, 2), dy ->
              transform(sequence(-1, 2), dx -> struct(
                cast(floor(sz) as int) + dz as z,
                cast(floor(sy) as int) + dy as y,
                cast(floor(sx) as int) + dx as x,
                ${cw("dz", "sz")} * ${cw("dy", "sy")} * ${cw("dx", "sx")}
                  as w))))))""")
  }

  /** Shared gather-join backbone of [[affine]]/[[affineCubic]]: output
    * grid × per-cell tap fan-out (`cellSql` emits struct(z,y,x,w) taps
    * from the source coordinates sz/sy/sx) → one equi-join against the
    * input voxels → per-cell weighted sum → line reassembly. Linear in
    * voxels × taps, no volume-sized broadcast. The abs() in the weight
    * filter matters for cubic: its lobes go NEGATIVE and dropping them
    * would bias every interpolated value.
    */
  private def resampleGather(vol: DataFrame, inv: Array[Array[Double]],
      o: Array[Double], outShape: (Int, Int, Int), cellSql: String): DataFrame = {
    val spark = vol.sparkSession
    val (nz, ny, nx) = outShape
    // source = A⁻¹·out − A⁻¹·o
    val so = Array.tabulate(3)(r =>
      -(inv(r)(0) * o(0) + inv(r)(1) * o(1) + inv(r)(2) * o(2)))
    def s(r: Int) =
      lit(inv(r)(0)) * col("oz") + lit(inv(r)(1)) * col("oy") +
        lit(inv(r)(2)) * col("ox") + lit(so(r))
    // The grid carries no dataset_id: the inner join against the input
    // voxels below supplies it (and per-dataset fan-out falls out of the
    // join) — referencing `vol` here too would recompute its whole
    // upstream pipeline a second time.
    val grid = spark.range(nz.toLong * ny).select(
        (col("id") / ny).cast("int").as("oz"),
        (col("id") % ny).cast("int").as("oy"))
      .withColumn("ox", explode(expr(s"sequence(0, ${nx - 1})")))
    val corners = grid
      .withColumn("sz", s(0)).withColumn("sy", s(1)).withColumn("sx", s(2))
      .withColumn("cell", explode(expr(cellSql)))
      .filter(abs(col("cell.w")) > 1e-12)
      .select(col("oz"), col("oy"), col("ox"),
        col("cell.z").as("z"), col("cell.y").as("y"), col("cell.x").as("x"),
        col("cell.w").as("w"))
    val vox = vol.select(col("dataset_id"), col("z"), col("y"),
      posexplode(col("xs")).as(Seq("x", "v")))
    corners.join(vox, Seq("z", "y", "x"))
      .groupBy("dataset_id", "oz", "oy", "ox")
      .agg(sum(col("w") * col("v")).as("v")) // absent taps contribute 0
      .groupBy(col("dataset_id"), col("oz").as("z"), col("oy").as("y"))
      .agg(map_from_entries(collect_list(struct(col("ox"), col("v")))).as("m"))
      .withColumn("xs", expr(
        s"transform(sequence(0, ${nx - 1}), i -> cast(coalesce(element_at(m, i), 0.0) as float))"))
      .select("dataset_id", "z", "y", "xs")
  }

  /** R11 convenience: in-plane (about the z axis) rotation by `deg`
    * degrees around centre (cy, cx), uniformly scaled by `s`.
    */
  def rotateScale(vol: DataFrame, deg: Double, s: Double,
      cy: Double, cx: Double, outShape: (Int, Int, Int)): DataFrame = {
    val th = math.toRadians(deg)
    val (c, n) = (math.cos(th) * s, math.sin(th) * s)
    val m = Array(Array(1.0, 0.0, 0.0), Array(0.0, c, -n), Array(0.0, n, c))
    affine(vol, m, (0.0, cy - c * cy + n * cx, cx - n * cy - c * cx), outShape)
  }

  /** R13 (process.py::calibrate_spectrum, fit half): recover the
    * beam-hardening transfer model from (thickness, transmission)
    * calibration samples. Aggregate → decide → reapply (§3.3), with NO
    * binning bias: the model  atten(t) = mu·t + beta·t²  is linear in its
    * parameters, so ONE distributed agg of the five sufficient statistics
    * (Σt², Σt³, Σt⁴, Σa·t, Σa·t²) is the exact least-squares problem; the
    * driver solves the 2×2 normal equations and emits the INVERSE
    * piecewise-linear curve (measured attenuation → equivalent thickness)
    * ready for [[applyTransferCurve]]. Returns (mu, beta, curve).
    */
  def fitTransferCurve(samples: DataFrame, nKnots: Int = 16)
      : (Double, Double, Seq[(Double, Double)]) = {
    val r = samples
      .filter(col("transmission") > 0 && col("thickness") > 0)
      .withColumn("atten", -log(col("transmission")))
      .agg(sum(pow(col("thickness"), 2)).as("s22"),
        sum(pow(col("thickness"), 3)).as("s23"),
        sum(pow(col("thickness"), 4)).as("s33"),
        sum(col("atten") * col("thickness")).as("b1"),
        sum(col("atten") * pow(col("thickness"), 2)).as("b2"),
        max("thickness").as("hi"))
      .head()
    require(!r.isNullAt(0), "no usable calibration samples")
    val (s22, s23, s33, b1, b2, hi) = (r.getDouble(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    val det = s22 * s33 - s23 * s23
    val mu = (b1 * s33 - b2 * s23) / det
    val beta = (b2 * s22 - b1 * s23) / det
    val curve = (0 to nKnots).map { i =>
      val t = hi * i / nKnots
      (mu * t + beta * t * t, t)
    }
    (mu, beta, curve)
  }

  /** R12 (process.py::register_volumes, full): moment init + hill-climb
    * refinement on normalized cross-correlation over the overlap —
    * NCC = Σab / √(Σa²·Σb²) hits its Cauchy-Schwarz maximum exactly at
    * proportional alignment, so (unlike raw correlation) it cannot be
    * biased toward brighter planes when clipping truncates the overlap.
    * Each iteration scores
    * ALL probed offsets in ONE shuffle: the candidate set (27 rows) is
    * broadcast-crossed against b's nonzero voxels, the shifted keys join
    * a's voxels, and a grouped sum yields every candidate's score — a
    * refinement step costs one join pass regardless of candidate count.
    */
  def registerVolumes(a: DataFrame, b: DataFrame, maxIter: Int = 8): (Int, Int, Int) = {
    val spark = a.sparkSession
    import spark.implicits._
    def vox(v: DataFrame, n: String) = v
      .select(col("z"), col("y"), posexplode(col("xs")).as(Seq("x", n)))
      .filter(col(n) =!= 0.0f)
    val av = vox(a, "av").persist()
    val bv = vox(b, "bv").persist()
    def scores(cands: Seq[(Int, Int, Int)]): Map[(Int, Int, Int), Double] = {
      val cdf = cands.toDF("dz", "dy", "dx")
      bv.crossJoin(broadcast(cdf))
        .select((col("z") + col("dz")).as("z"), (col("y") + col("dy")).as("y"),
          (col("x") + col("dx")).as("x"), col("bv"), col("dz"), col("dy"), col("dx"))
        .join(av, Seq("z", "y", "x"))
        .groupBy("dz", "dy", "dx")
        .agg((sum(col("av") * col("bv")) /
          sqrt(sum(col("av") * col("av")) * sum(col("bv") * col("bv")))).as("s"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getDouble(3))
        .toMap
    }
    val deltas = for (dz <- -1 to 1; dy <- -1 to 1; dx <- -1 to 1)
      yield (dz, dy, dx)
    var cur = registerTranslation(a, b)
    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      val cands = deltas.map(d => (cur._1 + d._1, cur._2 + d._2, cur._3 + d._3))
      val sc = scores(cands)
      val best = cands.maxBy(c => sc.getOrElse(c, Double.MinValue))
      if (sc.getOrElse(best, Double.MinValue) <= sc.getOrElse(cur, Double.MinValue))
        converged = true
      else cur = best
      it += 1
    }
    av.unpersist()
    bv.unpersist()
    cur
  }

  /** R7 (process.py::interpolate_holes, volume form): fill zero voxels by
    * linear interpolation between the nearest nonzero neighbors along the
    * x-line; edge runs replicate the nearest nonzero value; all-zero
    * lines stay zero. Per-line imperative scan → one narrow typed map
    * stage, no shuffle.
    */
  def interpolateHoles(vol: DataFrame): DataFrame = {
    import vol.sparkSession.implicits._
    vol.select("dataset_id", "z", "y", "xs")
      .as[(String, Int, Int, Seq[Float])]
      .map { case (id, z, y, xs) => (id, z, y, fillLine(xs).toSeq) }
      .toDF("dataset_id", "z", "y", "xs")
  }

  private def fillLine(xs: Seq[Float]): Array[Float] = {
    val arr = xs.toArray
    val nz = arr.indices.filter(arr(_) != 0f)
    if (nz.isEmpty) return arr
    val out = arr.clone()
    for (i <- out.indices if out(i) == 0f) {
      val l = nz.lastIndexWhere(_ < i) match { case -1 => None; case k => Some(nz(k)) }
      val r = nz.indexWhere(_ > i) match { case -1 => None; case k => Some(nz(k)) }
      out(i) = (l, r) match {
        case (Some(li), Some(ri)) =>
          arr(li) + (arr(ri) - arr(li)) * (i - li).toFloat / (ri - li)
        case (Some(li), None) => arr(li)
        case (None, Some(ri)) => arr(ri)
        case _ => 0f
      }
    }
    out
  }

  /** R27 (process.py::optimize_rotation_center, full): the detector-
    * centre offset that best aligns every projection with the horizontal
    * mirror of its 180°-opposite. ONE pass scores every integer candidate
    * shift (broadcast candidates × paired lines → grouped mean cost); the
    * driver parabolic-interpolates the discrete minimum to sub-pixel
    * precision — grid search + refine without a per-candidate job.
    * Convention: minimizes Σ (a[i] − rev_b[i − sh])² over sh and returns
    * half the argmin shift (the centre offset in pixels).
    */
  def optimizeRotationCenter(proj: DataFrame, nAngles: Int, maxShift: Int): Double = {
    import proj.sparkSession.implicits._
    val half = nAngles / 2
    val a = proj.filter(col("z") < half)
      .select(col("z"), col("y"), col("xs").as("a_xs"))
    val b = proj.filter(col("z") >= half)
      .select((col("z") - half).as("z"), col("y"), reverse(col("xs")).as("rev_xs"))
    val cands = (-2 * maxShift to 2 * maxShift)
      .toDF("sh")
    val costs = a.join(b, Seq("z", "y"))
      .crossJoin(broadcast(cands))
      .withColumn("pair", expr(
        """aggregate(
             zip_with(a_xs,
               transform(sequence(1, size(a_xs)), i ->
                 CASE WHEN i - sh >= 1 AND i - sh <= size(rev_xs)
                      THEN element_at(rev_xs, i - sh) END),
               (p, q) -> struct(
                 CASE WHEN q IS NULL THEN cast(0.0 as double)
                      ELSE cast((p - q) * (p - q) as double) END as c,
                 CASE WHEN q IS NULL THEN 0L ELSE 1L END as n)),
             struct(cast(0.0 as double) as c, 0L as n),
             (acc, e) -> struct(acc.c + e.c as c, acc.n + e.n as n))"""))
      .groupBy("sh")
      .agg((sum(col("pair.c")) / sum(col("pair.n"))).as("cost"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    require(costs.nonEmpty, "no opposing projection pairs to align")
    val s0 = costs.keys.minBy(costs)
    val sh =
      if (s0.abs == 2 * maxShift || !costs.contains(s0 - 1) || !costs.contains(s0 + 1))
        s0.toDouble
      else {
        val (cm, c0, cp) = (costs(s0 - 1), costs(s0), costs(s0 + 1))
        val den = cm - 2 * c0 + cp
        if (den <= 0) s0.toDouble else s0 + 0.5 * (cm - cp) / den
      }
    sh / 2.0
  }

  /** R5 (process.py::subtract_air): per-projection (z) air normalization —
    * subtract the mean intensity of the air window x∈[airX0, airX1) from
    * every voxel of that projection. One grouped agg + broadcast join.
    */
  def subtractAir(proj: DataFrame, airX0: Int, airX1: Int): DataFrame = {
    val air = proj
      .withColumn("airv", explode(slice(col("xs"), airX0 + 1, airX1 - airX0)))
      .groupBy(col("z").as("az")).agg(avg("airv").as("air"))
    proj.join(broadcast(air), col("z") === col("az"))
      .withColumn("xs", expr("transform(xs, v -> cast(v - air as float))"))
      .select("dataset_id", "z", "y", "xs")
  }

  /** R6 (process.py::residual_rings): ring-artifact removal — for each
    * detector pixel (y, x), subtract its median residual across all
    * angles (z). Median per (y, x) via exact percentile over the
    * posexploded frame; rejoined on y as a per-(y) correction line.
    */
  def residualRings(proj: DataFrame): DataFrame = {
    val med = proj
      .select(col("y"), posexplode(col("xs")).as(Seq("x", "v")))
      .groupBy("y", "x")
      .agg(expr("percentile(v, 0.5D)").as("m"))
      .groupBy(col("y").as("my"))
      .agg(expr("transform(array_sort(collect_list(struct(x, m))), s -> s.m)").as("med_xs"))
    proj.join(broadcast(med), col("y") === col("my"))
      .withColumn("xs", zip_with(col("xs"), col("med_xs"),
        (v, m) => (v - m).cast("float")))
      .select("dataset_id", "z", "y", "xs")
  }

  /** R8 (process.py::expand_medipix): insert an interpolated cross-gap of
    * `gapW` columns after x=`gapX`: left | interp ramp | right.
    */
  def expandGap(vol: DataFrame, gapX: Int, gapW: Int): DataFrame =
    vol.withColumn("xs", expr(
      s"""concat(
            slice(xs, 1, $gapX),
            transform(sequence(1, $gapW), i -> cast(
              xs[$gapX - 1] + (xs[$gapX] - xs[$gapX - 1]) * i / ($gapW + 1)
              as float)),
            slice(xs, $gapX + 1, size(xs) - $gapX))"""))

  /** R13 (process.py::equivalent_density): map voxel values through a
    * piecewise-linear transfer curve (calibrated spectrum lookup). The
    * curve is tiny → inlined as sorted literal arrays; interpolation is a
    * pure expression (binary-search-free linear scan is fine for the
    * handful of knots a spectrum fit produces).
    */
  def applyTransferCurve(vol: DataFrame, curve: Seq[(Double, Double)]): DataFrame = {
    val pts = curve.sortBy(_._1)
    val xsArr = pts.map(_._1).mkString("array(", "D, ", "D)")
    val ysArr = pts.map(_._2).mkString("array(", "D, ", "D)")
    vol.withColumn("xs", expr(
      s"""transform(xs, v -> cast(
            CASE WHEN v <= element_at($xsArr, 1) THEN element_at($ysArr, 1)
                 WHEN v >= element_at($xsArr, ${pts.size}) THEN element_at($ysArr, ${pts.size})
                 ELSE aggregate(sequence(1, ${pts.size - 1}), cast(0.0 as double), (acc, i) ->
                   CASE WHEN v >= element_at($xsArr, i) AND v < element_at($xsArr, i + 1)
                        THEN element_at($ysArr, i) + (element_at($ysArr, i + 1) - element_at($ysArr, i))
                             * (v - element_at($xsArr, i))
                             / (element_at($xsArr, i + 1) - element_at($xsArr, i))
                        ELSE acc END)
            END as float))"""))
  }

  /** R22 (process.py::generate_stl, simplified to voxel faces): surface
    * mesh of the thresholded volume. A voxel face lies on the surface iff
    * the 6-neighbor across it is below threshold — six distributed
    * anti-joins of the occupancy frame against its shifted self, one per
    * face direction; the mesh (boundary ∝ surface area) is orders of
    * magnitude smaller than the volume, which is what makes a driver-side
    * STL export of a cluster-scale volume sane. Returns one row per face:
    * (z, y, x, dz, dy, dx) — voxel plus outward normal.
    */
  def boundaryFaces(vol: DataFrame, thr: Double): DataFrame = {
    // cached: six direction anti-joins read occ; registered with the
    // harness cache registry for release after materialization.
    val occ = graft.ops.T.cached(vol
      .select(col("z"), col("y"), posexplode(col("xs")).as(Seq("x", "v")))
      .filter(col("v") > thr)
      .select("z", "y", "x"))
    val dirs = Seq((0, 0, 1), (0, 0, -1), (0, 1, 0), (0, -1, 0), (1, 0, 0), (-1, 0, 0))
    val faces = dirs.map { case (dz, dy, dx) =>
      occ.join(occ.select((col("z") - dz).as("z"), (col("y") - dy).as("y"),
          (col("x") - dx).as("x")),
          Seq("z", "y", "x"), "left_anti")
        .select(col("z"), col("y"), col("x"),
          lit(dz).as("dz"), lit(dy).as("dy"), lit(dx).as("dx"))
    }.reduce(_ unionByName _)
    faces
  }

  /** R22 export half: write boundary faces as an ASCII STL (two triangles
    * per square face, unit-cube voxel geometry). The mesh is collected —
    * an EXPORT sink like VolumeIO.writeStack, proportional to surface
    * area, not volume.
    */
  def writeStl(faces: DataFrame, path: String, name: String = "graft"): Unit = {
    val rows = faces.select("z", "y", "x", "dz", "dy", "dx").collect()
    val sb = new StringBuilder(s"solid $name\n")
    rows.foreach { r =>
      val (z, y, x) = (r.getInt(0).toDouble, r.getInt(1).toDouble, r.getInt(2).toDouble)
      val (dz, dy, dx) = (r.getInt(3), r.getInt(4), r.getInt(5))
      // face centre sits half a voxel along the normal; its 4 corners
      // span the two axes perpendicular to the normal
      val c = (x + 0.5 * dx + 0.5, y + 0.5 * dy + 0.5, z + 0.5 * dz + 0.5)
      val (u, w) =
        if (dx != 0) ((0.0, 0.5, 0.0), (0.0, 0.0, 0.5))
        else if (dy != 0) ((0.5, 0.0, 0.0), (0.0, 0.0, 0.5))
        else ((0.5, 0.0, 0.0), (0.0, 0.5, 0.0))
      // Locale.ROOT: the default-locale f"" interpolator renders '3,5' on
      // comma-decimal locales, producing an unparseable STL.
      def pt(su: Int, sw: Int) =
        "%.1f %.1f %.1f".formatLocal(java.util.Locale.ROOT,
          c._1 + su * u._1 + sw * w._1,
          c._2 + su * u._2 + sw * w._2,
          c._3 + su * u._3 + sw * w._3)
      val quad = Seq(pt(-1, -1), pt(1, -1), pt(1, 1), pt(-1, 1))
      Seq((quad(0), quad(1), quad(2)), (quad(0), quad(2), quad(3))).foreach {
        case (p1, p2, p3) =>
          sb.append(s"facet normal $dx.0 $dy.0 $dz.0\n outer loop\n")
            .append(s"  vertex $p1\n  vertex $p2\n  vertex $p3\n")
            .append(" endloop\nendfacet\n")
      }
    }
    sb.append(s"endsolid $name\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      sb.toString.getBytes("UTF-8"))
    ()
  }

  /** R23 (flexTOMO FDK, reduced to parallel-beam FBP on CPU): ramp-filter
    * each projection line with the discrete Ram-Lak kernel — h(0)=1/4,
    * h(k)=−1/(π²k²) for odd k, 0 for even k — as a narrow per-line typed
    * map (O(W²) spatial convolution; an FFT swap is a local optimization,
    * the plan shape is identical).
    */
  def rampFilter(proj: DataFrame): DataFrame = {
    import proj.sparkSession.implicits._
    proj.select("dataset_id", "z", "y", "xs")
      .as[(String, Int, Int, Seq[Float])]
      .map { case (id, z, y, xs) =>
        val w = xs.length
        val out = Array.tabulate(w) { i =>
          var acc = 0.25 * xs(i)
          var k = 1
          while (k < w) {
            val h = -1.0 / (math.Pi * math.Pi * k * k)
            if (i - k >= 0) acc += h * xs(i - k)
            if (i + k < w) acc += h * xs(i + k)
            k += 2 // even-k taps are zero
          }
          acc.toFloat
        }
        (id, z, y, out.toSeq)
      }
      .toDF("dataset_id", "z", "y", "xs")
  }

  /** R23 backprojection: for every output voxel (slice y, u, v) and every
    * angle θ = z·π/nAngles, sample the filtered projection line at
    * detector position s = (u−c)·cosθ + (v−c)·sinθ + centre via linear
    * interpolation — the same gather-join backbone as [[affine]]: output
    * grid × angles × 2 corner keys equi-joined against projection voxels,
    * partial-aggregated per-voxel sum × π/nAngles, line reassembly. Rows
    * scale as voxels × angles — linear per angle tile, no broadcast of
    * anything volume-sized. Output slab frame: z = detector row (slice),
    * y = u, xs over v.
    */
  def backproject(filtered0: DataFrame, nAngles: Int, outN: Int): DataFrame = {
    val spark = filtered0.sparkSession
    // Three references below (detector width, slice enumeration, voxel
    // join) would each recompute the upstream ramp filter; persist the
    // filtered sinogram (disk-spillable — it is volume-sized) so the
    // immediate head() action materializes it once.
    // T.cached persists MEMORY_AND_DISK (disk-spillable — it is
    // volume-sized) and registers for post-materialization release.
    val filtered = graft.ops.T.cached(filtered0)
    val detW = filtered.select(max(size(col("xs")))).head().getInt(0)
    val sc = (detW - 1) / 2.0
    val c = (outN - 1) / 2.0
    val grid = filtered.select("dataset_id", "y").distinct()
      .crossJoin(spark.range(outN.toLong * outN).select(
        (col("id") / outN).cast("int").as("u"),
        (col("id") % outN).cast("int").as("v")))
      .withColumn("ang", explode(expr(s"sequence(0, ${nAngles - 1})")))
      .withColumn("th", col("ang") * lit(math.Pi / nAngles))
      .withColumn("s",
        (col("u") - c) * cos(col("th")) + (col("v") - c) * sin(col("th")) + sc)
      .withColumn("corner", explode(expr(
        """array(struct(cast(floor(s) as int) as x, 1 - (s - floor(s)) as w),
                 struct(cast(floor(s) as int) + 1 as x, s - floor(s) as w))""")))
      .filter(col("corner.w") > 1e-12 && col("corner.x").between(0, detW - 1))
      .select(col("dataset_id"), col("y"), col("u"), col("v"),
        col("ang"), col("corner.x").as("x"), col("corner.w").as("w"))
    val vox = filtered.select(col("dataset_id"), col("z").as("ang"), col("y"),
      posexplode(col("xs")).as(Seq("x", "pv")))
    grid.join(vox, Seq("dataset_id", "ang", "y", "x"))
      .groupBy("dataset_id", "y", "u", "v")
      .agg((sum(col("w") * col("pv")) * (math.Pi / nAngles)).as("f"))
      .groupBy(col("dataset_id"), col("y").as("z"), col("u").as("y"))
      .agg(map_from_entries(collect_list(struct(col("v"), col("f")))).as("m"))
      .withColumn("xs", expr(
        s"transform(sequence(0, ${outN - 1}), i -> cast(coalesce(element_at(m, i), 0.0) as float))"))
      .select("dataset_id", "z", "y", "xs")
  }

  /** R23 end-to-end: parallel-beam filtered backprojection. `proj` rows
    * are (z = angle index over [0, nAngles) spanning 180°, y = detector
    * row, xs = detector line); output is one reconstructed outN×outN
    * slice per detector row.
    */
  def fbp(proj: DataFrame, nAngles: Int, outN: Int): DataFrame =
    backproject(rampFilter(proj), nAngles, outN)

  /** R23 cone-beam half (flexTOMO FDK, CPU-reduced): Feldkamp pre-weight.
    * Each detector sample is scaled by the cosine of its ray's angle to
    * the central ray — r / √(r² + u² + v²) with (u, v) the sample's offset
    * from the detector centre in pixels and `r` the source-to-isocenter
    * distance in the SAME pixel units (virtual detector through the
    * isocenter — flexdata's geometry convention after magnification
    * normalization). Pure narrow map, codegen'd, no shuffle.
    *
    * LOUD LIMITATION (SURVEY §7.4.7): this FDK is the reduced CPU form —
    * circular orbit, flat detector, no short-scan (Parker) weighting; the
    * reference delegates production cone-beam to flexTOMO/ASTRA on GPU,
    * which stays out of scope. The reduction is still the honest Feldkamp
    * algorithm: as r → ∞ it converges to [[fbp]] (VolumeSpec pins this),
    * and at finite r the magnification weighting is the real 1/U² term.
    *
    * @param nRows detector row count (v spans rows; centre (nRows−1)/2).
    */
  def fdkWeight(proj: DataFrame, r: Double, nRows: Int): DataFrame = {
    val zc = (nRows - 1) / 2.0
    proj.withColumn("xs", expr(
      s"""transform(xs, (p, i) -> cast(p * $r / sqrt($r * $r
            + (i - (size(xs) - 1) / 2.0) * (i - (size(xs) - 1) / 2.0)
            + (y - $zc) * (y - $zc)) as float))"""))
  }

  /** R23 cone-beam backprojection: voxel (slice z, u, v) at angle θ
    * projects through the cone onto detector position
    * (su, sv) = (p·m + sc, (z − zc)·m + zc) with p, q the voxel's rotated
    * in-plane coordinates, m = r/(r + q) the inverse magnification, and
    * is accumulated with the Feldkamp distance weight m² — the 1/U² term
    * of FDK. Same gather-join backbone as [[backproject]], with a 3-D
    * output grid (slices × outN × outN; slices couple across detector
    * rows, unlike parallel FBP) and 4 bilinear taps over (row, col).
    * Rows scale as voxels × angles × 4 — linear per angle, no
    * volume-sized broadcast. As r → ∞: m → 1, sv → z, weight → 1, and
    * the plan degenerates to exactly parallel [[backproject]].
    */
  def fdkBackproject(filtered0: DataFrame, nAngles: Int, outN: Int,
      r: Double, sweep: Double = math.Pi): DataFrame = {
    val spark = filtered0.sparkSession
    val filtered = graft.ops.T.cached(filtered0)
    val dims = filtered.select(max(size(col("xs"))), max(col("y"))).head()
    val detW = dims.getInt(0)
    val nRows = dims.getInt(1) + 1
    val sc = (detW - 1) / 2.0
    val zc = (nRows - 1) / 2.0
    val c = (outN - 1) / 2.0
    val grid = filtered.select("dataset_id").distinct()
      .crossJoin(spark.range(nRows.toLong * outN * outN).select(
        (col("id") / (outN * outN)).cast("int").as("sl"),
        ((col("id") / outN) % outN).cast("int").as("u"),
        (col("id") % outN).cast("int").as("v")))
      .withColumn("ang", explode(expr(s"sequence(0, ${nAngles - 1})")))
      .withColumn("th", col("ang") * lit(sweep / nAngles))
      .withColumn("p", (col("u") - c) * cos(col("th")) + (col("v") - c) * sin(col("th")))
      .withColumn("q", -(col("u") - c) * sin(col("th")) + (col("v") - c) * cos(col("th")))
      .withColumn("m", lit(r) / (lit(r) + col("q")))
      .withColumn("su", col("p") * col("m") + sc)
      .withColumn("sv", (col("sl") - zc) * col("m") + zc)
      .withColumn("fw", col("m") * col("m"))
      .withColumn("corner", explode(expr(
        """flatten(transform(array(0, 1), dr ->
             transform(array(0, 1), dc -> struct(
               cast(floor(sv) as int) + dr as row,
               cast(floor(su) as int) + dc as colx,
               abs(1 - dr - (sv - floor(sv))) *
               abs(1 - dc - (su - floor(su))) as w))))""")))
      .filter(col("corner.w") > 1e-12 &&
        col("corner.colx").between(0, detW - 1) &&
        col("corner.row").between(0, nRows - 1))
      .select(col("dataset_id"), col("sl"), col("u"), col("v"), col("ang"),
        col("corner.row").as("y"), col("corner.colx").as("x"),
        (col("corner.w") * col("fw")).as("w"))
    val vox = filtered.select(col("dataset_id"), col("z").as("ang"), col("y"),
      posexplode(col("xs")).as(Seq("x", "pv")))
    grid.join(vox, Seq("dataset_id", "ang", "y", "x"))
      .groupBy("dataset_id", "sl", "u", "v")
      .agg((sum(col("w") * col("pv")) * (sweep / nAngles)).as("f"))
      .groupBy(col("dataset_id"), col("sl").as("z"), col("u").as("y"))
      .agg(map_from_entries(collect_list(struct(col("v"), col("f")))).as("m"))
      .withColumn("xs", expr(
        s"transform(sequence(0, ${outN - 1}), i -> cast(coalesce(element_at(m, i), 0.0) as float))"))
      .select("dataset_id", "z", "y", "xs")
  }

  /** R23 cone-beam end-to-end (flexTOMO FDK, CPU-reduced — see
    * [[fdkWeight]]'s loud limitation note): Feldkamp pre-weight → Ram-Lak
    * row filter → magnification-weighted cone backprojection. `proj` rows
    * are (z = angle index over [0, nAngles) spanning 180°, y = detector
    * row, xs = detector line); output is a slices × outN × outN volume,
    * one slice per detector row. `r` is the source-to-isocenter distance
    * in detector-pixel units.
    */
  def fdk(proj: DataFrame, nAngles: Int, outN: Int, r: Double,
      nRows: Int): DataFrame =
    fdkBackproject(rampFilter(fdkWeight(proj, r, nRows)), nAngles, outN, r)

  /** Short-scan redundancy weights (Parker 1982, the public fan-beam
    * formula flexTOMO applies for its short-scan FDK path): a short scan
    * sweeps `π + 2γ_m` (γ_m = half fan angle) instead of a full half
    * turn, so rays near the sweep ends are measured twice; Parker's
    * sin²-feathered weight counts every conjugate ray pair exactly once
    * while staying continuous in (β, γ) — the discontinuous 0/1
    * alternative rings in the reconstruction.
    *
    * γ = atan((i−c)/r) is the ray's in-fan angle at column i (centered
    * detector, same convention as [[fdkWeight]]), γ_m from the row's own
    * width. The weight is evaluated at the MIDPOINT angle
    * β = (z+½)·sweep/nAngles (midpoint-rule quadrature of the redundancy
    * correction): sampling at the left edge puts the first projection
    * exactly on the w=0 feather boundary, which discretely drops a whole
    * projection and breaks the γ_m → 0 reduction to [[fbp]] — a
    * measure-zero set in the continuum but 1/nAngles of the discrete sum.
    * Pure narrow per-sample Column map, codegen'd, no shuffle; the
    * `greatest(…,1e-12)` guards the edge columns where a transition band
    * is empty.
    */
  def parkerWeight(proj: DataFrame, r: Double, nAngles: Int): DataFrame = {
    val gm = s"atan(((size(xs) - 1) / 2.0) / $r)"
    val g = s"atan((i - (size(xs) - 1) / 2.0) / $r)"
    val beta = s"((z + 0.5) * (pi() + 2 * $gm) / $nAngles)"
    proj.withColumn("xs", expr(
      s"""transform(xs, (p, i) -> cast(p * (
            CASE
              WHEN $beta < 2 * ($gm - $g)
              THEN pow(sin((pi() / 4) * $beta / greatest($gm - $g, 1e-12)), 2)
              WHEN $beta <= pi() - 2 * $g
              THEN 1.0
              ELSE pow(sin((pi() / 4) * (pi() + 2 * $gm - $beta)
                / greatest($gm + $g, 1e-12)), 2)
            END) as float))"""))
  }

  /** R23 short-scan cone-beam FDK (flexTOMO's common acquisition mode —
    * most real FleX-ray scans are short-scan): `proj` rows are
    * (z = angle index over [0, nAngles) spanning the SHORT sweep
    * `π + 2γ_m`, y = detector row, xs = detector line). Chain: Feldkamp
    * cosine pre-weight → Parker redundancy weight → Ram-Lak row filter →
    * cone backprojection over the short sweep (Δβ = sweep/nAngles). As
    * r → ∞ the fan collapses (γ_m → 0), every Parker weight → 1, the
    * sweep → π, and this degenerates to exactly [[fdk]]/[[fbp]]
    * (VolumeSpec pins it).
    */
  def fdkShortScan(proj: DataFrame, nAngles: Int, outN: Int, r: Double,
      nRows: Int): DataFrame = {
    val detW = proj.select(max(size(col("xs")))).head().getInt(0)
    val sweep = math.Pi + 2 * math.atan(((detW - 1) / 2.0) / r)
    fdkBackproject(
      rampFilter(parkerWeight(fdkWeight(proj, r, nRows), r, nAngles)),
      nAngles, outN, r, sweep)
  }

  /** R17 (analyze.py::intensity_range): robust (p, 1-p) percentile range. */
  def intensityRange(vol: DataFrame, p: Double): (Double, Double) = {
    val r = vol.select(explode(col("xs")).as("v"))
      .agg(expr(s"percentile(v, ${p}D)"), expr(s"percentile(v, ${1 - p}D)")).head()
    (r.getDouble(0), r.getDouble(1))
  }

  /** A projection stack paired with its geometry record (SURVEY §1.1):
    * flexcalc mutates the record in place when a pipeline crops, bins, or
    * stitches projections, so a user who cropped a scan had to adjust
    * detector offsets by hand before reconstructing. Here the pair is
    * immutable and every op returns BOTH the new frame and the
    * correspondingly-adjusted record (pure Column updates —
    * `GeometryLog.cropGeometry`/`binGeometry`/`stitchGeometry`), so the
    * chain crop → bin → [[Volume.fdk]] needs no manual bookkeeping.
    *
    * `proj` rows are the slab layout with z = angle index; `geo` is one
    * `GeometryLog.parseSettings` record per dataset_id. The only driver
    * actions are 1-row dimension/record aggs (the §3.3
    * aggregate→decide→reapply shape) — the data path stays fully
    * distributed.
    */
  final case class GeoProjections(proj: DataFrame,
      geo: DataFrame) {
    import graft.sources.GeometryLog

    /** Current detector dims (rows, cols) — 1-row agg. */
    private def dims: (Int, Int) = {
      val d = proj.agg(max(col("y")), max(size(col("xs")))).head()
      (d.getInt(0) + 1, d.getInt(1))
    }

    /** Crop the detector window [y0,y1)×[x0,x1) on every angle; the
      * record's detector offsets absorb the window-centre shift. */
    def cropDetector(y0: Int, y1: Int, x0: Int, x1: Int): GeoProjections = {
      val (nRows, nCols) = dims
      GeoProjections(
        Volume.crop(proj, 0, Int.MaxValue, y0, y1, x0, x1),
        GeometryLog.cropGeometry(geo, y0, y1, x0, x1, nRows, nCols))
    }

    /** Keep angles [z0,z1); the record's theta sweep narrows to match. */
    def cropAngles(z0: Int, z1: Int): GeoProjections = {
      val (nRows, nCols) = dims
      GeoProjections(
        Volume.crop(proj, z0, z1, 0, nRows, 0, nCols),
        GeometryLog.cropAnglesGeometry(geo, z0, z1))
    }

    /** k× detector binning (angles untouched); binning/det_pixel/
      * img_pixel scale in the record. */
    def bin(k: Int): GeoProjections =
      GeoProjections(Volume.binDetector(proj, k),
        GeometryLog.binGeometry(geo, k))

    /** Stitch tile stacks of the same acquisition onto one canvas
      * (overlaps feather-blended); the canvas record unions the tile
      * ROIs. Tiles must already sit on the canvas grid ([[Volume.stitch]]'s
      * contract). */
    def stitchWith(others: GeoProjections*): GeoProjections =
      GeoProjections(
        Volume.stitch((proj +: others.map(_.proj)).toIndexedSeq: _*),
        GeometryLog.stitchGeometry((geo +: others.map(_.geo)).toIndexedSeq: _*))

    /** Source-to-isocenter distance in CURRENT image-pixel units — the
      * `r` [[Volume.fdk]] consumes — derived from the (possibly
      * bin-adjusted) record. Single-dataset helper: 1-row collect. */
    def rPix: Double = {
      val r = geo.select(col("src2obj") / col("img_pixel")).head()
      r.getDouble(0)
    }

    /** Geometry-driven FDK reconstruction: every scalar the kernel needs
      * (source distance in pixel units, detector row count) comes from
      * the propagated record and the frame itself — the no-hand-
      * bookkeeping endpoint of the crop/bin chain. */
    def fdk(nAngles: Int, outN: Int): DataFrame =
      Volume.fdk(proj, nAngles, outN, rPix, dims._1)
  }

  /** R20 (analyze.py::binary_threshold, otsu mode): histogram →
    * between-class-variance argmax → threshold value. The aggregate →
    * decide → reapply shape (§3.3): pair with hardThreshold to binarize.
    */
  def otsuThreshold(vol: DataFrame, lo: Double, hi: Double, nBins: Int): Double = {
    val h = histogram(vol, lo, hi, nBins).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val w = (hi - lo) / nBins
    val counts = (0 until nBins).map(b => h.getOrElse(b, 0L).toDouble)
    val mids = (0 until nBins).map(b => lo + (b + 0.5) * w)
    val total = counts.sum
    val totalMean = counts.zip(mids).map { case (c, m) => c * m }.sum / total
    var best = (Double.MinValue, lo + w)
    var c0 = 0.0
    var s0 = 0.0
    for (b <- 0 until nBins - 1) {
      c0 += counts(b); s0 += counts(b) * mids(b)
      if (c0 > 0 && c0 < total) {
        val w0 = c0 / total
        val mu0 = s0 / c0
        val mu1 = (totalMean * total - s0) / (total - c0)
        val v = w0 * (1 - w0) * (mu0 - mu1) * (mu0 - mu1)
        if (v > best._1) best = (v, lo + (b + 1) * w)
      }
    }
    best._2
  }
}
