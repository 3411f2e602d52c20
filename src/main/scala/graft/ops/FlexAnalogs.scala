package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.T._

/** Group X, part 2: flexcalc operator analogs over relational data
  * (SURVEY.md §2b / §2a mapping).
  *
  * Each query re-expresses one reference operator Spark-natively; the
  * reference locus is cited per query (module::symbol granularity — the
  * reference mount was empty at survey time, SURVEY §0).
  *
  * Determinism at scale: every aggregate feeding a comparison or division
  * is an exact DECIMAL(38,6) sum, so results are independent of partition
  * count / merge order — the property that lets the same query grade at
  * sf0.01 and run at 100 TB unchanged.
  */
object FlexAnalogs {

  private def ev(s: SparkSession, d: String): DataFrame = evMs(s, d)

  val queries: Map[String, Q] = Map(
    // R16 analog (flexcalc/analyze.py::histogram): 20-bin fixed-range
    // histogram of l_extendedprice, bin = clamp(floor(x/w), 0, 19).
    "x_flex_histogram" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(least(greatest(floor(col("l_extendedprice") / 6000.0), lit(0)), lit(19))
          .cast("bigint").as("bin"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("bin")),

    // R17 analog (analyze.py::intensity_range): robust range via exact
    // interpolated percentiles.
    "x_flex_intensity_range" -> ((s, d) =>
      t(s, d, "events")
        .agg(round(expr("percentile(value, 0.01D)"), 6).as("p01"),
          round(expr("percentile(value, 0.99D)"), 6).as("p99"))),

    // R20 analog (analyze.py::binary_threshold, otsu mode): 32-bin
    // histogram of value, pick split maximizing between-class variance
    // w0·(1−w0)·(μ0−μ1)² via cumulative windows; all moments from exact
    // decimal sums so the argmax is engine-independent.
    "x_flex_threshold_otsu" -> ((s, d) => {
      val wCum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val wTop = Window.orderBy(col("var_b").desc, col("bin").asc)
      t(s, d, "events")
        .groupBy(least(greatest(floor(col("value") / 10.25), lit(0)), lit(31))
          .cast("bigint").as("bin"))
        .agg(count(lit(1)).as("cnt"), sum(dec(col("value"))).as("sv"))
        .select(col("bin"),
          sum(col("cnt")).over(wCum).as("c0"),
          sum(col("sv")).over(wCum).as("s0"),
          sum(col("cnt")).over(wAll).as("n"),
          sum(col("sv")).over(wAll).as("stot"))
        .filter(col("c0") > 0 && col("c0") < col("n"))
        .withColumn("w0", col("c0").cast("double") / col("n"))
        .withColumn("mu0", col("s0").cast("double") / col("c0"))
        .withColumn("mu1",
          (col("stot").cast("double") - col("s0").cast("double")) / (col("n") - col("c0")))
        .withColumn("var_b",
          col("w0") * (lit(1.0) - col("w0")) *
            (col("mu0") - col("mu1")) * (col("mu0") - col("mu1")))
        .withColumn("rn", row_number().over(wTop))
        .filter(col("rn") === 1)
        .select(col("bin").as("thr_bin"),
          round((col("bin") + 1) * 10.25, 6).as("thr_value"),
          col("c0").as("n_below"), (col("n") - col("c0")).as("n_above"),
          round(col("var_b"), 6).as("between_var"))
    }),

    // R18 analog (analyze.py::centre / moments): weighted centre
    // Σw·x/Σw and 2nd central moment with x = w = value, per user;
    // moments from exact decimal power sums (Σv, Σv², Σv³).
    "x_flex_centroid_moments" -> ((s, d) =>
      t(s, d, "events")
        .groupBy("user_id")
        .agg(sum(dec(col("value"))).as("s1"),
          sum(dec(col("value") * col("value"))).as("s2"),
          sum(dec(col("value") * col("value") * col("value"))).as("s3"))
        .withColumn("centre_raw", col("s2").cast("double") / col("s1").cast("double"))
        .select(col("user_id"),
          round(col("centre_raw"), 6).as("centre"),
          round(col("s3").cast("double") / col("s1").cast("double")
            - col("centre_raw") * col("centre_raw"), 6).as("m2"))
        .orderBy("user_id")),

    // R5 analog (process.py::subtract_air): per-group flat-field
    // normalization — min-max normalize value within event_type.
    "x_flex_normalize" -> ((s, d) => {
      val w = Window.partitionBy("event_type")
      t(s, d, "events")
        .select(col("event_id"), col("event_type"),
          round((col("value") - min(col("value")).over(w)) /
            expr("nullif(max(value) OVER (PARTITION BY event_type) - min(value) OVER (PARTITION BY event_type), 0.0)"), 6)
            .as("norm"))
        .orderBy("event_id")
    }),

    // R26 bin analog (batch.py crop/bin nodes): k× average-pool = mean
    // value per (user, 6h bucket).
    "x_flex_bin_downsample" -> ((s, d) =>
      ev(s, d)
        .groupBy(col("user_id"), window(col("ts_ms"), "6 hours"))
        .agg(avgOut(sum(dec(col("value"))), count(lit(1))).as("avg_value"))
        .select(col("user_id"), col("window.start").as("bucket_start"), col("avg_value"))
        .orderBy("user_id", "bucket_start")),

    // MAXIMUM-INTENSITY PROJECTION analog (the classic volume-rendering
    // verb next to R16's histogram and R19's bbox: project the max
    // voxel along each ray, keeping WHERE it came from): rays = hour
    // columns of the (user × hour) intensity grid, voxel = each user's
    // exact decimal intensity sum in that hour, MIP = the per-ray max
    // with its argmax user (min-user tiebreak under the total order).
    // Two aggregations — grid build partial-combines map-side, the
    // projection window runs over the grid frame, never raw events.
    "x_flex_mip" -> ((s, d) => {
      val cells = ev(s, d)
        .groupBy(col("user_id"), hour(col("ts_ms")).as("hr"))
        .agg(sum(dec(col("value"))).as("v"))
      val w = Window.partitionBy("hr")
        .orderBy(col("v").desc, col("user_id").asc)
      cells.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("hr"), col("user_id").as("argmax_user"),
          decOut(col("v")).as("mip"))
        .orderBy("hr")
    }),

    // R10 analog (process.py::append_tile): stitch two overlapping
    // event ranges; in the 1h overlap, feather-blend (average) the two
    // sources' per-minute sums.
    "x_flex_stitch_blend" -> ((s, d) => {
      val e = ev(s, d).withColumn("minute", truncNtz("minute", col("ts_ms")))
      val a = e.filter(col("ts_ms") < lit("2024-01-15 01:00:00").cast("timestamp"))
        .groupBy(col("minute").as("ma")).agg(sum(dec(col("value"))).as("sa"))
      val b = e.filter(col("ts_ms") >= lit("2024-01-15 00:00:00").cast("timestamp"))
        .groupBy(col("minute").as("mb")).agg(sum(dec(col("value"))).as("sb"))
      a.join(b, col("ma") === col("mb"), "full")
        .select(coalesce(col("ma"), col("mb")).as("minute"),
          decOut(when(col("sa").isNotNull && col("sb").isNotNull,
            ((col("sa").cast("double") + col("sb").cast("double")) / 2).cast("decimal(38,6)"))
            .otherwise(coalesce(col("sa"), col("sb")))).as("blended"),
          (col("sa").isNotNull.cast("int") + col("sb").isNotNull.cast("int")).as("n_src"))
        .orderBy("minute")
    }),

    // R7 analog (process.py::interpolate_holes): null-out synthetic holes
    // (value < 0.5), fill from neighbors: avg(lag, lead) per user ts-order.
    "x_flex_interpolate" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
      ev(s, d)
        .withColumn("v0", expr("CASE WHEN value < 0.5 THEN NULL ELSE value END"))
        .select(col("user_id"), col("event_id"),
          col("v0").isNull.as("was_hole"),
          coalesce(col("v0"), (lag(col("v0"), 1).over(w) + lead(col("v0"), 1).over(w)) / 2.0)
            .as("filled"))
        .orderBy("user_id", "event_id")
    }),

    // R19 analog (analyze.py::bounding_box): extent of above-threshold
    // samples per user.
    "x_flex_bbox" -> ((s, d) =>
      ev(s, d)
        .filter(col("value") > 100)
        .groupBy("user_id")
        .agg(min(col("ts_ms")).as("min_ts"), max(col("ts_ms")).as("max_ts"),
          min(col("value")).as("min_v"), max(col("value")).as("max_v"),
          count(lit(1)).as("n"))
        .orderBy("user_id"))
      ,

    // flexdata analog (data.py::read_flexraylog): scanner-settings text →
    // canonical geometry record, through the REAL GeometryLog parser
    // (regexp key/value split, case/whitespace-insensitive broadcast alias
    // vocabulary, numeric-prefix extraction, per-dataset pivot agg, derived
    // magnification/det_pixel/img_pixel). The fixture builds 6 datasets'
    // worth of deliberately messy vendor lines (mixed case, ragged spacing,
    // unit suffixes "kV"/"ms", an unknown "Comment" key carrying digits, a
    // duplicate-alias voltage pair); the ORACLE states the expected record
    // directly from the dataset index and never parses — so what is graded
    // is parser fidelity against an engine that has no parser.
    "x_flex_geometry" -> ((s, d) => {
      val ids = s.range(6).select(col("id").cast("int").as("i"))
      val lines = ids
        .select(col("i"), explode(array(
          lit("FlexRay acquisition settings"),
          concat(lit("  SOD :  "), lit(300) + col("i") * 7),
          concat(lit("SDD: "), lit(700) + col("i") * 11),
          concat(lit("Binning value : "), lit(1) + col("i") % 2),
          concat(lit("# Projections : "), lit(600) + col("i") * 10),
          lit("Start Angle : 0"),
          lit("Last Angle : 360"),
          concat(lit("Tube Voltage : "), lit(90) + col("i"), lit(" kV")),
          concat(lit("Voltage : "), lit(90) + col("i")),
          concat(lit("Tube Power : "), lit(45) + col("i") * 2, lit(" W")),
          concat(lit("Number of Averages : "), lit(1) + col("i") % 3),
          concat(lit("Exposure time (ms) : "), lit(99) + col("i"), lit(" ms")),
          concat(lit("ver_tube : "), lit(-2.5) + col("i") * 0.5),
          concat(lit("tra_det : "), col("i") * 1.25),
          concat(lit("Comment : calibration run "), col("i")),
          concat(lit("ROI (LTRB) : "), lit(10) + col("i"), lit(", "),
            lit(20) + col("i"), lit(", "), lit(950) - col("i"), lit(", "),
            lit(760) - col("i")))).as("line"))
        .select(concat(lit("scan"), col("i")).as("dataset_id"), col("line"))
      graft.sources.GeometryLog.parseSettings(lines)
        .select("dataset_id", "src2obj", "src2det", "det2obj", "binning",
          "theta_count", "theta_first", "theta_last", "voltage", "power",
          "averages", "exposure_ms", "src_vrt", "det_hrz",
          "roi_l", "roi_t", "roi_r", "roi_b",
          "magnification", "det_pixel", "img_pixel")
        .orderBy("dataset_id")
    }),

    // R11 analog (process.py::affine): a 4×16×16 integer voxel grid is
    // derived from events (cell value = min event_id % 65536, empty cells
    // 0), rotated 90° in-plane through the REAL Volume.affine gather path
    // (trilinear corner join — grid-aligned, so exactly integral), then
    // exploded back to rows. The oracle states the pure coordinate remap
    // (yo, xo) ← (y = xo, x = 15 − yo), so this grades the resampling
    // operator's exactness against an engine that never resamples.
    "x_flex_affine" -> ((s, d) => {
      val cells = t(s, d, "events")
        .select((col("event_id") % 4).cast("int").as("z"),
          expr("CAST((event_id div 4) % 16 AS INT)").as("y"),
          expr("CAST((event_id div 64) % 16 AS INT)").as("x"),
          col("event_id"))
        .groupBy("z", "y", "x")
        .agg((min("event_id") % 65536).as("v"))
      val grid = s.range(4L * 16 * 16).select(
        (col("id") / 256).cast("int").as("z"),
        ((col("id") / 16) % 16).cast("int").as("y"),
        (col("id") % 16).cast("int").as("x"))
      val slab = grid.join(cells, Seq("z", "y", "x"), "left")
        .withColumn("v", coalesce(col("v"), lit(0L)).cast("float"))
        .groupBy(lit("g").as("dataset_id"), col("z"), col("y"))
        .agg(map_from_entries(collect_list(struct(col("x"), col("v")))).as("m"))
        .withColumn("xs",
          expr("transform(sequence(0, 15), i -> cast(coalesce(element_at(m, i), 0.0) as float))"))
        .select("dataset_id", "z", "y", "xs")
      graft.operators.Volume.rotateScale(slab, 90.0, 1.0, 7.5, 7.5, (4, 16, 16))
        .select(col("z").cast("bigint").as("z"), col("y").cast("bigint").as("y"),
          posexplode(col("xs")).as(Seq("x", "vf")))
        .select(col("z"), col("y"), col("x").cast("bigint").as("x"),
          round(col("vf"), 0).cast("bigint").as("v"))
        .orderBy("z", "y", "x")
    }),

    // R11 analog, spline-order-3 half (process.py::affine with order=3):
    // the REAL Volume.affineCubic (Keys 1981 cubic convolution) resamples
    // the quadratic field f(y,x) = (x + 2y)² on a 1×8×8 slab under a
    // half-voxel oblique shift — source = out − (0, ½, ½). Keys a=−½ has
    // approximation order 3, so on the INTERIOR (full 4³ stencil inside)
    // the result is exactly f(y−½, x−½) = (2x + 4y − 3)²/4; graded as the
    // ×4 integer (exact in float: dyadic quarters ≤ 729/4), against an
    // oracle that states the closed-form polynomial and never interpolates
    // — any kernel/weight/stencil defect hash-fails.
    "x_flex_affine_cubic" -> ((s, d) => {
      val slab = s.range(8)
        .select(lit("c").as("dataset_id"), lit(0).cast("int").as("z"),
          col("id").cast("int").as("y"))
        .withColumn("xs", expr(
          "transform(sequence(0, 7), x -> cast((x + 2 * y) * (x + 2 * y) as float))"))
      val ident = Array(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0),
        Array(0.0, 0.0, 1.0))
      graft.operators.Volume.affineCubic(slab, ident, (0.0, 0.5, 0.5), (1, 8, 8))
        .select(col("y").cast("bigint").as("y"),
          posexplode(col("xs")).as(Seq("x", "vf")))
        .filter(col("y").between(2, 5) && col("x").between(2, 5))
        .select(col("y"), col("x").cast("bigint").as("x"),
          round(col("vf") * 4, 0).cast("bigint").as("v4"))
        .orderBy("y", "x")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "x_flex_histogram" ->
      ("SELECT CAST(least(greatest(floor(l_extendedprice / 6000.0), 0), 19) AS BIGINT) AS bin, " +
        "count(*) AS cnt FROM lineitem GROUP BY bin ORDER BY bin"),
    "x_flex_intensity_range" ->
      ("SELECT round(percentile_cont(0.01) WITHIN GROUP (ORDER BY value), 6) AS p01, " +
        "round(percentile_cont(0.99) WITHIN GROUP (ORDER BY value), 6) AS p99 FROM events"),
    "x_flex_threshold_otsu" ->
      ("WITH binned AS (SELECT CAST(least(greatest(floor(value / 10.25), 0), 31) AS BIGINT) AS bin, " +
        "count(*) AS cnt, sum(CAST(value AS DECIMAL(38,6))) AS sv FROM events GROUP BY bin), " +
        "cum AS (SELECT bin, " +
        "sum(cnt) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c0, " +
        "sum(sv) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s0, " +
        "sum(cnt) OVER () AS n, sum(sv) OVER () AS stot FROM binned), " +
        "scored AS (SELECT bin, c0, n, " +
        "CAST(c0 AS DOUBLE) / n AS w0, CAST(s0 AS DOUBLE) / c0 AS mu0, " +
        "(CAST(stot AS DOUBLE) - CAST(s0 AS DOUBLE)) / (n - c0) AS mu1 " +
        "FROM cum WHERE c0 > 0 AND c0 < n), " +
        "v AS (SELECT bin, c0, n, w0 * (1.0 - w0) * (mu0 - mu1) * (mu0 - mu1) AS var_b FROM scored) " +
        "SELECT bin AS thr_bin, round(CAST(bin + 1 AS DOUBLE) * 10.25, 6) AS thr_value, " +
        "CAST(c0 AS BIGINT) AS n_below, " +
        "CAST(n - c0 AS BIGINT) AS n_above, round(var_b, 6) AS between_var FROM (" +
        "SELECT *, row_number() OVER (ORDER BY var_b DESC, bin ASC) AS rn FROM v) WHERE rn = 1"),
    "x_flex_centroid_moments" ->
      ("SELECT user_id, round(centre_raw, 6) AS centre, " +
        "round(CAST(s3 AS DOUBLE) / CAST(s1 AS DOUBLE) - centre_raw * centre_raw, 6) AS m2 FROM (" +
        "SELECT user_id, s1, s2, s3, CAST(s2 AS DOUBLE) / CAST(s1 AS DOUBLE) AS centre_raw FROM (" +
        "SELECT user_id, sum(CAST(value AS DECIMAL(38,6))) AS s1, " +
        "sum(CAST(value * value AS DECIMAL(38,6))) AS s2, " +
        "sum(CAST(value * value * value AS DECIMAL(38,6))) AS s3 " +
        "FROM events GROUP BY user_id)) ORDER BY user_id"),
    "x_flex_normalize" ->
      ("SELECT event_id, event_type, " +
        "round((value - min(value) OVER (PARTITION BY event_type)) / " +
        "nullif(max(value) OVER (PARTITION BY event_type) - min(value) OVER (PARTITION BY event_type), 0.0), 6) AS norm " +
        "FROM events ORDER BY event_id"),
    "x_flex_mip" ->
      ("WITH cells AS (SELECT user_id, " +
        "CAST(hour(date_trunc('milliseconds', ts)) AS INTEGER) AS hr, " +
        "sum(CAST(value AS DECIMAL(38,6))) AS v " +
        "FROM events GROUP BY user_id, hr), " +
        "r AS (SELECT hr, user_id, v, " +
        "row_number() OVER (PARTITION BY hr ORDER BY v DESC, user_id ASC) AS rn " +
        "FROM cells) " +
        "SELECT hr, user_id AS argmax_user, " +
        "round(CAST(v AS DOUBLE), 6) AS mip FROM r WHERE rn = 1 ORDER BY hr"),
    "x_flex_bin_downsample" ->
      ("SELECT user_id, time_bucket(INTERVAL '6 hours', date_trunc('milliseconds', ts)) AS bucket_start, " +
        "round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / count(*), 6) AS avg_value " +
        "FROM events GROUP BY user_id, bucket_start ORDER BY user_id, bucket_start"),
    "x_flex_stitch_blend" ->
      ("WITH e AS (SELECT date_trunc('minute', date_trunc('milliseconds', ts)) AS minute, value, " +
        "date_trunc('milliseconds', ts) AS ts_ms FROM events), " +
        "a AS (SELECT minute AS ma, sum(CAST(value AS DECIMAL(38,6))) AS sa FROM e " +
        "WHERE ts_ms < TIMESTAMP '2024-01-15 01:00:00' GROUP BY minute), " +
        "b AS (SELECT minute AS mb, sum(CAST(value AS DECIMAL(38,6))) AS sb FROM e " +
        "WHERE ts_ms >= TIMESTAMP '2024-01-15 00:00:00' GROUP BY minute) " +
        "SELECT coalesce(ma, mb) AS minute, " +
        "round(CAST(CASE WHEN sa IS NOT NULL AND sb IS NOT NULL " +
        "THEN CAST((CAST(sa AS DOUBLE) + CAST(sb AS DOUBLE)) / 2 AS DECIMAL(38,6)) " +
        "ELSE coalesce(sa, sb) END AS DOUBLE), 6) AS blended, " +
        "CAST(sa IS NOT NULL AS INTEGER) + CAST(sb IS NOT NULL AS INTEGER) AS n_src " +
        "FROM a FULL OUTER JOIN b ON ma = mb ORDER BY minute"),
    "x_flex_interpolate" ->
      ("WITH e AS (SELECT user_id, event_id, date_trunc('milliseconds', ts) AS ts_ms, " +
        "CASE WHEN value < 0.5 THEN NULL ELSE value END AS v0 FROM events) " +
        "SELECT user_id, event_id, v0 IS NULL AS was_hole, " +
        "coalesce(v0, (lag(v0, 1) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) " +
        "+ lead(v0, 1) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id)) / 2.0) AS filled " +
        "FROM e ORDER BY user_id, event_id"),
    "x_flex_bbox" ->
      ("SELECT user_id, min(ts_ms) AS min_ts, max(ts_ms) AS max_ts, " +
        "min(value) AS min_v, max(value) AS max_v, count(*) AS n " +
        "FROM (SELECT user_id, date_trunc('milliseconds', ts) AS ts_ms, value FROM events) " +
        "WHERE value > 100 GROUP BY user_id ORDER BY user_id"),
    // The oracle never parses: it restates the canonical record straight
    // from the dataset index (the same device as x_flex_affine's pure
    // coordinate remap), so any parser defect — alias miss, unit-suffix
    // leak, duplicate-key nondeterminism, ROI split drift — hash-fails.
    "x_flex_geometry" ->
      ("SELECT 'scan' || i AS dataset_id, " +
        "CAST(300 + 7*i AS DOUBLE) AS src2obj, " +
        "CAST(700 + 11*i AS DOUBLE) AS src2det, " +
        "CAST(400 + 4*i AS DOUBLE) AS det2obj, " +
        "CAST(1 + i % 2 AS BIGINT) AS binning, " +
        "CAST(600 + 10*i AS BIGINT) AS theta_count, " +
        "CAST(0 AS DOUBLE) AS theta_first, " +
        "CAST(360 AS DOUBLE) AS theta_last, " +
        "CAST(90 + i AS DOUBLE) AS voltage, " +
        "CAST(45 + 2*i AS DOUBLE) AS power, " +
        "CAST(1 + i % 3 AS BIGINT) AS averages, " +
        "CAST(99 + i AS DOUBLE) AS exposure_ms, " +
        "CAST(-2.5 + 0.5*i AS DOUBLE) AS src_vrt, " +
        "CAST(1.25*i AS DOUBLE) AS det_hrz, " +
        "CAST(10 + i AS BIGINT) AS roi_l, CAST(20 + i AS BIGINT) AS roi_t, " +
        "CAST(950 - i AS BIGINT) AS roi_r, CAST(760 - i AS BIGINT) AS roi_b, " +
        "round(CAST(700 + 11*i AS DOUBLE) / (300 + 7*i), 6) AS magnification, " +
        "round(CAST((1 + i % 2) * 0.074833 AS DOUBLE), 6) AS det_pixel, " +
        "round((1 + i % 2) * 0.074833 * (300 + 7*i) / (700 + 11*i), 6) AS img_pixel " +
        "FROM range(0, 6) t(i) ORDER BY dataset_id"),

    "x_flex_affine" ->
      ("WITH cells AS (SELECT event_id % 4 AS z, (event_id // 4) % 16 AS y, " +
        "(event_id // 64) % 16 AS x, min(event_id) % 65536 AS v " +
        "FROM events GROUP BY 1, 2, 3), " +
        "grid AS (SELECT gz.range AS z, gy.range AS y, gx.range AS x " +
        "FROM range(0, 4) gz, range(0, 16) gy, range(0, 16) gx), " +
        "filled AS (SELECT g.z, g.y, g.x, coalesce(c.v, 0) AS v FROM grid g " +
        "LEFT JOIN cells c ON c.z = g.z AND c.y = g.y AND c.x = g.x) " +
        "SELECT g.z AS z, g.y AS y, g.x AS x, f.v AS v " +
        "FROM grid g JOIN filled f ON f.z = g.z AND f.y = g.x AND f.x = 15 - g.y " +
        "ORDER BY z, y, x"),
    "x_flex_affine_cubic" ->
      ("SELECT gy.range AS y, gx.range AS x, " +
        "CAST((2 * gx.range + 4 * gy.range - 3) * (2 * gx.range + 4 * gy.range - 3) AS BIGINT) AS v4 " +
        "FROM range(2, 6) gy, range(2, 6) gx ORDER BY y, x")
  )
}
