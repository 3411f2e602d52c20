package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scanner-settings parsing: vendor acquisition logs → one canonical
  * geometry record per dataset (reference: flexdata data.py::read_flexraylog
  * / ::parse_flexray_metadata — mount empty at survey time, SURVEY §0; the
  * key vocabulary and derived-field formulas below follow the PUBLIC
  * flexdata semantics: src2obj/src2det in mm, magnification = src2det /
  * src2obj, img_pixel = det_pixel / magnification, det_pixel = binning ×
  * unbinned pitch).
  *
  * The reference parses one log file imperatively on one machine; a 100 TB
  * volume store has one small log per dataset but MILLIONS of datasets, so
  * the Spark-first shape is a line-frame pipeline: `(dataset_id, line)` →
  * key/value regexp split → broadcast alias join (the vendor-key
  * vocabulary is a few dozen rows) → one grouped pivot-aggregation per
  * dataset. Everything is codegen'd Column work; the only shuffle is the
  * final per-dataset agg, keyed on dataset_id (perfectly parallel, no
  * skew — every dataset contributes the same ~dozen lines).
  *
  * Robustness mirrors the reference's parser: keys match case- and
  * whitespace-insensitively, unknown keys are ignored, numeric values are
  * extracted as the first decimal literal in the value (so "99 ms" and
  * "0.1mm" parse), and missing fields surface as NULL (callers decide
  * whether a null src2det is fatal — [[requireComplete]] gives the strict
  * form).
  */
object GeometryLog {

  /** FlexRay unbinned detector pixel pitch, mm (public flexdata constant). */
  val DefaultDetPitchMm: Double = 0.074833

  /** Vendor key (lower-cased, space-collapsed) → canonical field. The
    * vocabulary is the public flexdata translation table plus the obvious
    * aliases the reference accepts across log dialects ("scan settings" vs
    * "data settings XRE").
    */
  val KeyAliases: Seq[(String, String)] = Seq(
    "sod" -> "src2obj",
    "sdd" -> "src2det",
    "voxel size" -> "img_pixel_logged",
    "binning value" -> "binning",
    "binning" -> "binning",
    "# projections" -> "theta_count",
    "number of projections" -> "theta_count",
    "start angle" -> "theta_first",
    "first angle" -> "theta_first",
    "last angle" -> "theta_last",
    "tube voltage" -> "voltage",
    "voltage" -> "voltage",
    "tube power" -> "power",
    "power" -> "power",
    "number of averages" -> "averages",
    "averages" -> "averages",
    "exposure time (ms)" -> "exposure_ms",
    "exposure time" -> "exposure_ms",
    "exposure" -> "exposure_ms",
    "ver_tube" -> "src_vrt",
    "ver_det" -> "det_vrt",
    "tra_det" -> "det_hrz",
    "tra_obj" -> "axs_hrz",
    "tra_tube" -> "src_hrz",
    "roi (ltrb)" -> "roi",
    "roi" -> "roi")

  /** Numeric canonical fields, in output order. */
  private val NumFields: Seq[String] = Seq(
    "src2obj", "src2det", "binning", "theta_count", "theta_first",
    "theta_last", "voltage", "power", "averages", "exposure_ms",
    "src_vrt", "det_vrt", "det_hrz", "axs_hrz", "src_hrz")

  /** Integer-typed subset of [[NumFields]] (counts, not measurements). */
  private val IntFields = Set("binning", "theta_count", "averages")

  /** Read per-dataset settings files under `glob` (one text file per
    * dataset directory, the reference's on-disk layout) into the
    * `(dataset_id, line)` frame [[parseSettings]] consumes. dataset_id is
    * the file's parent directory name — the reference's convention of one
    * scan folder per acquisition.
    */
  def readSettingsDir(spark: SparkSession, glob: String): DataFrame =
    spark.read.textFile(glob).toDF("line")
      .withColumn("dataset_id",
        regexp_extract(input_file_name(), "([^/]+)/[^/]+$", 1))
      .select("dataset_id", "line")

  /** Parse `(dataset_id, line)` settings lines into one canonical geometry
    * record per dataset. See object doc for the plan shape.
    *
    * @param detPitchMm unbinned detector pixel pitch (mm); det_pixel =
    *        binning × detPitchMm, img_pixel = det_pixel / magnification.
    */
  def parseSettings(lines: DataFrame,
      detPitchMm: Double = DefaultDetPitchMm): DataFrame = {
    val aliases = broadcast(
      lines.sparkSession.createDataFrame(KeyAliases).toDF("raw_key", "field"))
    // key : value split; keys are case/whitespace-normalized (lower, trim,
    // collapse runs of spaces) to match the vendor dialects.
    val kv = lines
      .withColumn("raw_key", regexp_replace(
        lower(trim(regexp_extract(col("line"), "^([^:]+?)\\s*:", 1))),
        "\\s+", " "))
      .withColumn("val_str", trim(regexp_extract(col("line"), ":\\s*(.*)$", 1)))
      .filter(col("raw_key") =!= "")
      .join(aliases, Seq("raw_key")) // inner: unknown keys ignored
      // first decimal literal in the value → numeric form ("99 ms" → 99).
      // Exponent arm matters for round-tripping [[formatSettings]] output:
      // Spark renders small doubles as "1.0E-5", and without it the match
      // would stop at "1.0" — silently wrong by five orders of magnitude.
      .withColumn("num",
        regexp_extract(col("val_str"),
          "([-+]?[0-9]+(?:\\.[0-9]+)?(?:[eE][-+]?[0-9]+)?)", 1)
          .cast("double"))
    // One grouped agg pivots the ~dozen lines per dataset into one record;
    // min() makes a duplicated key deterministic (the reference keeps the
    // first occurrence; logs are tiny so any associative pick is sound —
    // min is order-independent under Spark's partial aggregation).
    val numAggs = NumFields.map(f =>
      min(when(col("field") === f, col("num"))).as(f))
    val roiAgg = min(when(col("field") === "roi", col("val_str"))).as("roi_str")
    val rec = kv.groupBy("dataset_id").agg(numAggs.head, (numAggs.tail :+ roiAgg): _*)
    // Derived fields (public flexdata formulas) + ROI corner split.
    val typed = IntFields.foldLeft(rec)((df, f) =>
      df.withColumn(f, col(f).cast("bigint")))
    typed
      .withColumn("det2obj", col("src2det") - col("src2obj"))
      .withColumn("magnification",
        round(col("src2det") / col("src2obj"), 6))
      .withColumn("det_pixel",
        round(col("binning") * lit(detPitchMm), 6))
      .withColumn("img_pixel",
        round(col("binning") * lit(detPitchMm) * col("src2obj") / col("src2det"), 6))
      .withColumn("roi_arr", split(col("roi_str"), "\\s*,\\s*"))
      .withColumn("roi_l", element_at(col("roi_arr"), 1).cast("bigint"))
      .withColumn("roi_t", element_at(col("roi_arr"), 2).cast("bigint"))
      .withColumn("roi_r", element_at(col("roi_arr"), 3).cast("bigint"))
      .withColumn("roi_b", element_at(col("roi_arr"), 4).cast("bigint"))
      .drop("roi_str", "roi_arr")
  }

  /** Per-angle projection vectors from the canonical record (reference:
    * flexdata data.py::astra_projection_geom / ::_vec_geom — the cone_vec
    * form every downstream reconstructor consumes; mount empty at survey
    * time, SURVEY §0). One row per (dataset, angle k):
    * source position, detector-centre position, and the detector u
    * (horizontal) / v (vertical) pixel basis vectors, all in mm, world
    * frame with the rotation axis as +z.
    *
    * Convention (documented, self-consistent with [[parseSettings]]'s
    * fields): at θ = 0 the source sits at (src_hrz − axs_hrz, −src2obj,
    * src_vrt) and the detector centre at (det_hrz − axs_hrz, det2obj,
    * det_vrt); the gantry rotates by θ_k = theta_first + k·span/count
    * (endpoint-exclusive — a 0..360° scan of n projections steps 360/n,
    * the reference's spacing) about +z; u rotates with the gantry, v is
    * axial. Missing offsets default to 0 (the reference's behavior for
    * absent motor positions); det_pixel carries the binning.
    *
    * Shape: pure narrow explode + trig Columns off the (tiny) geometry
    * record — no shuffle, no action; a million-dataset record frame fans
    * out to its per-angle table entirely map-side.
    */
  def projectionVectors(geo: DataFrame): DataFrame = {
    val th = col("th")
    def rotX(x: Column, y: Column) = cos(th) * x - sin(th) * y
    def rotY(x: Column, y: Column) = sin(th) * x + cos(th) * y
    val sx0 = coalesce(col("src_hrz"), lit(0.0)) - coalesce(col("axs_hrz"), lit(0.0))
    val dx0 = coalesce(col("det_hrz"), lit(0.0)) - coalesce(col("axs_hrz"), lit(0.0))
    geo
      .withColumn("k", explode(expr("sequence(0, cast(theta_count as int) - 1)")))
      .withColumn("theta_deg", col("theta_first") +
        col("k") * (col("theta_last") - col("theta_first")) / col("theta_count"))
      .withColumn("th", radians(col("theta_deg")))
      .select(col("dataset_id"), col("k"), col("theta_deg"),
        rotX(sx0, -col("src2obj")).as("src_x"),
        rotY(sx0, -col("src2obj")).as("src_y"),
        coalesce(col("src_vrt"), lit(0.0)).as("src_z"),
        rotX(dx0, col("det2obj")).as("det_x"),
        rotY(dx0, col("det2obj")).as("det_y"),
        coalesce(col("det_vrt"), lit(0.0)).as("det_z"),
        (cos(th) * col("det_pixel")).as("u_x"),
        (sin(th) * col("det_pixel")).as("u_y"),
        lit(0.0).as("u_z"),
        lit(0.0).as("v_x"), lit(0.0).as("v_y"),
        col("det_pixel").as("v_z"))
  }

  /** Inverse of [[parseSettings]] (reference: flexdata data.py::write_meta
    * — the reference persists parsed geometry for downstream tools; mount
    * empty at survey time, SURVEY §0): canonical record → `key : value`
    * settings lines, one preferred vendor key per field, null fields
    * omitted. Fixpoint contract (spec'd): re-parsing the emitted lines
    * reproduces the record exactly — measurements render as doubles,
    * counts as integers, ROI as its `l, t, r, b` list. Narrow map +
    * explode, no shuffle; pair with `spark.write.text` partitioned by
    * dataset for the reference's one-file-per-scan layout.
    */
  def formatSettings(geo: DataFrame): DataFrame = {
    val numPairs: Seq[(String, String)] = Seq(
      "sod" -> "src2obj", "sdd" -> "src2det", "binning" -> "binning",
      "number of projections" -> "theta_count", "first angle" -> "theta_first",
      "last angle" -> "theta_last", "voltage" -> "voltage", "power" -> "power",
      "averages" -> "averages", "exposure time (ms)" -> "exposure_ms",
      "ver_tube" -> "src_vrt", "ver_det" -> "det_vrt", "tra_det" -> "det_hrz",
      "tra_obj" -> "axs_hrz", "tra_tube" -> "src_hrz")
    val lineCols = numPairs.map { case (k, f) =>
      when(col(f).isNotNull, concat(lit(s"$k : "), col(f).cast("string")))
    } :+ when(col("roi_l").isNotNull,
      concat(lit("roi (ltrb) : "), col("roi_l"), lit(", "), col("roi_t"),
        lit(", "), col("roi_r"), lit(", "), col("roi_b")))
    geo.select(col("dataset_id"),
      explode(array_compact(array(lineCols: _*))).as("line"))
  }

  // ---- Geometry propagation (SURVEY §1.1) -------------------------------
  //
  // flexcalc mutates the geometry record in place when a pipeline crops,
  // bins, or stitches projection data (reference: flexcalc process.py —
  // mount empty at survey time, SURVEY §0; the adjustments below follow
  // the public flexdata conventions: det_pixel = binning × pitch,
  // img_pixel = det_pixel / magnification, detector offsets in mm with
  // +v axial). Here the record is an immutable frame and every update is
  // a pure narrow Column transform — per-dataset, no shuffle, no action —
  // so a million-record geometry table updates entirely map-side.

  /** k× detector binning applied to the record: `binning`, `det_pixel`,
    * `img_pixel` all scale by k (magnification is geometric — unchanged).
    * Also correct for k× pooling of a RECONSTRUCTED volume, where the
    * voxel pitch `img_pixel` scales identically. ROI stays in unbinned
    * detector pixels (vendor convention) — untouched.
    */
  def binGeometry(geo: DataFrame, k: Int): DataFrame =
    geo.withColumn("binning", col("binning") * k)
      .withColumn("det_pixel", round(col("det_pixel") * k, 6))
      .withColumn("img_pixel", round(col("img_pixel") * k, 6))

  /** Detector-window crop `[y0,y1)×[x0,x1)` of an `nRows`×`nCols`
    * detector (all in CURRENT binned pixels): the retained window's
    * centre moves by `((y0+y1−1)−(nRows−1))/2` rows (resp. cols) relative
    * to the full detector's centre, and the mounted detector offsets
    * absorb the shift — `det_vrt`/`det_hrz` += shift × det_pixel (row
    * index runs along +v = +z, column along +u; see
    * [[projectionVectors]]). The ROI corners track the crop in unbinned
    * pixels (absent ROI treated as the full window at origin 0).
    */
  def cropGeometry(geo: DataFrame, y0: Int, y1: Int, x0: Int, x1: Int,
      nRows: Int, nCols: Int): DataFrame = {
    val dvPix = ((y0 + y1 - 1) - (nRows - 1)) / 2.0
    val dhPix = ((x0 + x1 - 1) - (nCols - 1)) / 2.0
    geo
      .withColumn("det_vrt", round(
        coalesce(col("det_vrt"), lit(0.0)) + lit(dvPix) * col("det_pixel"), 6))
      .withColumn("det_hrz", round(
        coalesce(col("det_hrz"), lit(0.0)) + lit(dhPix) * col("det_pixel"), 6))
      .withColumn("roi_l",
        coalesce(col("roi_l"), lit(0L)) + lit(x0) * col("binning"))
      .withColumn("roi_t",
        coalesce(col("roi_t"), lit(0L)) + lit(y0) * col("binning"))
      .withColumn("roi_r", col("roi_l") + lit(x1 - x0) * col("binning"))
      .withColumn("roi_b", col("roi_t") + lit(y1 - y0) * col("binning"))
  }

  /** Angle-subset crop `[z0,z1)` of the projection stack: theta bounds
    * narrow to the retained sweep (endpoint-exclusive spacing
    * `span/count`, matching [[projectionVectors]]).
    */
  def cropAnglesGeometry(geo: DataFrame, z0: Int, z1: Int): DataFrame = {
    val step = (col("theta_last") - col("theta_first")) / col("theta_count")
    geo.withColumn("theta_first_new", col("theta_first") + lit(z0) * step)
      .withColumn("theta_last", col("theta_first") + lit(z1) * step)
      .withColumn("theta_first", col("theta_first_new"))
      .withColumn("theta_count", lit(z1 - z0).cast("bigint"))
      .drop("theta_first_new")
  }

  /** Stitch: tiles of one dataset share the acquisition geometry and
    * differ only in their detector window, so the canvas record keeps the
    * shared fields (min-aggregated — order-independent under partial
    * aggregation, and equal across well-formed tiles) and the UNION of
    * the tile ROIs. One per-dataset grouped agg, same key as the data
    * stitch itself.
    */
  def stitchGeometry(geos: DataFrame*): DataFrame = {
    val all = geos.reduce(_ unionByName _)
    val shared = all.columns.filter(c =>
      c != "dataset_id" && !c.startsWith("roi_"))
    val aggs = shared.map(f => min(col(f)).as(f)) ++ Seq(
      min(col("roi_l")).as("roi_l"), min(col("roi_t")).as("roi_t"),
      max(col("roi_r")).as("roi_r"), max(col("roi_b")).as("roi_b"))
    all.groupBy("dataset_id").agg(aggs.head, aggs.tail.toIndexedSeq: _*)
      .select(all.columns.map(col).toIndexedSeq: _*)
  }

  /** Strict form: fail fast when a record is missing the fields no
    * reconstruction can proceed without (the reference raises on absent
    * SOD/SDD too).
    */
  def requireComplete(geo: DataFrame): DataFrame = {
    val bad = geo.filter(
      col("src2obj").isNull || col("src2det").isNull || col("binning").isNull)
      .select("dataset_id").limit(5).collect().map(_.getString(0))
    require(bad.isEmpty,
      s"settings incomplete (need sod/sdd/binning) for: ${bad.mkString(", ")}")
    geo
  }
}
