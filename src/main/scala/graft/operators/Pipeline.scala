package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fluent volume-pipeline facade mirroring the reference's batch scheduler
  * UX (flexcalc/batch.py::scheduler + Node + Buffer, R24):
  *
  * {{{
  * Pipeline.readVolume(spark, path)
  *   .flatDarkCorrect(flat, dark)
  *   .crop(0, 64, 0, 512, 0, 512)
  *   .binPool(2)
  *   .hardThreshold(0.2)
  *   .describe          // draw_nodes analog
  *   .run()             // materialize, or .writeParquet(out)
  * }}}
  *
  * Each call appends a lazy node; nothing executes until run()/write —
  * exactly the reference's contract. The difference is WHO schedules:
  * here every node composes the Spark logical plan, so Catalyst fuses the
  * per-voxel nodes into one codegen'd stage, the DAG scheduler handles
  * topology and retry, and the unified memory manager + shuffle spill play
  * the role of the reference's RAM-budget Buffer swap to scratch. Nodes
  * with an aggregate→decide→reapply shape (cast2type, equalizeIntensity)
  * run their deciding aggregation only when the pipeline runs.
  */
final class Pipeline private (
    private val source: () => DataFrame,
    private val nodes: Vector[(String, DataFrame => DataFrame)]) {

  private def append(name: String, f: DataFrame => DataFrame): Pipeline =
    new Pipeline(source, nodes :+ (name -> f))

  // ---- processing nodes (Volume.* re-exposed in scheduler style) ----
  def flatDarkCorrect(flat: DataFrame, dark: DataFrame, eps: Double = 1e-6): Pipeline =
    append("flat_dark_correct", Volume.flatDarkCorrect(_, flat, dark, eps))
  def subtractAir(airX0: Int, airX1: Int): Pipeline =
    append("subtract_air", Volume.subtractAir(_, airX0, airX1))
  def residualRings(): Pipeline =
    append("residual_rings", Volume.residualRings(_))
  def crop(z0: Int, z1: Int, y0: Int, y1: Int, x0: Int, x1: Int): Pipeline =
    append("crop", Volume.crop(_, z0, z1, y0, y1, x0, x1))
  def binPool(k: Int): Pipeline = append(s"bin_pool($k)", Volume.binPool(_, k))
  def hardThreshold(t: Double): Pipeline =
    append(s"hard_threshold($t)", Volume.hardThreshold(_, t))
  def translate(dz: Int, dy: Int, dx: Int): Pipeline =
    append("translate", Volume.translate(_, dz, dy, dx))
  def expandGap(gapX: Int, gapW: Int): Pipeline =
    append("expand_gap", Volume.expandGap(_, gapX, gapW))
  def applyTransferCurve(curve: Seq[(Double, Double)]): Pipeline =
    append("transfer_curve", Volume.applyTransferCurve(_, curve))
  def cast2type(maxVal: Int = 255): Pipeline =
    append(s"cast2type($maxVal)", Volume.cast2type(_, maxVal))
  def equalizeTo(ref: DataFrame): Pipeline =
    append("equalize_intensity", Volume.equalizeIntensity(ref, _))
  def stitchWith(other: DataFrame): Pipeline =
    append("stitch", Volume.stitch(_, other))
  def generic(name: String)(f: DataFrame => DataFrame): Pipeline =
    append(s"generic($name)", f) // R24's arbitrary-callback node

  // ---- inspection / execution ----
  /** draw_nodes analog: the node list, in execution order. */
  def describe: String =
    ("read_volume" +: nodes.map(_._1)).mkString(" -> ")

  /** Materialize the pipeline as a DataFrame (lazy until an action). */
  def run(): DataFrame = nodes.foldLeft(source())((df, n) => n._2(df))

  /** write_data analog (R2): run + parquet sink, partitioned by z so a
    * 100 TB volume store lands as one prunable directory per slab range.
    */
  def writeParquet(path: String): Unit = {
    val out = run()
    // whole z-slabs per task at an explicit count — see
    // DocumentIO.writePartitioned for the tasks×partitions rationale.
    // KNOWN SKEW LIMIT (r18 advice, accepted): hashing on z alone puts
    // each z-slab through ONE writer task and pins the layout past AQE
    // skew-splitting — correct for volume stores, whose slabs are
    // near-uniform by construction (a slab is one z-range of a dense
    // grid), but a store with one oversized partition value would
    // serialize it; such a caller should add a salt/secondary column to
    // the repartition (trading the one-file-per-slab layout for fan-out)
    // rather than this default changing shape under it.
    out.repartition(
        math.max(out.sparkSession.sparkContext.defaultParallelism, 1),
        org.apache.spark.sql.functions.col("z"))
      .write.mode("overwrite").partitionBy("z").parquet(path)
  }
}

object Pipeline {
  /** read_data analog (R1): slab frame from a parquet volume store. */
  def readVolume(spark: SparkSession, path: String): Pipeline =
    new Pipeline(() => spark.read.parquet(path), Vector.empty)

  /** Start from an existing slab DataFrame (tests, in-memory volumes). */
  def fromDataFrame(df: DataFrame): Pipeline =
    new Pipeline(() => df, Vector.empty)
}
