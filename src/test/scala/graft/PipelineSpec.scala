package graft

import org.apache.spark.sql.functions._
import graft.operators.{Pipeline, Volume}

/** T1 spec for the scheduler-facade (flexcalc batch.py::scheduler analog). */
class PipelineSpec extends SparkSpec {

  private def vol8 = Volume.fromArray(spark, "p",
    Array.tabulate(8, 8, 8)((z, y, x) => (z * 100 + y * 10 + x).toFloat))

  test("describe lists nodes in order (draw_nodes analog)") {
    val p = Pipeline.fromDataFrame(vol8)
      .crop(0, 4, 0, 4, 0, 4).binPool(2).hardThreshold(50.0)
    assert(p.describe ===
      "read_volume -> crop -> bin_pool(2) -> hard_threshold(50.0)")
  }

  test("chained run() equals hand-composed Volume ops") {
    val viaPipeline = Pipeline.fromDataFrame(vol8)
      .crop(0, 4, 0, 4, 0, 4).binPool(2).hardThreshold(50.0)
      .run().collect().map(_.toSeq).toSet
    val manual = Volume.hardThreshold(
      Volume.binPool(Volume.crop(vol8, 0, 4, 0, 4, 0, 4), 2), 50.0)
      .collect().map(_.toSeq).toSet
    assert(viaPipeline === manual)
    assert(viaPipeline.nonEmpty)
  }

  test("generic node injects arbitrary user transforms (R24 generic)") {
    val out = Pipeline.fromDataFrame(vol8)
      .generic("keep-z0")(_.filter(col("z") === 0))
      .run()
    assert(out.count() === 8) // one z-plane of 8 y-lines
  }

  test("writeParquet round-trips through a z-partitioned store (R2/R1)") {
    val dir = java.nio.file.Files.createTempDirectory("volstore").toString
    Pipeline.fromDataFrame(vol8).crop(0, 2, 0, 8, 0, 8).writeParquet(dir)
    val back = Pipeline.readVolume(spark, dir).hardThreshold(100.0).run()
    assert(back.count() === 16) // 2z × 8y lines survive
    // partition pruning works on the store: z=1 reads one directory
    val pruned = spark.read.parquet(dir).filter(col("z") === 1)
    assert(pruned.count() === 8)
  }
}
