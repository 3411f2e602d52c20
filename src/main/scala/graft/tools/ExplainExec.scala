package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** EXECUTED-plan inspector: `runMain graft.tools.ExplainExec <sfDir>
  * <key> [key...]` materializes each named query (toRdd.count, the
  * Bench action) and prints the FINAL adaptive physical plan — where
  * AQE-inserted nodes (ColumnarToRow, AQEShuffleRead, runtime join
  * swaps) are visible, unlike the pre-execution `Explain` dump. Local
  * audit tool, not part of the driver contract.
  */
object ExplainExec {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val keys = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    keys.foreach { k =>
      println(s"\n========== $k (executed) ==========")
      val df = SparkEntry.queries(k)(spark, sfDir)
      val rows = df.queryExecution.toRdd.count()
      graft.ops.T.releaseCaches(blocking = true)
      println(s"-- $rows rows --")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
