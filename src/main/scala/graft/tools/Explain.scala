package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Plan inspector: `runMain graft.tools.Explain <sfDir> <key> [key...]`
  * prints the formatted physical plan of each named query (or all when
  * none named). Used to audit pushdown / broadcast / shuffle structure
  * per the 100 TB design review loop.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    // t_stream_runtime EXECUTES a streaming job when constructed — skip it
    // in sweep mode (still inspectable when named explicitly).
    val eager = Set("t_stream_runtime", "t_stream_dedup",
      "t_stream_versions", "t_stream_changes", "t_stream_pipeline")
    val keys = if (args.length > 1) args.drop(1).toSeq
               else SparkEntry.queries.keys.toSeq.sorted.filterNot(eager)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    keys.foreach { k =>
      println(s"\n========== $k ==========")
      SparkEntry.queries(k)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
