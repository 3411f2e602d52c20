package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import scala.collection.concurrent.TrieMap

/** Local profiling harness (not part of the driver contract): run one
  * contract key with a job-level listener and print per-Spark-job wall
  * times with their call sites, so a multi-second key can be attributed
  * to specific jobs (guide §1: measure first). Usage:
  *   sbt "runMain graft.tools.ProfileKey /root/testdata/sf0.1 t_rollup_snapshot"
  */
object ProfileKey {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val keys = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm the JVM the way Bench does
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    catch { case _: Throwable => () }

    val starts = TrieMap.empty[Int, (Long, String)]
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .orElse(j.stageInfos.lastOption.map(_.name))
          .getOrElse("?")
        starts.put(j.jobId, (System.nanoTime(), site.take(90)))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, site) =>
          val ms = (System.nanoTime() - t0) / 1e6
          lines.add(f"job ${j.jobId}%4d ${ms}%9.1f ms  $site")
        }
    })

    keys.foreach { key =>
      val fn = graft.SparkEntry.queries(key)
      // pass 1 (cold-ish), pass 2 (warm) — mirrors Bench best-of-2
      (1 to 2).foreach { pass =>
        lines.clear()
        val t0 = System.nanoTime()
        val rows = fn(spark, sfDir).queryExecution.toRdd.count()
        val total = (System.nanoTime() - t0) / 1e9
        graft.ops.T.releaseCaches(blocking = true)
        System.err.println(f"=== $key pass $pass: ${total}%.3f s ($rows rows)")
        import scala.jdk.CollectionConverters._
        val js = lines.asScala.toSeq
        js.foreach(l => System.err.println("  " + l))
        System.err.println(f"  jobs: ${js.size}")
      }
    }
    spark.stop()
  }
}
