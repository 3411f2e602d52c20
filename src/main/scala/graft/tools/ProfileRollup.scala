package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing of the t_rollup_snapshot key (local diagnosis,
  * not a contract surface): each Snapshot verb is timed separately so
  * the commit hot path can be attributed (VERDICT r17 watch item 1).
  */
object ProfileRollup {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    catch { case _: Throwable => () }

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    import graft.ops.T
    import graft.sources.Snapshot
    (1 to 2).foreach { pass =>
      System.err.println(s"=== pass $pass")
      val t0 = System.nanoTime()
      val root = java.nio.file.Files.createTempDirectory("prof_rollup").toString
      val (evDir, ruDir) = (s"$root/events", s"$root/rollup")
      val all = T.evMs(spark, sfDir).withColumn("day_key",
          date_format(col("ts_ms"), "yyyyMMdd").cast("int"))
        .select("day_key", "event_id", "event_type", "value")
      val isDelta = col("day_key") >= 20240128 ||
        pmod(col("event_id"), lit(101)) === 0
      time("buildDailySnapshot (2 publishes)") {
        graft.operators.Rollup.buildDailySnapshot(
          spark, all.filter(!isDelta), evDir, ruDir, "day_key")
      }
      // refresh #1, decomposed
      val delta = all.filter(isDelta)
      time("currentTag(events)") { Snapshot.currentTag(spark, evDir) }
      val v1 = time("stageAppend(events)") {
        Snapshot.stageAppend(spark, evDir, delta, "day_key", "event_id")
      }
      time("commit(events)") { Snapshot.commit(spark, evDir, v1, Some("delta-1")) }
      time("currentTag(rollup)") { Snapshot.currentTag(spark, ruDir) }
      val days = time("days collect") {
        delta.select(col("day_key").cast("string")).distinct()
          .collect().map(_.getString(0)).toSeq
      }
      val rebuilt = graft.operators.Rollup.dailyRollup(
        time("readWhere(events, days) [lazy]") {
          Snapshot.readWhere(spark, evDir, days) }, "day_key")
      val v2 = time("stageReplacePartitions(rollup)") {
        Snapshot.stageReplacePartitions(spark, ruDir, rebuilt, "day_key",
          "event_type")
      }
      time("commit(rollup)") { Snapshot.commit(spark, ruDir, v2, Some("delta-1")) }
      // refresh #2 (idempotent no-op)
      time("refresh #2 (no-op)") {
        graft.operators.Rollup.refreshDailySnapshot(
          spark, evDir, ruDir, delta, "day_key", "delta-1")
      }
      time("final read+agg") {
        Snapshot.read(spark, ruDir)
          .select(col("day_key"), col("event_type"), col("n_events"),
            col("value_sum"))
          .orderBy("day_key", "event_type")
          .queryExecution.toRdd.count()
      }
      T.releaseCaches(blocking = true)
      System.err.println(f"=== pass $pass total ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
