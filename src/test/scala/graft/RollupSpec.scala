package graft

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import graft.operators.Rollup

/** T1 checks for operators/Rollup (graded by `t_rollup_incremental`):
  * the two properties the full-recompute oracle cannot see — the refresh
  * must leave UNTOUCHED rollup day-partitions' files byte-identical, and
  * the event scan feeding the rebuild must prune to the affected days'
  * directories (PartitionFilters), not read the whole store.
  */
class RollupSpec extends SparkSpec {
  import spark.implicits._

  private def events(ids: Range, day: Int) = ids.map { i =>
    (day, i.toLong, if (i % 2 == 0) "view" else "click", i * 1.5)
  }

  private def fileState(root: String, day: Int): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    Files.list(java.nio.file.Paths.get(root, s"day_key=$day"))
      .iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map((p: Path) => p.getFileName.toString ->
        Files.getLastModifiedTime(p).toMillis)
      .toMap
  }

  test("refresh rebuilds only the delta's days; other days' files stay byte-identical") {
    val root = Files.createTempDirectory("graft_rollup_spec").toString
    val (evDir, ruDir) = (s"$root/ev", s"$root/ru")
    val base = (events(1 to 40, 1) ++ events(41 to 80, 2) ++ events(81 to 90, 3))
      .toDF("day_key", "event_id", "event_type", "value")
    Rollup.buildDaily(spark, base, evDir, ruDir, "day_key")
    val d1Before = fileState(ruDir, 1)
    val d2Before = fileState(ruDir, 2)

    // delta: late events into day 3 only
    val delta = events(91 to 120, 3)
      .toDF("day_key", "event_id", "event_type", "value")
    Rollup.refreshDaily(spark, evDir, ruDir, delta, "day_key")

    assert(fileState(ruDir, 1) === d1Before, "day 1 rollup files must be untouched")
    assert(fileState(ruDir, 2) === d2Before, "day 2 rollup files must be untouched")
    // refreshed rollup equals a from-scratch rollup over base + delta
    val got = spark.read.parquet(ruDir)
      .select("day_key", "event_type", "n_events", "value_sum")
      .as[(Int, String, Long, java.math.BigDecimal)].collect().toSet
    val want = Rollup.dailyRollup(base.unionByName(delta), "day_key")
      .as[(Int, String, Long, java.math.BigDecimal)].collect().toSet
    assert(got === want)
  }

  test("snapshot refresh is exactly-once: retry after every crash point converges") {
    import graft.sources.Snapshot
    val root = Files.createTempDirectory("graft_rollup_snap_spec").toString
    val (evDir, ruDir) = (s"$root/ev", s"$root/ru")
    val base = (events(1 to 40, 1) ++ events(41 to 80, 2) ++ events(81 to 90, 3))
      .toDF("day_key", "event_id", "event_type", "value")
    val delta = events(91 to 120, 3)
      .toDF("day_key", "event_id", "event_type", "value")
    Rollup.buildDailySnapshot(spark, base, evDir, ruDir, "day_key")

    def rollupContent() = Snapshot.read(spark, ruDir)
      .select("day_key", "event_type", "n_events", "value_sum")
      .as[(Int, String, Long, java.math.BigDecimal)].collect().toSet
    val want = Rollup.dailyRollup(base.unionByName(delta), "day_key")
      .as[(Int, String, Long, java.math.BigDecimal)].collect().toSet

    // crash point A: events staged but NOT committed — invisible; a full
    // retry restages and completes
    Snapshot.stageAppend(spark, evDir, delta, "day_key", "event_id")
    Rollup.refreshDailySnapshot(spark, evDir, ruDir, delta, "day_key", "d1")
    assert(rollupContent() === want, "retry after stage-only crash")

    // crash point B (the refreshDaily killer): events COMMITTED with the
    // delta tag, rollup not yet refreshed — the retry must see its own
    // tag, skip the append (no doubling), and only redo the rollup
    val root2 = Files.createTempDirectory("graft_rollup_snap_spec2").toString
    val (evDir2, ruDir2) = (s"$root2/ev", s"$root2/ru")
    Rollup.buildDailySnapshot(spark, base, evDir2, ruDir2, "day_key")
    val v = Snapshot.stageAppend(spark, evDir2, delta, "day_key", "event_id")
    Snapshot.commit(spark, evDir2, v, Some("d1"))   // …crash here
    Rollup.refreshDailySnapshot(spark, evDir2, ruDir2, delta, "day_key", "d1")
    val got2 = Snapshot.read(spark, ruDir2)
      .select("day_key", "event_type", "n_events", "value_sum")
      .as[(Int, String, Long, java.math.BigDecimal)].collect().toSet
    assert(got2 === want, "retry after events-committed crash must not double the delta")

    // crash point C: both committed — a further retry is a pure no-op
    val evVer = Snapshot.currentVersion(spark, evDir2)
    Rollup.refreshDailySnapshot(spark, evDir2, ruDir2, delta, "day_key", "d1")
    assert(Snapshot.currentVersion(spark, evDir2) === evVer,
      "completed refresh re-run must not create new versions")
  }

  test("the rebuild's event scan prunes to the affected day directories") {
    val root = Files.createTempDirectory("graft_rollup_spec2").toString
    val (evDir, ruDir) = (s"$root/ev", s"$root/ru")
    val base = (events(1 to 40, 1) ++ events(41 to 80, 2))
      .toDF("day_key", "event_id", "event_type", "value")
    Rollup.buildDaily(spark, base, evDir, ruDir, "day_key")
    val affected = Seq(2).toDF("day_key")
    val plan = spark.read.parquet(evDir)
      .join(broadcast(affected), Seq("day_key"), "left_semi")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PartitionFilters: [dynamicpruning") ||
      "PartitionFilters: \\[[^\\]]*day_key".r.findFirstIn(plan).nonEmpty,
      s"affected-day semi-join does not prune the event scan:\n$plan")
  }
}
