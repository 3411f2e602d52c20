package graft

import java.nio.file.Files

import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.T

/** T3 coverage for the durable streaming-sink path behind t_stream_sink
  * (streaming/IdempotentSink): the two properties production cares about —
  * EXACTLY-ONCE RESUME (a stream restarted against a surviving checkpoint
  * processes only files that arrived since), and CRASH-REPLAY IDEMPOTENCE
  * (an epoch whose commit marker was lost — data landed, checkpoint not
  * advanced — re-fires on restart and must OVERWRITE its own output, not
  * double it; simulated here by deleting the commit file). The graded key
  * itself runs the fresh-checkpoint full-replay case.
  */
class StreamSinkSpec extends SparkSpec {

  test("foreachBatch parquet sink resumes from checkpoint exactly once") {
    val root = Files.createTempDirectory("graft_sink_spec").toString
    val src = s"$root/src"
    val data = s"$root/data"
    val chk = s"$root/chk"

    val events = T.t(spark, sf(), "events")
      .select(col("event_id"), col("user_id"), col("value"))
    val n = events.count()
    val half = events.agg(expr("percentile(event_id, 0.5D)")).collect()(0).getDouble(0).toLong

    def runStream(): Unit = {
      val q = spark.readStream
        .schema(events.schema)
        .parquet(src)
        .writeStream
        .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
          graft.streaming.IdempotentSink.landBatch(batch, data, batchId)
        }
        .option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // the file stream source lists FILES in src (no recursion): land each
    // shard as one top-level parquet file, the way an ingest bucket fills
    def land(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = s"$root/tmp_$name"
      df.coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles
        .find(_.getName.endsWith(".parquet")).get
      Files.createDirectories(java.nio.file.Paths.get(src))
      Files.move(part.toPath, java.nio.file.Paths.get(src, s"$name.parquet"))
    }

    // shard 1 arrives, stream runs to quiescence
    land(events.filter(col("event_id") <= half), "shard1")
    runStream()
    val afterFirst = graft.streaming.IdempotentSink.readLanded(spark, data).count()
    assert(afterFirst === events.filter(col("event_id") <= half).count())

    // shard 2 arrives later; SAME checkpoint → only the new file lands
    land(events.filter(col("event_id") > half), "shard2")
    runStream()
    val landed = graft.streaming.IdempotentSink.readLanded(spark, data)
    assert(landed.count() === n, "resume must land each row exactly once")
    assert(landed.select("event_id").distinct().count() === n,
      "no row may land twice across the two runs")

    // CRASH REPLAY: lose the last epoch's commit marker (the crash window
    // is "sink wrote, checkpoint didn't advance") and restart against the
    // same checkpoint. The source re-fires that epoch; the batchId-keyed
    // sink must overwrite its own directory, landing nothing twice.
    val commits = new java.io.File(s"$chk/commits").listFiles
      .filter(_.getName.matches("\\d+")).sortBy(_.getName.toInt)
    assert(commits.nonEmpty)
    Files.delete(commits.last.toPath)
    // LocalFileSystem .crc sidecar: the re-commit renames a temp file onto
    // commits/<id>, which fails if the stale checksum sidecar survives
    Files.deleteIfExists(
      commits.last.toPath.resolveSibling(s".${commits.last.getName}.crc"))
    org.apache.spark.sql.execution.datasources.FileStatusCache.resetForTesting()
    runStream()
    val replayed = graft.streaming.IdempotentSink.readLanded(spark, data)
    assert(replayed.count() === n,
      "a replayed epoch must overwrite its batch directory, not double it")
    assert(replayed.select("event_id").distinct().count() === n)
  }

  test("SnapshotSink: tagged commits make a replayed epoch a no-op") {
    import graft.sources.Snapshot
    val root = Files.createTempDirectory("graft_snap_sink_spec").toString
    val src = s"$root/src"
    val table = s"$root/table"
    val chk = s"$root/chk"

    val events = T.t(spark, sf(), "events")
      .select(col("event_id"), col("user_id"), col("value"))
      .withColumn("day_key", pmod(col("event_id"), lit(3)).cast("int"))
    val n = events.count()
    val half = events.agg(expr("percentile(event_id, 0.5D)"))
      .collect()(0).getDouble(0).toLong

    def runStream(): Unit = {
      val q = spark.readStream
        .schema(events.schema)
        .parquet(src)
        .writeStream
        .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
          graft.streaming.SnapshotSink.landBatch(
            batch, table, "day_key", "event_id", batchId)
        }
        .option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    def land(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = s"$root/tmp_$name"
      df.coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles
        .find(_.getName.endsWith(".parquet")).get
      Files.createDirectories(java.nio.file.Paths.get(src))
      Files.move(part.toPath, java.nio.file.Paths.get(src, s"$name.parquet"))
    }

    land(events.filter(col("event_id") <= half), "shard1")
    runStream()
    land(events.filter(col("event_id") > half), "shard2")
    runStream()
    assert(Snapshot.read(spark, table).count() === n)
    val verBefore = Snapshot.currentVersion(spark, table)

    // crash replay: lose the last commit marker; the re-fired epoch must
    // find its own "batch-<id>" tag and land NOTHING — same version, same
    // rows, no new snapshot
    val commits = new java.io.File(s"$chk/commits").listFiles
      .filter(_.getName.matches("\\d+")).sortBy(_.getName.toInt)
    Files.delete(commits.last.toPath)
    Files.deleteIfExists(
      commits.last.toPath.resolveSibling(s".${commits.last.getName}.crc"))
    org.apache.spark.sql.execution.datasources.FileStatusCache.resetForTesting()
    runStream()
    assert(Snapshot.currentVersion(spark, table) === verBefore,
      "replayed epoch must not commit a new version")
    val replayed = Snapshot.readVerified(spark, table, "event_id")
    assert(replayed.count() === n,
      "a replayed epoch must be a tag no-op, not a double append")
    assert(replayed.select("event_id").distinct().count() === n)
  }
}
