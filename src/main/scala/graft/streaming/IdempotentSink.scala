package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}

/** Crash-surviving batchId-keyed parquet sink for `foreachBatch`
  * (exercised by `t_stream_sink`; replay proof in StreamSinkSpec).
  *
  * The hazard with a bare `mode("append")` sink: foreachBatch's output
  * write and the checkpoint's commit marker are two separate actions. A
  * crash BETWEEN them (data landed, commit missing) makes the restarted
  * stream re-fire the same epoch — and an append sink lands every row of
  * that epoch twice. Structured Streaming's contract is exactly-once
  * STATE, at-least-once SIDE EFFECTS; idempotence must come from the
  * sink.
  *
  * The standard fix, implemented here: key each epoch's output by its
  * `batchId` — every micro-batch owns the `batch=<id>` directory and
  * writes it with `mode("overwrite")`, so a replayed epoch REPLACES its
  * own (possibly partial) output instead of doubling it. Landing is
  * atomic-enough per epoch because readers discover the directory only
  * through parquet partition listing after the write commits its files;
  * a torn epoch is re-overwritten wholesale on replay. This is what
  * table-format streaming sinks do with (queryId, epochId) transaction
  * dedup, reduced to plain parquet.
  *
  * Scale notes: one directory per micro-batch is the natural compaction
  * unit — `DocumentIO.compact` (or a `Snapshot.publish` cut) rolls the
  * accumulated small batch directories into read-optimized files on a
  * schedule; the `batch` partition column also gives consumers a free
  * incremental cursor ("read batches > my high-water mark").
  */
object IdempotentSink {

  /** The foreachBatch body: land `batch` under `dataDir/batch=<batchId>`,
    * overwriting any previous (crashed/partial) attempt of the same epoch.
    */
  def landBatch(batch: Dataset[Row], dataDir: String, batchId: Long): Unit =
    batch.write.mode("overwrite").parquet(s"$dataDir/batch=$batchId")

  /** Read everything landed so far; the `batch` partition column is
    * dropped (it is sink bookkeeping, not data — callers wanting the
    * incremental cursor read the directory themselves).
    */
  def readLanded(spark: SparkSession, dataDir: String): DataFrame = {
    val df = spark.read.parquet(dataDir)
    df.drop("batch")
  }
}
