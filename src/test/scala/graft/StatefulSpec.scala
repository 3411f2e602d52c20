package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Stateful

/** T1/T3: flatMapGroupsWithState custom state — batch parity and, the real
  * point, state carried ACROSS micro-batches in the state store.
  */
class StatefulSpec extends SparkSpec {

  test("runningUserStats on a batch frame computes per-user totals") {
    import spark.implicits._
    val df = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:01"), 100.0),
      (1L, Timestamp.valueOf("2024-01-01 00:00:02"), 400.0),
      (2L, Timestamp.valueOf("2024-01-01 00:00:03"), 10.0))
      .toDF("user_id", "ts", "value")
    val out = Stateful.runningUserStats(df).collect()
      .map(u => u.user_id -> u).toMap
    assert(out(1L).cnt === 2 && out(1L).sum_value === 500.0 && out(1L).anomalous)
    assert(out(2L).cnt === 1 && !out(2L).anomalous)
  }

  test("userStatsExact: integer-exact sums, hand-computed rows") {
    import spark.implicits._
    val df = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:01"), 0.105),
      (1L, Timestamp.valueOf("2024-01-01 00:00:02"), 0.205),
      (2L, Timestamp.valueOf("2024-01-01 00:00:03"), 327.53))
      .toDF("user_id", "ts", "value")
      .withColumn("ts_ms", ops.T.truncNtz("millisecond", col("ts")))
    val out = Stateful.userStatsExact(df).collect()
      .map(u => u.user_id -> u).toMap
    // 0.105 + 0.205 in doubles is 0.31000000000000005; the micros-Long
    // path must land exactly on 310000.
    assert(out(1L).cnt === 2 && out(1L).sum_micros === 310000L)
    assert(out(1L).max_ts_ms === Timestamp.valueOf("2024-01-01 00:00:02").getTime)
    assert(out(2L).cnt === 1 && out(2L).sum_micros === 327530000L)
  }

  test("userStatsExactTws (transformWithState) matches userStatsExact on batch") {
    // Batch transformWithState also instantiates a state store, and the
    // default HDFS-backed provider rejects it (no multi-column-family
    // support) — RocksDB is required on either execution path.
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // In a batch query no StreamingQueryManager ever registers the
    // StateStoreCoordinator RPC endpoint, and RocksDB's snapshot-upload
    // report then fails the whole store load (RpcEndpointNotFound) — turn
    // the reporting off for the batch path.
    spark.conf.set(
      "spark.sql.streaming.stateStore.coordinatorReportSnapshotUploadLag", "false")
    try {
      val events = ops.T.evMs(spark, sf())
      val fmg = Stateful.userStatsExact(events).collect()
        .map(u => (u.user_id, u.cnt, u.sum_micros, u.max_ts_ms)).toSet
      val tws = Stateful.userStatsExactTws(events).collect()
        .map(u => (u.user_id, u.cnt, u.sum_micros, u.max_ts_ms)).toSet
      assert(tws === fmg)
      assert(tws.nonEmpty)
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("transformWithState carries ValueState across micro-batches (RocksDB store)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Timestamp, Double)]
      val q = Stateful.userStatsExactTws(
          mem.toDF.toDF("user_id", "ts", "value")
            .withColumn("ts_ms", ops.T.truncNtz("millisecond", col("ts"))))
        .writeStream.format("memory").queryName("tws_sink")
        .outputMode("append").start()
      try {
        mem.addData((7L, Timestamp.valueOf("2024-01-01 00:00:01"), 0.105))
        q.processAllAvailable()
        mem.addData((7L, Timestamp.valueOf("2024-01-01 00:00:05"), 0.205))
        q.processAllAvailable()
        val rows = spark.table("tws_sink")
          .select("user_id", "cnt", "sum_micros").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        // batch 2's emission includes batch 1's state: exact 310000 micros.
        assert(rows.contains((7L, 1L, 105000L)))
        assert(rows.contains((7L, 2L, 310000L)))
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("userValueSketch carries KLL state across batches; tiny k stays in envelope") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // cross-batch carry in the EXACT regime: 1..100 then 101..200 for
      // one user — the second emission must see all 200 values, and
      // inclusive rank is then a pure count: rank(50) = 50/200
      val mem = MemoryStream[(Long, Double)]
      val q = Stateful.userValueSketch(mem.toDF.toDF("user_id", "value"))
        .writeStream.format("memory").queryName("kll_sink")
        .outputMode("append").start()
      try {
        mem.addData((1L to 100L).map(v => (7L, v.toDouble)): _*)
        q.processAllAvailable()
        mem.addData((101L to 200L).map(v => (7L, v.toDouble)): _*)
        q.processAllAvailable()
        val rows = spark.table("kll_sink")
          .select("user_id", "n", "r50").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        assert(rows.contains((7L, 100L, 0.5)))
        assert(rows.contains((7L, 200L, 0.25)))
      } finally q.stop()
      // estimation regime at k=64 over 10k values: compaction fires, the
      // rank probe keeps the KLL normalized-rank envelope
      val mem2 = MemoryStream[(Long, Double)]
      val q2 = Stateful.userValueSketch(
          mem2.toDF.toDF("user_id", "value"), k = 64)
        .writeStream.format("memory").queryName("kll_sink_est")
        .outputMode("append").start()
      try {
        (0 until 10).foreach { b =>
          mem2.addData((1L to 1000L).map(v => (9L, (b * 1000 + v).toDouble)): _*)
          q2.processAllAvailable()
        }
        val last = spark.table("kll_sink_est")
          .filter(col("n") === 10000L).select("r50").head().getDouble(0)
        // rank(50.0) over 1..10000 ≈ 0.005; k=64 bounds rank error ~5%
        assert(math.abs(last - 0.005) <= 0.08, s"rank(50) = $last")
      } finally q2.stop()
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("cdcLatest: last-writer-wins carries across micro-batches; batch run converges") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def frame(df: org.apache.spark.sql.DataFrame) =
      df.toDF("user_id", "ms", "event_id", "op", "value")
        .withColumn("ts_ms",
          expr("timestampadd(MILLISECOND, ms, TIMESTAMP_NTZ '1970-01-01 00:00:00')"))
    val records = Seq(
      (1L, 100L, 1L, "U", 1.5), (1L, 200L, 2L, "U", 2.5),
      (2L, 100L, 3L, "U", 9.0),
      // second batch: an OLDER record for user 1 (must bump n_ops but not
      // win) and a tombstone for user 2
      (1L, 150L, 4L, "U", 7.0), (2L, 300L, 5L, "D", 0.0))
    val mem = MemoryStream[(Long, Long, Long, String, Double)]
    val q = Stateful.cdcLatest(frame(mem.toDF))
      .writeStream.format("memory").queryName("cdc_sink")
      .outputMode("append").start()
    val fin =
      try {
        mem.addData(records.take(3): _*)
        q.processAllAvailable()
        mem.addData(records.drop(3): _*)
        q.processAllAvailable()
        // n_ops grows monotonically → the max-n_ops row per key IS the
        // final state
        spark.table("cdc_sink").collect()
          .groupBy(_.getAs[Long]("user_id"))
          .map { case (k, rows) => k -> rows.maxBy(_.getAs[Long]("n_ops")) }
      } finally q.stop()
    assert(fin(1L).getAs[Long]("last_event_id") === 2L) // late lower-seq lost
    assert(fin(1L).getAs[Long]("value_micros") === 2500000L)
    assert(fin(1L).getAs[Long]("n_ops") === 3L)
    assert(fin(2L).getAs[String]("last_op") === "D") // tombstone retained
    assert(fin(2L).getAs[Long]("n_ops") === 2L)
    // single-batch (batch-mode) run over the SAME records converges to the
    // identical state — the merge is order/slicing-independent
    val batch = Stateful.cdcLatest(frame(records.toDF())).collect()
      .map(u => u.user_id -> u).toMap
    assert(batch(1L).last_event_id === 2L && batch(1L).n_ops === 3L &&
      batch(1L).value_micros === 2500000L)
    assert(batch(2L).last_op === "D" && batch(2L).n_ops === 2L)
  }

  test("topKPerUser: bounded state converges across micro-batches to the batch answer") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val records = Seq(
      // user 1: 5 values; top-3 = 9.5 (e5), 7.0 (e2), 7.0 (e4 — tiebreak
      // by event_id, e2 < e4 wins rank 2); user 2: fewer than k entries
      (1L, 1L, 3.0), (1L, 2L, 7.0), (2L, 3L, 4.5),
      (1L, 4L, 7.0), (1L, 5L, 9.5), (1L, 6L, 1.0), (2L, 7L, 2.0))
    def frame(df: org.apache.spark.sql.DataFrame) =
      df.toDF("user_id", "event_id", "value")
    val mem = MemoryStream[(Long, Long, Double)]
    val q = Stateful.topKPerUser(frame(mem.toDF))
      .writeStream.format("memory").queryName("topk_sink")
      .outputMode("append").start()
    val fin =
      try {
        mem.addData(records.take(3): _*)
        q.processAllAvailable()
        mem.addData(records.drop(3): _*)
        q.processAllAvailable()
        // each micro-batch re-emits the key's full current top-k; group
        // per (user, rank) and keep the LAST emission per key = the
        // final state (later batches supersede earlier ones)
        val all = spark.table("topk_sink").collect()
          .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("rank"),
            r.getAs[Long]("value_micros"), r.getAs[Long]("event_id")))
        // batch 2 rows for user 1 are the superseding ones; take the
        // final answer as: for each user the emission set whose best
        // value is maximal (monotone under inserts)
        all
      } finally q.stop()
    // final state per (user, rank): batch run over ALL records
    val batch = Stateful.topKPerUser(frame(records.toDF())).collect()
      .map(u => (u.user_id, u.rank) -> (u.value_micros, u.event_id)).toMap
    assert(batch((1L, 1)) === (9500000L, 5L))
    assert(batch((1L, 2)) === (7000000L, 2L)) // tiebreak: lower event_id
    assert(batch((1L, 3)) === (7000000L, 4L))
    assert(batch((2L, 1)) === (4500000L, 3L))
    assert(batch((2L, 2)) === (2000000L, 7L))
    assert(!batch.contains((2L, 3)), "fewer entries than k stays short")
    // streaming convergence: every batch-final row was emitted by the
    // stream. (1,3) → (7.0, e4) is the carry proof: batch 2 ALONE would
    // rank (1.0, e6) third — only merged cross-batch state produces it.
    val allSet = fin.map(t => ((t._1, t._2), (t._3, t._4))).toSet
    batch.foreach { case (k, v) =>
      assert(allSet.contains((k, v)), s"stream never emitted $k -> $v") }
    assert(fin.filter(t => t._1 == 1L && t._2 == 1).map(_._3).max === 9500000L)
  }

  test("state persists across micro-batches (incremental counts)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val q = Stateful.runningUserStats(
        mem.toDF.toDF("user_id", "ts", "value"))
      .writeStream.format("memory").queryName("stateful_sink")
      .outputMode("append").start()
    try {
      mem.addData((7L, Timestamp.valueOf("2024-01-01 00:00:01"), 50.0))
      q.processAllAvailable()
      mem.addData((7L, Timestamp.valueOf("2024-01-01 00:00:05"), 250.0),
        (8L, Timestamp.valueOf("2024-01-01 00:00:06"), 1.0))
      q.processAllAvailable()
      val rows = spark.table("stateful_sink")
        .select("user_id", "cnt", "sum_value").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // batch 1 emitted (7, 1, 50); batch 2 emitted (7, 2, 300) — the
      // count/sum INCLUDE batch 1 via the state store — and (8, 1, 1).
      assert(rows.contains((7L, 1L, 50.0)))
      assert(rows.contains((7L, 2L, 300.0)))
      assert(rows.contains((8L, 1L, 1.0)))
    } finally q.stop()
  }

  test("graded streaming keys are state-store-provider-agnostic (RocksDB == default)") {
    // The production state store at scale is RocksDB (bounded heap, spill
    // to disk); the graded runtime keys run on the default HDFS-backed
    // provider. Pin that the provider is an EXECUTION choice, not a
    // semantic one: the watermarked session-window key AND the
    // watermarked streaming-dedup key must produce identical rows under
    // both. (t_stream_kll needs no parity pin — its transformWithState
    // runtime rejects the default provider, so the graded key is
    // RocksDB-scoped ALWAYS; t_stateful_stats' flatMapGroupsWithState is
    // covered by the session/dedup pair sharing its state machinery.)
    for (key <- Seq("t_stream_session", "t_stream_dedup")) {
      val defaultRows = graft.SparkEntry.queries(key)(spark, sf())
        .collect().map(_.toString).sorted
      val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val rocksRows = graft.SparkEntry.queries(key)(spark, sf())
          .collect().map(_.toString).sorted
        assert(rocksRows.nonEmpty, s"$key returned no rows under RocksDB")
        assert(rocksRows.toSeq === defaultRows.toSeq,
          s"$key rows differ across state-store providers")
      } finally prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("version-log stream: one batch per commit, restart resumes exactly once, non-append refuses") {
    val root = java.nio.file.Files.createTempDirectory("graft_vstream_spec").toString
    val table = s"$root/table"
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val S = graft.sources.Snapshot
    def third(k: Int) =
      docs.filter(pmod(col("doc_id"), lit(3)) === k)
    S.publish(spark, table, third(0), "lang", "text") // v1
    S.commit(spark, table, S.stageAppend(spark, table, third(1), "lang", "text")) // v2
    S.commit(spark, table, S.stageAppend(spark, table, third(2), "lang", "text")) // v3
    def fp(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        coalesce(sum(conv(substring(md5(concat_ws("|", col("doc_id"), col("text"))),
          1, 8), 16, 10).cast("bigint")), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[(Long, (Long, Long))]()
    def drain(): Unit = {
      val q = spark.readStream.format("graft-snapshot-stream")
        .option("path", table)
        .option("startingVersion", "0") // full-history replay under test
        .load()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          batches.add((id, fp(b.toDF()))); ()
        }
        .option("checkpointLocation", s"$root/chk")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // run 1: exactly one batch per committed version, each = its appends
    drain()
    val run1 = batches.toArray(Array.empty[(Long, (Long, Long))]).sortBy(_._1)
    assert(run1.length === 3, s"expected one batch per commit, got ${run1.length}")
    assert(run1.map(_._2).toSeq === Seq(fp(third(0)), fp(third(1)), fp(third(2))))
    // run 2 against the SAME checkpoint: a commit that landed while the
    // stream was down is emitted exactly once — no replay of v1..v3
    val late = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
      .withColumn("doc_id", col("doc_id") + lit(8000000L))
    S.commit(spark, table, S.stageAppend(spark, table, late, "lang", "text")) // v4
    batches.clear()
    drain()
    val run2 = batches.toArray(Array.empty[(Long, (Long, Long))])
    assert(run2.length === 1, s"restart must emit only the new commit, got ${run2.length}")
    assert(run2(0)._2 === fp(late))
    // a fixed offset range is DETERMINISTIC (what makes a crash-retry
    // of an uncommitted epoch exact): same range -> same file list ->
    // same rows (files are immutable)
    val f1 = graft.sources.Snapshot.appendedFiles(spark, table, 1, 2)
    val f2 = graft.sources.Snapshot.appendedFiles(spark, table, 1, 2)
    assert(f1 === f2 && f1.nonEmpty)
    assert(fp(spark.read.parquet(f1: _*)) === fp(third(1)))
    // a NON-APPEND commit (upsert rewrote files) fails the stream LOUDLY
    S.upsert(spark, table,
      third(0).withColumn("text", concat(col("text"), lit(" edit"))),
      "doc_id", "lang", "text") // v5
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain()
    }
    def msgs(t: Throwable): String =
      Iterator.iterate(t: Throwable)(_.getCause).takeWhile(_ != null).take(8)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs(ex).contains("pure appends"), msgs(ex))
  }

  test("version-log stream: startingVersion attaches without the initial load") {
    val root = java.nio.file.Files.createTempDirectory("graft_vstream_sv").toString
    val table = s"$root/table"
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val S = graft.sources.Snapshot
    S.publish(spark, table, docs.filter(col("lang") === "en"), "lang", "text") // v1
    S.commit(spark, table, S.stageAppend(spark, table,
      docs.filter(col("lang") === "de"), "lang", "text")) // v2
    S.commit(spark, table, S.stageAppend(spark, table,
      docs.filter(col("lang") === "fr"), "lang", "text")) // v3
    // attach AT v2: no initial load — only v3's appends are emitted
    val got = new java.util.concurrent.atomic.AtomicLong(0)
    val langs = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]())
    val q = spark.readStream.format("graft-snapshot-stream")
      .option("path", table).option("startingVersion", "2").load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        got.addAndGet(b.count())
        b.select("lang").distinct().collect().foreach(r => langs.add(r.getString(0)))
        ()
      }
      .option("checkpointLocation", s"$root/chk")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(got.get() === docs.filter(col("lang") === "fr").count())
    assert(langs.size === 1 && langs.contains("fr"),
      s"startingVersion=2 must skip the v1/v2 content, got langs $langs")
  }

  test("CDF stream: per-commit delta batches, compaction emits empty, signed feed tracks the table") {
    val root = java.nio.file.Files.createTempDirectory("graft_cdfstream_spec").toString
    val table = s"$root/table"
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val S = graft.sources.Snapshot
    S.publish(spark, table, docs, "lang", "text") // v1
    S.commit(spark, table, S.stageAppend(spark, table, // v2: fragment en
      docs.filter(col("lang") === "en")
        .withColumn("doc_id", col("doc_id") + lit(7000000L)), "lang", "text"))
    S.compactPartitions(spark, table, "lang", "text", maxFiles = 1) // v3
    S.upsert(spark, table, // v4: delete+insert deltas
      docs.filter(col("lang") === "de")
        .withColumn("text", concat(col("text"), lit(" cdfstream"))),
      "doc_id", "lang", "text")
    val perBatch = new java.util.concurrent.ConcurrentHashMap[Long, (Long, Long)]()
    val q = spark.readStream.format("graft-snapshot-stream")
      .option("path", table).option("readChanges", "true")
      .option("startingVersion", "0") // per-commit delta replay under test
      .load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val r = b.toDF().agg(
          count(when(col("_change_type") === "insert", 1)),
          count(when(col("_change_type") === "delete", 1))).head()
        perBatch.put(id, (r.getLong(0), r.getLong(1))); ()
      }
      .option("checkpointLocation", s"$root/chk")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(perBatch.size === 4, s"one CDF batch per commit: $perBatch")
    val nDocs = docs.count()
    val nEn = docs.filter(col("lang") === "en").count()
    val nDe = docs.filter(col("lang") === "de").count()
    assert(perBatch.get(0L) === ((nDocs, 0L)))      // initial snapshot as inserts
    assert(perBatch.get(1L) === ((nEn, 0L)))        // append: inserts only
    assert(perBatch.get(2L) === ((0L, 0L)))         // compaction: EMPTY delta
    assert(perBatch.get(3L) === ((nDe, nDe)))       // upsert: delete+insert
  }

  test("fresh stream attach survives vacuumed, non-append, and orphan-numbered history") {
    val root = java.nio.file.Files.createTempDirectory("graft_vstream_attach").toString
    val table = s"$root/table"
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val S = graft.sources.Snapshot
    S.publish(spark, table, docs, "lang", "text") // v1
    S.upsert(spark, table, // v2: NON-append history
      docs.filter(col("lang") === "de")
        .withColumn("text", concat(col("text"), lit(" att"))),
      "doc_id", "lang", "text")
    // an ORPHAN version number: staged but never committed (the
    // abandoned-merge-loser shape a dense-integer walk would trip on)
    S.stageUpsert(spark, table,
      docs.filter(col("lang") === "fr")
        .withColumn("text", concat(col("text"), lit(" orphan"))),
      "doc_id", "lang", "text") // claims v3, never flips
    S.commit(spark, table, S.stageAppend(spark, table, // v4: a real commit
      docs.filter(col("lang") === "zh")
        .withColumn("doc_id", col("doc_id") + lit(6000000L)),
      "lang", "text"))
    S.vacuum(spark, table) // v1/v2 manifests gone; orphan v3 swept
    val expect = S.read(spark, table)
    val counts = new java.util.concurrent.atomic.AtomicLong(0)
    val nBatches = new java.util.concurrent.atomic.AtomicLong(0)
    def drain(): Unit = {
      val q = spark.readStream.format("graft-snapshot-stream")
        .option("path", table).load() // DEFAULT attach: snapshot-at-start
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          counts.addAndGet(b.count()); nBatches.incrementAndGet(); ()
        }
        .option("checkpointLocation", s"$root/chk")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // one full-snapshot batch despite vacuumed v1/v2, the upsert, and
    // the orphan number — the attach never walks history
    drain()
    assert(nBatches.get() === 1, s"fresh attach must be ONE snapshot batch, got ${nBatches.get()}")
    assert(counts.get() === expect.count())
    // and the tail keeps working: an orphan number between commits is
    // skipped (the committed-marker walk), the next commit arrives alone
    S.stageUpsert(spark, table, // another orphan (claims a number, no flip)
      docs.filter(col("lang") === "es")
        .withColumn("text", concat(col("text"), lit(" orphan2"))),
      "doc_id", "lang", "text")
    val late = docs.filter(col("lang") === "en")
      .withColumn("doc_id", col("doc_id") + lit(9000000L))
    S.commit(spark, table, S.stageAppend(spark, table, late, "lang", "text"))
    counts.set(0); nBatches.set(0)
    drain()
    assert(nBatches.get() === 1 && counts.get() === late.count(),
      s"tail must emit exactly the new commit: ${nBatches.get()} batches, ${counts.get()} rows")
  }

  test("graft-snapshot-sink: format-registered transactional landing — publish, append, replay no-op") {
    val root = java.nio.file.Files.createTempDirectory("graft_sinkfmt").toString
    val table = s"$root/landing"
    val S = graft.sources.Snapshot
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    def run(): Unit = {
      val q = mem.toDF().toDF("id", "part", "text").writeStream
        .format("graft-snapshot-sink")
        .option("path", table)
        .option("partition", "part").option("checksum", "text")
        .option("checkpointLocation", s"$root/chk")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // epoch 0 PUBLISHES the table (v1 defines the schema)
    mem.addData((1L, "a", "x"), (2L, "b", "y"))
    run()
    assert(S.currentVersion(spark, table) === 1)
    assert(S.currentTag(spark, table) === Some("batch-0"))
    assert(S.read(spark, table).count() === 2)
    // epoch 1 APPENDS; the snapshot lifecycle (time travel) holds
    mem.addData((3L, "a", "z"))
    run()
    assert(S.currentVersion(spark, table) === 2)
    assert(S.read(spark, table).count() === 3)
    assert(S.readVersion(spark, table, 1).count() === 2)
    // a re-run with nothing new lands nothing (tags make replay a no-op)
    run()
    assert(S.currentVersion(spark, table) === 2)
    // update/complete output modes refuse at start
    val agg = mem.toDF().toDF("id", "part", "text")
      .groupBy("part").count()
    val e = intercept[Exception] {
      agg.writeStream.format("graft-snapshot-sink")
        .outputMode("complete")
        .option("path", s"$root/other")
        .option("partition", "part").option("checksum", "count")
        .option("checkpointLocation", s"$root/chk2")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    }
    assert(e.getMessage.contains("Append only") ||
      e.getMessage.contains("foreachBatch"), e.getMessage)
  }

  test("evolveSchema: a restart crosses addColumn with the fill; incompatible evolution refuses") {
    val root = java.nio.file.Files.createTempDirectory("graft_vstream_evo").toString
    val table = s"$root/table"
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val S = graft.sources.Snapshot
    def third(k: Int) = docs.filter(pmod(col("doc_id"), lit(3)) === k)
    S.publish(spark, table, third(0), "lang", "text") // v1
    val batches =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Array[String], Long, Long)]()
    def drain(): Unit = {
      val q = spark.readStream.format("graft-snapshot-stream")
        .option("path", table).option("evolveSchema", "true").load()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          val df = b.toDF()
          val filled = if (df.columns.contains("quality"))
            df.filter(col("quality") === 0.5).count() else -1L
          batches.add((id, df.columns, df.count(), filled)); ()
        }
        .option("checkpointLocation", s"$root/chk")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // run 1: pre-add generation — one snapshot batch, no quality column
    drain()
    val run1 = batches.toArray(Array.empty[(Long, Array[String], Long, Long)])
    assert(run1.length === 1 && !run1(0)._2.contains("quality"))
    assert(run1(0)._3 === third(0).count())
    // the table evolves while the stream is down: addColumn + an append
    // that carries the column physically
    S.addColumn(spark, table, "quality", "DOUBLE", "0.5") // v2
    S.commit(spark, table, S.stageAppend(spark, table,
      third(1).withColumn("quality", lit(0.9)), "lang", "text")) // v3
    // run 2 against the SAME checkpoint: the restart re-pins through the
    // tracked generation — the addColumn step is an EMPTY batch, the
    // append arrives physical, both under the NEW schema
    batches.clear()
    drain()
    val run2 = batches.toArray(Array.empty[(Long, Array[String], Long, Long)]).sortBy(_._1)
    assert(run2.length === 2, s"addColumn step + append step, got ${run2.length}")
    assert(run2.forall(_._2.contains("quality")),
      "every post-restart batch serves the evolved schema")
    assert(run2(0)._3 === 0L, "the addColumn commit itself appends nothing")
    assert(run2(1)._3 === third(1).count() && run2(1)._4 === 0L,
      "post-add files arrive physical (no fill)")
    // FULL-HISTORY replay from a fresh checkpoint: the v1 batch now
    // fills the default for every pre-add row — Delta's
    // restart-with-new-schema contract
    val q2 = spark.readStream.format("graft-snapshot-stream")
      .option("path", table).option("evolveSchema", "true")
      .option("startingVersion", "0").load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (id == 0) {
          val df = b.toDF()
          assert(df.count() === third(0).count())
          assert(df.filter(col("quality") === 0.5).count() === df.count(),
            "pre-add files must fill the recorded default")
        }
        ()
      }
      .option("checkpointLocation", s"$root/chk2")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    // MID-RUN evolution refuses loudly (a running query's schema is
    // fixed): a source pinned BEFORE a second addColumn must refuse the
    // step that crosses it, naming the restart remedy
    val pinned = S.read(spark, table).schema
    val pinnedAt = S.currentVersion(spark, table)
    val src = new graft.streaming.SnapshotVersionSource(
      spark, table, pinned, maxVersions = 10, startingVersion = Some(0),
      changes = false, evolve = true)
    S.addColumn(spark, table, "quality2", "DOUBLE", "0.1") // v4
    S.commit(spark, table, S.stageAppend(spark, table,
      third(2).withColumn("quality", lit(0.9)).withColumn("quality2", lit(0.2)),
      "lang", "text")) // v5
    val cur = S.currentVersion(spark, table)
    assert(pinnedAt < cur)
    val ex = intercept[IllegalStateException] {
      src.getBatch(None,
        org.apache.spark.sql.execution.streaming.SerializedOffset(cur.toString))
    }
    assert(ex.getMessage.contains("quality2") && ex.getMessage.contains("restart"),
      ex.getMessage)
    // DIVERGENCE refuses at stream start: a checkpoint whose tracked
    // generation is not a prefix of the table's (here: reused on a table
    // with NO added columns) names the wrong-table diagnosis
    val freshTable = s"$root/other"
    S.publish(spark, freshTable, third(0), "lang", "text")
    val div = intercept[IllegalArgumentException] {
      graft.streaming.SnapshotVersionSource.trackSchemaGeneration(
        spark, freshTable, s"$root/chk/sources/0")
    }
    assert(div.getMessage.contains("not a prefix") ||
      div.getMessage.contains("NOT a prefix"), div.getMessage)
  }
}
