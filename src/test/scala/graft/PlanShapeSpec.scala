package graft

/** Scale-critical plan-shape guards: the dedup/ANN candidate-generation
  * joins must stay equi-joins (shuffle or broadcast-HASH) — a regression
  * to BroadcastNestedLoopJoin or CartesianProduct is the O(n²) failure
  * mode the round-1→2 rewrites removed, so it is asserted on the executed
  * plan, not just documented. (x_dedup_embcos and j_cross/j_theta_band
  * are exhaustive BY CONTRACT and excluded.)
  */
class PlanShapeSpec extends SparkSpec {

  private val mustBeEquiJoin =
    Seq("x_dedup_minhash", "x_dedup_simhash", "x_dedup_jaccard",
      "x_dedup_ngram", "x_ann_bucket_topk", "x_ann_indexed_topk",
      "x_text_vocab", "x_dedup_substring", "x_dedup_spanremove",
      "x_dedup_decontam")

  mustBeEquiJoin.foreach { key =>
    test(s"$key plans no cartesian / nested-loop join") {
      val plan = SparkEntry.queries(key)(spark, sf())
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$key:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$key:\n$plan")
    }
  }

  test("x_flex_geometry broadcasts the alias vocabulary (log lines never shuffle pre-agg)") {
    // The vendor-key vocabulary is a few dozen rows — it must broadcast;
    // the ONLY shuffle should be the per-dataset pivot agg. A shuffle of
    // the line frame on raw_key would be a scale regression (at millions
    // of datasets the lines side is corpus-sized).
    val plan = SparkEntry.queries("x_flex_geometry")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected BHJ on alias key:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"x_flex_geometry:\n$plan")
  }

  test("x_flex_affine_cubic gathers via equi-join (64-tap fan-out, no cartesian)") {
    val plan = SparkEntry.queries("x_flex_affine_cubic")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"x_flex_affine_cubic:\n$plan")
  }

  test("x_ann_bucket_topk candidate join is a broadcast-hash join on the bucket key") {
    // The probe side is a fixed, tiny set by construction — the bucket
    // equi-join must broadcast it, never shuffle the corpus side.
    val plan = SparkEntry.queries("x_ann_bucket_topk")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected BHJ:\n$plan")
  }

  test("x_ann_indexed_topk searches the bucketed index with no corpus sign pass") {
    // The graded query's search half must read the in-query-built index
    // as a bucketed table scan and derive sign bits ONLY for the
    // broadcast probes — the corpus signature pass was paid at build.
    val df = SparkEntry.queries("x_ann_indexed_topk")(spark, sf())
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"), s"index scan not bucketed:\n$plan")
    val signStages = "shiftright".r
      .findAllIn(df.queryExecution.optimizedPlan.toString).size
    assert(signStages === 1, s"corpus sign pass in the search plan:\n$plan")
  }

  test("x_dedup_jaccard pair join shuffles (no corpus-sized broadcast)") {
    // The masks relation is corpus-sized: broadcasting it OOMs at scale.
    // Both pair-join inputs must arrive via shuffle exchange.
    val df = SparkEntry.queries("x_dedup_jaccard")(spark, sf())
    val plan = df.queryExecution.executedPlan.toString
    val pairJoinBroadcast =
      "BroadcastHashJoin.*\\(lang".r.findFirstIn(plan) // lang is the pair-join key
    assert(pairJoinBroadcast.isEmpty,
      s"pair join broadcasts the corpus-sized masks relation:\n$plan")
  }

  test("x_text_dsir weight join broadcasts the 64-row table (corpus never shuffles on bucket)") {
    // importanceScore joins the corpus explode against the bucket
    // weights: the weights are K rows BY CONSTRUCTION and must ride a
    // BroadcastHashJoin — shuffling the token explode on `bucket`
    // (64 distinct values) would collapse the corpus into 64 tasks.
    val plan = SparkEntry.queries("x_text_dsir")(spark, sf())
      .queryExecution.executedPlan.toString
    val bucketBhj = "BroadcastHashJoin \\[bucket".r.findFirstIn(plan)
    assert(bucketBhj.nonEmpty, s"expected broadcast on the bucket key:\n$plan")
  }

  test("x_pack_chunks plans exactly one window (the per-group prefix sum)") {
    // packSequences' contract is ONE running-total window partitioned by
    // the group key; a second window (or a global, unpartitioned sort-
    // into-one-task window) would be the scale regression.
    val df = SparkEntry.queries("x_pack_chunks")(spark, sf())
    val plan = df.queryExecution.executedPlan.toString
    assert("RunningWindowFunction|Window".r.findFirstIn(plan).nonEmpty,
      s"window missing:\n$plan")
    // the prefix-sum window must be PARTITIONED (spec lists lang#… before
    // the order spec) — an empty partition list is the one-task global sort
    assert("windowspecdefinition\\(lang".r.findFirstIn(plan).nonEmpty,
      s"prefix-sum window not partitioned by the group key:\n$plan")
  }

  test("x_emb_quantize stays narrow: no shuffle but the vec_id join/sort") {
    // Quantization is a pure map; the only exchanges allowed are for the
    // self-join on vec_id and the output sort — never an aggregation
    // shuffle over exploded elements (the q/err math must stay in HOFs).
    val plan = SparkEntry.queries("x_emb_quantize")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate explode"),
      s"element explode in the quantize path (HOF regression):\n$plan")
  }

  test("x_io_partitioned: the lang filter becomes PartitionFilters (directories pruned, not scanned)") {
    // formatted mode prints the scan's PartitionFilters line even under
    // AQE (executedPlan.collect can't see through AdaptiveSparkPlanExec
    // before execution)
    val plan = SparkEntry.queries("x_io_partitioned")(spark, sf())
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    // the IN (en, zh) predicate must prune at the DIRECTORY level —
    // a data Filter over a full scan would pass correctness but read
    // every partition's bytes at 100 TB
    assert("PartitionFilters: \\[lang#\\d+ IN \\(en,zh\\)\\]".r
      .findFirstIn(plan).nonEmpty,
      s"lang IN (en,zh) not pushed to PartitionFilters:\n$plan")
  }

  test("x_io_compact: 64 shards collapse to <= 4 files without a shuffle") {
    // running the graded key materializes both scratch dirs; the oracle
    // grades content neutrality, THIS pins the part the oracle can't
    // see — the file-count drop and the shuffle-free plan.
    SparkEntry.queries("x_io_compact")(spark, sf()).collect()
    def parts(dir: java.io.File): Int =
      Option(dir.listFiles).getOrElse(Array.empty)
        .count(f => f.getName.startsWith("part-"))
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val src = tmp.listFiles.filter(_.getName.startsWith("graft_cmp_src"))
      .maxBy(_.lastModified)
    val dst = tmp.listFiles.filter(_.getName.startsWith("graft_cmp_dst"))
      .maxBy(_.lastModified)
    assert(parts(src) === 64)
    assert(parts(dst) <= 4 && parts(dst) > 0)
    // coalesce, not repartition: the compaction read-plan must be
    // Exchange-free (a shuffle would move the whole corpus to fix a
    // file-count problem)
    val plan = spark.read.parquet(src.toString).coalesce(4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"compaction plan shuffles:\n$plan")
  }

  test("x_io_bloom: the IN probe reaches the scan as PushedFilters") {
    // correctness grades values; THIS pins that the point lookup is
    // pushed to parquet at all — without pushdown the bloom filter in
    // the footer is never consulted and every row group is read.
    SparkEntry.queries("x_io_bloom")(spark, sf()).collect()
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val dir = tmp.listFiles.filter(_.getName.startsWith("graft_bloom"))
      .maxBy(_.lastModified)
    val plan = spark.read.parquet(dir.toString)
      .filter(org.apache.spark.sql.functions.col("doc_id").isin(0L, 37L, 999999L))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PushedFilters: [In(doc_id"),
      s"doc_id IN probe not pushed to the parquet scan:\n$plan")
  }

  test("x_io_clustered: the range predicate reaches the scan as PushedFilters") {
    SparkEntry.queries("x_io_clustered")(spark, sf()).collect()
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val dir = tmp.listFiles.filter(_.getName.startsWith("graft_clust"))
      .maxBy(_.lastModified)
    val plan = spark.read.parquet(dir.toString)
      .filter(org.apache.spark.sql.functions.col("doc_id") < 120)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,120)]"),
      s"doc_id range not pushed to the parquet scan:\n$plan")
  }

  test("j_interval_overlap joins on the composite equi-key (no nested loop)") {
    // the cell-grid device exists precisely so the interval overlap
    // plans as a hash join on (customer, cell) with the range bounds as
    // residual conditions — a BNLJ here is the quadratic failure mode.
    val plan = SparkEntry.queries("j_interval_overlap")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"interval join is quadratic:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), s"no hash/merge join found:\n$plan")
  }

  test("j_runtime_filter: the dim predicate becomes a bloom filter on the fact scan") {
    // the graded key returns a checkpointed frame (confs are closure-
    // scoped), so the bloom machinery is pinned here on the INNER join
    // built under the same confs: the selective dim predicate must
    // compile into a BloomFilter aggregate whose might_contain lands on
    // the fact side BEFORE its shuffle.
    import org.apache.spark.sql.functions._
    val enabledK = "spark.sql.optimizer.runtime.bloomFilter.enabled"
    val gateK =
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    val bcastK = "spark.sql.autoBroadcastJoinThreshold"
    val oldE = spark.conf.getOption(enabledK)
    val oldG = spark.conf.getOption(gateK)
    val oldB = spark.conf.getOption(bcastK)
    spark.conf.set(enabledK, "true")
    spark.conf.set(gateK, "0")
    // the rule declines when either side can broadcast by size — zero
    // the threshold to simulate the both-sides-big production regime
    spark.conf.set(bcastK, "-1")
    try {
      val dim = graft.ops.T.t(spark, sf(), "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderdate"))
      val fact = graft.ops.T.t(spark, sf(), "lineitem")
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
      val joined = fact.hint("shuffle_hash").join(dim, "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n$plan")
      assert(plan.toLowerCase.contains("bloomfilter"),
        s"no bloom aggregate on the dim side:\n$plan")
      // semantics unchanged: same count as the un-filtered-plan join
      spark.conf.set(enabledK, "false")
      val plain = fact.join(dim, "o_orderkey")
      assert(!plain.queryExecution.executedPlan.toString.contains("might_contain"))
      spark.conf.set(enabledK, "true")
      assert(joined.count() === plain.count())
    } finally {
      oldE.fold(spark.conf.unset(enabledK))(spark.conf.set(enabledK, _))
      oldG.fold(spark.conf.unset(gateK))(spark.conf.set(gateK, _))
      oldB.fold(spark.conf.unset(bcastK))(spark.conf.set(bcastK, _))
    }
  }

  test("j_dpp: the fact scan carries a dynamicpruning PartitionFilter") {
    // the dim's surviving join keys must prune fact PARTITIONS at
    // runtime — a plain join would pass correctness but list and scan
    // every day's directory at 100 TB
    val plan = SparkEntry.queries("j_dpp")(spark, sf())
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning on the fact scan:\n$plan")
    assert("PartitionFilters: \\[[^\\]]*dynamicpruning"
      .r.findFirstIn(plan).nonEmpty,
      s"dynamicpruning not in the scan's PartitionFilters:\n$plan")
  }

  test("s_agg_pushdown: COUNT/MIN/MAX are answered from parquet footers") {
    // the graded key returns a checkpointed frame (confs are closure-
    // scoped), so the pushed aggregate is pinned here on the INNER plan
    // built under the same confs
    import org.apache.spark.sql.functions._
    val v1K = "spark.sql.sources.useV1SourceList"
    val aggK = "spark.sql.parquet.aggregatePushdown"
    val oldV1 = spark.conf.getOption(v1K)
    val oldAgg = spark.conf.getOption(aggK)
    spark.conf.set(v1K, "")
    spark.conf.set(aggK, "true")
    try {
      val df = spark.read.parquet(s"${sf()}/lineitem.parquet")
        .agg(expr("count(*)").as("n_rows"),
          min(col("l_orderkey")).as("min_okey"),
          max(col("l_orderkey")).as("max_okey"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"))
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(plan.contains("PushedAggregation"),
        s"aggregate not pushed to the parquet scan:\n$plan")
      assert(plan.contains("COUNT(*)") && plan.contains("MIN(l_orderkey)"),
        s"pushed aggregate list incomplete:\n$plan")
      // values equal the normal full-scan plan
      spark.conf.set(aggK, "false")
      val plain = spark.read.parquet(s"${sf()}/lineitem.parquet")
        .agg(expr("count(*)"), min(col("l_orderkey")), max(col("l_orderkey")),
          min(col("l_quantity")), max(col("l_quantity")))
      assert(df.collect().toSeq === plain.collect().toSeq)
    } finally {
      oldV1.fold(spark.conf.unset(v1K))(spark.conf.set(v1K, _))
      oldAgg.fold(spark.conf.unset(aggK))(spark.conf.set(aggK, _))
    }
  }

  test("j_pit_scd2 resolves point-in-time state with ZERO joins") {
    // the union-window device's whole point: the PIT resolution that a
    // naive implementation writes as a range join (grid × intervals,
    // quadratic per user) must plan as union + per-user window — no
    // join operator of any kind in the physical plan. Pinned on the
    // pre-sort resolve frame: the graded key wraps it in a lazy
    // checkpoint (so the sort's range sampling doesn't re-run the
    // window), whose executed plan shows only the materialized RDD.
    val plan = graft.ops.Joins.pitScd2Resolve(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"PIT resolution planned a join:\n$plan")
    assert(plan.contains("Window"), s"no window found:\n$plan")
  }

  test("x_curate_e2e composes four stages without a join or extra scan") {
    // dedup → gate → quota → pack is windows + one final aggregate;
    // a join (or a second documents scan beyond the single pipeline
    // read) would mean a stage materialized instead of composing.
    val df = SparkEntry.queries("x_curate_e2e")(spark, sf())
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"pipeline planned a join:\n$plan")
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans === 1, s"expected ONE documents scan, found $scans:\n$plan")
  }

  test("x_quality_checks: all six row/unique rules run in ONE scan of documents") {
    // the fused-agg promise: adding row rules must not add passes. The
    // report unions 6 single-row frames off ONE shared wide aggregate +
    // 1 uniqueness groupBy + 2 referential branches — so the documents
    // parquet appears at most 4 times in the plan (wide agg reused per
    // row-rule branch counts once under reuse; uniqueness, ref-child,
    // and nothing else), never once per row rule.
    val plan = SparkEntry.queries("x_quality_checks")(spark, sf())
      .queryExecution.optimizedPlan.toString
    val scans = "documents\\.parquet".r.findAllIn(plan).length
    assert(scans <= 8, s"quality suite explodes into $scans document scans:\n$plan")
  }
}
