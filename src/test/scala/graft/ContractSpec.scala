package graft

/** T1 blanket contract checks: every declared query runs on sf0.001,
  * the queries/oracleSql maps are mutually consistent, and the declared
  * inventory matches SURVEY.md §2b (291 keys, 283 oracle-checked).
  */
class ContractSpec extends SparkSpec {

  private val nonOracle =
    Set("a_approx_hll", "a_hll_merge", "a_kll_merge", "a_kll_window",
      "t_stream_runtime", "t_stream_dedup", "t_stream_session",
      "t_stream_join")

  test("inventory matches SURVEY §2b: 291 queries, 283 with oracle SQL") {
    assert(SparkEntry.queries.size === 291)
    assert(SparkEntry.oracleSql.size === 283)
    assert(SparkEntry.queries.keySet.intersect(nonOracle).size === 8)
  }

  test("every oracle key has a query; non-oracle keys are the declared eight") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet === nonOracle)
  }

  test("entry returns rows on sf0.001 (driver smoke gate)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // Each query must at least execute end-to-end on sf0.001 with a
  // non-empty schema, and must never emit a tz-adjusted TimestampType —
  // it round-trips through parquet as TIMESTAMPTZ and type-mismatches
  // the naive oracle timestamps (NTZ rule, SURVEY §7.5a correction 4).
  // j_anti legitimately returns 0 rows (every customer has orders).
  private val mayBeEmpty = Set("j_anti", "a_having", "x_dedup_jaccard")

  // Queries whose CONTRACT is a non-equi or exhaustive pair join — the
  // only ones allowed to plan a CartesianProduct/BroadcastNestedLoopJoin.
  // Everything else planning one is an O(n²) scale regression (the
  // round-1 dedup failure mode) and must fail here, not in a bench.
  private val mayNestedLoop = Set(
    "j_cross",          // crossJoin is the operator under test
    // j_theta_band was exempt through round 6, but its implementation
    // pre-buckets the band key and plans a BroadcastHashJoin (judge-
    // verified) — the exemption would mask a regression to BNLJ. Gone.
    // j_asof likewise: the as-of is a pure window now, no join at all.
    "j_theta_ineq",     // pure inequality condition
    "x_sim_dot",        // 1-row broadcast probe vector
    "x_sim_cosine_topk", "x_knn_label_vote", // broadcast probe set, != join
    "x_emb_prefix_topk", // same broadcast-probe != join, sliced dims
    "x_ann_recall",      // ground-truth side IS the broadcast-probe exhaustive scan
    // x_ann_bucket_topk is NOT exempt: PlanShapeSpec pins its bucket
    // equi-join to a BroadcastHashJoin, so a regression to BNLJ must
    // fail this blanket contract too (the two suites agree).
    "x_dedup_embcos",   // exhaustive BY CONTRACT (§2b; Ann is the scale path)
    "x_mix_balance", "x_flex_intensity_range", "x_flex_threshold_otsu",
    "x_text_tfidf",     // 1-row corpus-count crossJoin
    "x_text_pmi",       // 1-row bigram-total crossJoin
    "x_text_dsir",      // two 1-row corpus-total crossJoins (importanceWeights)
    "x_text_perplexity", // 1-row vocab-size crossJoin (perplexityScore)
    "x_mix_temperature", // 1-row Σn^α totals crossJoin (temperatureBalance)
    "x_sample_weighted", // 1-row w_max crossJoin (sampleProportional)
    "x_sample_stratified", // 1-row n_total crossJoin (stratifiedQuota)
    "x_quality_checks",  // 1-row × 1-row report crossJoin (refIntegrity)
    "a_hll_merge",       // 1-row × 1-row merged/global estimate crossJoin
    "x_io_sql_maint",    // 1-row HISTORY version-count crossJoin
    "x_io_retention_time", // 1-row dry-run count × version-count crossJoins
    "a_kll_merge",       // same 1-row × 1-row shape as a_hll_merge
    "a_kll_window",      // days×days sketch-row band join (span-bounded)
    "s_skew_profile",    // 1-row stats × 1-row hottest-key crossJoin
    "s_hist_numeric",    // 1-row min/max frame crossJoin (bin boundaries)
    "x_io_mor_delete",   // 1-row pre-materialize count crossJoin
    "x_io_mor_bulk",     // same 1-row pre-materialize count crossJoin
    "x_io_constraints",  // 1-row live-rule count crossJoin
    "x_io_clone",        // 1-row source-count crossJoin
    "x_text_bm25",       // 1-row corpus-scalars (N/avgdl/df) crossJoin
    "x_drift_psi",       // 1-row min/max frame crossJoin (bin boundaries)
    "x_emb_pca",         // 1-row norm/eig crossJoins per pinned round
    "x_drift_embed",     // 1-row stats × 1-row argmax-dim crossJoin
    "x_flex_affine", "u_udaf_centroid") // 1-row param/centroid broadcast

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"runs on sf0.001: $name") {
      val df = fn(spark, sf())
      assert(df.schema.nonEmpty)
      import org.apache.spark.sql.types._
      val ltz = df.schema.fields.collect {
        case f if f.dataType == TimestampType => f.name
      }
      assert(ltz.isEmpty,
        s"$name emits tz-adjusted timestamp columns ${ltz.mkString(",")} — use T.truncNtz / cast timestamp_ntz")
      // §7.3 R6 structural guard: the graded comparator hashes pandas
      // frames, where DECIMAL loads as object, ARRAY/MAP cells are
      // unhashable, and DATE loads as object vs the oracle's datetime64 —
      // all four must be canonicalized (decOut/numArrStr/mapStr/
      // timestamp_ntz) before emission, never emitted raw.
      val banned = df.schema.fields.collect {
        case f if f.dataType.isInstanceOf[DecimalType] => s"${f.name}:decimal"
        case f if f.dataType.isInstanceOf[ArrayType] => s"${f.name}:array"
        case f if f.dataType.isInstanceOf[MapType] => s"${f.name}:map"
        case f if f.dataType == DateType => s"${f.name}:date"
      }
      assert(banned.isEmpty,
        s"$name emits non-canonical columns ${banned.mkString(",")} — use T.decOut/numArrStr/mapStr or cast timestamp_ntz (§7.3 R6)")
      if (!mayNestedLoop(name)) {
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct") &&
          !plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a cartesian/nested-loop join — O(n²) at scale:\n$plan")
      }
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }
}
