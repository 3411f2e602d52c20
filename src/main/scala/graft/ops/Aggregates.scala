package graft.ops

import org.apache.spark.sql.functions._
import graft.ops.T._

/** Group A (aggregation) — SURVEY.md §2b.
  *
  * Reference analogs: flexcalc/analyze.py::histogram / intensity_range /
  * moments (R16-R18) are "aggregate bulk data to small state" — the same
  * shape as Spark partial+final hash aggregation, which pushes the partial
  * aggregate map-side so only group states cross the shuffle (the property
  * that makes these run at 100 TB).
  *
  * Determinism: decimal sums (R2), avg via exact-sum/count (Core.avgDec),
  * round(…,6) on float stats (R3), grouping flags cast to INT on both
  * engines so schemas agree.
  */
object Aggregates {

  val queries: Map[String, Q] = Map(
    // TPC-H Q1 analog — the M0 walking-skeleton query.
    "a_group_sum_q1" -> ((s, d) => {
      val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      val charge = disc * (lit(1.0) + col("l_tax"))
      t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          decOut(sum(dec(col("l_quantity")))).as("sum_qty"),
          decOut(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
          decOut(sum(dec(disc))).as("sum_disc_price"),
          decOut(sum(dec(charge))).as("sum_charge"),
          avgOut(sum(dec(col("l_quantity"))), count(lit(1))).as("avg_qty"),
          avgOut(sum(dec(col("l_extendedprice"))), count(lit(1))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Incremental AGGREGATE-view maintenance — the agg twin of
    // j_ivm_delta's join view (and the in-memory form of
    // t_rollup_incremental's partition rewrite): a materialized
    // per-(status, month) revenue rollup built over the base split
    // (orderkey % 10 ≠ 0), refreshed by MERGING the delta's partial
    // aggregates — count/sum add, min/max combine, avg derives at read.
    // The grade: merged(base ⊎ Δ) must hash-equal the oracle's FULL
    // recompute over base ∪ Δ — the algebraic-mergeability property
    // every incremental pipeline rests on. Cost shape at 100 TB: the
    // refresh aggregates the DELTA only and merges |view|-sized frames —
    // the store is never rescanned (decimal sums make merge exact, so
    // merged ≡ recomputed bit-for-bit, not approximately).
    "a_ivm_agg" -> ((s, d) => {
      def aggOf(df: org.apache.spark.sql.DataFrame) = df
        .groupBy(col("o_orderstatus").as("status"),
          truncNtz("month", col("o_orderdate")).as("mon"))
        .agg(count(lit(1)).as("n"), sum(dec(col("o_totalprice"))).as("rev"),
          min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
      val orders = t(s, d, "orders")
      val base = aggOf(orders.filter(pmod(col("o_orderkey"), lit(10)) =!= 0))
      val delta = aggOf(orders.filter(pmod(col("o_orderkey"), lit(10)) === 0))
      base.unionByName(delta)
        .groupBy("status", "mon")
        .agg(sum(col("n")).as("n_orders"),
          decOut(sum(col("rev"))).as("revenue"),
          min(col("lo")).as("min_price"), max(col("hi")).as("max_price"),
          avgOut(sum(col("rev")), sum(col("n"))).as("avg_price"))
        .orderBy("status", "mon")
    }),

    "a_count_distinct" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(countDistinct(col("c_custkey")).as("n_cust"),
          countDistinct(col("o_orderkey")).as("n_orders"))
        .orderBy("c_mktsegment")),

    "a_multi_distinct" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))
        .orderBy("l_returnflag")),

    "a_rollup" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
        .join(t(s, d, "region"), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("cust_cnt"),
          grouping(col("r_name")).cast("int").as("g_r"),
          grouping(col("n_name")).cast("int").as("g_n"))
        .select("r_name", "n_name", "cust_cnt", "g_r", "g_n")
        .orderBy(col("g_r"), col("g_n"),
          col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)),

    "a_cube" -> ((s, d) =>
      t(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(decOut(sum(dec(col("l_quantity")))).as("sum_qty"),
          count(lit(1)).as("cnt"),
          grouping(col("l_returnflag")).cast("int").as("g_f"),
          grouping(col("l_linestatus")).cast("int").as("g_s"))
        .select("l_returnflag", "l_linestatus", "sum_qty", "cnt", "g_f", "g_s")
        .orderBy(col("g_f"), col("g_s"),
          col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    "a_gsets" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
        .groupingSets(
          Seq(Seq(col("c_mktsegment")), Seq(col("n_name")), Seq()),
          col("c_mktsegment"), col("n_name"))
        .agg(count(lit(1)).as("cust_cnt"),
          grouping(col("c_mktsegment")).cast("int").as("g_seg"),
          grouping(col("n_name")).cast("int").as("g_nat"))
        .select("c_mktsegment", "n_name", "cust_cnt", "g_seg", "g_nat")
        .orderBy(col("g_seg"), col("g_nat"),
          col("c_mktsegment").asc_nulls_first, col("n_name").asc_nulls_first)),

    "a_having" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("cust_cnt"))
        .filter(col("cust_cnt") > 55)
        .orderBy("n_name")),

    // Moment statistics + one exact median per group. The median is the
    // holistic term: at 100 TB route it through ops/Percentiles.grouped
    // (exact at or under a group-size threshold, KLL sketch above —
    // PropertySpec pins both sides); the exact spelling here is the
    // graded nightly-exact form.
    "a_stats" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(var_samp(col("l_quantity")), 6).as("var_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 6).as("cov_qp"),
          round(expr("percentile(l_quantity, 0.5D)"), 6).as("median_qty"))
        .orderBy("l_returnflag")),

    // max_by/min_by over a UNIQUE ordering value: fixed-width zero-padded
    // (price, orderkey) string, so lexicographic order == numeric order and
    // price ties at the group extreme break deterministically on orderkey.
    // (Neither engine's arg-extreme accepts a struct ordering value;
    // a raw-double ordering would pick an arbitrary key on a tie.)
    "a_minmax_by" -> ((s, d) => {
      val ordVal = concat(
        lpad(col("o_totalprice").cast("decimal(18,2)").cast("string"), 12, "0"),
        lit("#"), lpad(col("o_orderkey").cast("string"), 10, "0"))
      t(s, d, "orders")
        .groupBy("o_orderstatus")
        .agg(decOut(max(col("o_totalprice"))).as("max_price"),
          max_by(col("o_orderkey"), ordVal).as("best_key"),
          min_by(col("o_orderkey"), ordVal).as("worst_key"))
        .orderBy("o_orderstatus")
    }),

    // Deterministic collect: sorted array (R5 of §7.3 — never raw
    // collect_list), emitted as a canonical joined string (§7.3 R6: the
    // comparator can't hash array cells).
    "a_collect_sorted" -> ((s, d) =>
      t(s, d, "nation")
        .groupBy("n_regionkey")
        .agg(strArrStr(sort_array(collect_list(col("n_name")))).as("names"))
        .orderBy("n_regionkey")),

    // Sketches: HLL++ / KLL — algorithms differ from DuckDB's, so no oracle;
    // covered by the T3 property suite (within rsd of exact).
    "a_approx_hll" -> ((s, d) =>
      t(s, d, "events")
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id")).as("approx_users"),
          round(expr("approx_percentile(value, 0.5D)"), 6).as("approx_median"))
        .orderBy("event_type")),

    // MERGEABLE HLL sketch lifecycle (DataSketches via hll_sketch_agg /
    // hll_union_agg, Spark 3.5+) — the production shape for incremental
    // distinct counts: build one sketch PER DAY (the nightly job), then
    // UNION the stored daily sketches for any window's estimate without
    // touching raw events again. Graded self-parity (no SQL oracle —
    // DuckDB has no binary-compatible HLL): the union of daily sketches
    // must estimate EXACTLY what one global sketch estimates (HLL union
    // at equal lgK is lossless — PropertySpec pins merged == global ==
    // within 5% of the true count). Sketch updates are order-insensitive
    // ⇒ deterministic across partitionings and reruns.
    "a_hll_merge" -> ((s, d) => {
      val ev = evMs(s, d)
        .withColumn("day", truncNtz("day", col("ts_ms")))
      val daily = ev.groupBy("day")
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      val merged = daily.agg(
        count(lit(1)).as("n_days"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_merged"))
      val global = ev.agg(
        hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est_global"),
        countDistinct(col("user_id")).as("exact_users"))
      merged.crossJoin(global)
        .select(col("n_days"), col("est_merged"), col("est_global"),
          col("exact_users"))
    }),

    // MERGEABLE KLL quantile-sketch lifecycle (functions/Kll, DataSketches
    // KllDoublesSketch via TypedImperativeAggregate) — the percentile twin
    // of a_hll_merge, closing the incremental-lifecycle pair: exact
    // percentiles are HOLISTIC (a rolling window at 100 TB cannot re-sort
    // history nightly), so build one compact sketch per day, store the
    // bytes, and answer any window by MERGING the stored sketches — raw
    // events never re-read, and the KLL merge theorem keeps the rank-error
    // bound of the inputs. Graded self-parity (no SQL oracle — DuckDB has
    // no KLL; KLL compaction is randomized by design): PropertySpec pins
    // merged-vs-global-vs-exact inside the 2ε rank envelope, the
    // run-independent contract. Output: merged(day sketches) and global
    // (one sketch) p50/p90 estimates beside the EXACT percentiles.
    "a_kll_merge" -> ((s, d) => {
      graft.functions.Kll.register(s)
      val ev = evMs(s, d)
        .withColumn("day", truncNtz("day", col("ts_ms")))
      val daily = ev.groupBy("day")
        .agg(expr("graft_kll_agg(value, 200)").as("sk"))
      val merged = daily.agg(
        count(lit(1)).as("n_days"),
        expr("graft_kll_quantile(graft_kll_merge(sk, 200), 0.5D)").as("p50_merged"),
        expr("graft_kll_quantile(graft_kll_merge(sk, 200), 0.9D)").as("p90_merged"))
      val global = ev.agg(
        expr("graft_kll_quantile(graft_kll_agg(value, 200), 0.5D)").as("p50_global"),
        expr("graft_kll_quantile(graft_kll_agg(value, 200), 0.9D)").as("p90_global"),
        expr("percentile(value, 0.5D)").as("exact_p50"),
        expr("percentile(value, 0.9D)").as("exact_p90"))
      merged.crossJoin(global)
        .select(col("n_days"), col("p50_merged"), col("p90_merged"),
          col("p50_global"), col("p90_global"),
          col("exact_p50"), col("exact_p90"))
    }),

    // ROLLING-WINDOW percentiles from STORED sketches — the consumption
    // pattern a_kll_merge's lifecycle exists for (VERDICT r10 item 3's
    // "window estimate"): one compact KLL sketch per day is built ONCE,
    // then every trailing 7-day window is answered by MERGING the ≤ 7
    // relevant sketch rows — a days×7 band self-join over a #days-sized
    // frame, so at 100 TB the rolling-percentile dashboard costs
    // span×7 sketch merges and ZERO re-reads of raw events (the exact
    // alternative re-sorts every window's full event history nightly).
    // The band join is days×days-bounded (time span, data-independent),
    // which is why its nested-loop plan is exempt in ContractSpec.
    // Self-parity graded (KLL compaction is randomized by design);
    // PropertySpec pins every window's merged estimate inside the 2ε
    // rank envelope of the EXACT window percentile — the
    // run-independent contract.
    "a_kll_window" -> ((s, d) => {
      graft.functions.Kll.register(s)
      val daily = evMs(s, d)
        .withColumn("day", truncNtz("day", col("ts_ms")))
        .groupBy("day")
        .agg(expr("graft_kll_agg(value, 200)").as("sk"), count(lit(1)).as("n"))
      val win = daily.select(col("day").as("w_day"))
      win.join(daily,
          col("day") <= col("w_day") &&
            col("day") >= col("w_day") - expr("INTERVAL 6 DAYS"))
        .groupBy("w_day")
        .agg(count(lit(1)).as("n_days"),
          sum(col("n")).as("n_events"),
          expr("graft_kll_quantile(graft_kll_merge(sk, 200), 0.5D)").as("p50_7d"),
          expr("graft_kll_quantile(graft_kll_merge(sk, 200), 0.9D)").as("p90_7d"))
        .select(col("w_day").as("day"), col("n_days"), col("n_events"),
          col("p50_7d"), col("p90_7d"))
        .orderBy("day")
    }),

    // THETA sketch set operations (functions/Theta, DataSketches theta
    // via TypedImperativeAggregate) — the third member of the sketch
    // suite: a theta sketch is a uniform hash sample of a distinct set,
    // so stored sketches answer INTERSECTION and DIFFERENCE questions
    // (audience overlap, cohort churn) that HLL state fundamentally
    // cannot. Sets here: distinct floor(value) buckets of view vs
    // purchase events — partial overlap at every SF. ORACLE-graded
    // exactly (not self-parity): distinct cardinalities ≤ ~330 « k=4096,
    // so the sketches stay in EXACT mode (theta = 1, estimate = true
    // count) while exercising the full pipeline — per-set build, byte
    // serialization, union/intersection/AnotB operators; PropertySpec
    // separately pins the estimation-mode envelope at tiny k.
    "a_theta_ops" -> ((s, d) => {
      graft.functions.Theta.register(s)
      evMs(s, d)
        .withColumn("bucket", floor(col("value")).cast("long"))
        .agg(
          expr("graft_theta_agg(CASE WHEN event_type = 'view' THEN bucket END, 4096)").as("a"),
          expr("graft_theta_agg(CASE WHEN event_type = 'purchase' THEN bucket END, 4096)").as("b"))
        .select(
          expr("CAST(graft_theta_estimate(a) AS BIGINT)").as("n_view"),
          expr("CAST(graft_theta_estimate(b) AS BIGINT)").as("n_purchase"),
          expr("CAST(graft_theta_estimate(graft_theta_intersect(a, b)) AS BIGINT)").as("n_both"),
          expr("CAST(graft_theta_estimate(graft_theta_anotb(a, b)) AS BIGINT)").as("n_view_only"))
    }),

    // Per-group Shannon ENTROPY — the diversity score data curation
    // reads before mixing (a lang whose docs concentrate in one source
    // is a scrape artifact; a flat source distribution is healthy): two
    // cascaded aggs — (lang, source) counts, then per-lang
    // H = -Σ p·ln(p) over the #sources-sized inner frame — plus the
    // normalized H/ln(n_sources) ∈ [0,1] that makes groups of different
    // fan-out comparable. ln/round(…,6) follow the tf-idf precedent.
    "a_entropy" -> ((s, d) => {
      val bySource = t(s, d, "documents")
        .groupBy("lang", "source").agg(count(lit(1)).as(("cnt")))
      val byLang = bySource.groupBy("lang")
        .agg(sum(col("cnt")).as("n_docs"),
          count(lit(1)).as("n_sources"))
      bySource.join(byLang, "lang")
        .withColumn("p", col("cnt").cast("double") / col("n_docs"))
        .groupBy(col("lang"), col("n_docs"), col("n_sources"))
        .agg(sum(expr("-p * ln(p)")).as("h"))
        .select(col("lang"), col("n_docs"), col("n_sources"),
          round(col("h"), 6).as("entropy"),
          // a single-source group is 0/0 (H = 0, ln(1) = 0): define the
          // degenerate case as 0 rather than emit engine-specific NaN
          when(col("n_sources") === 1, lit(0.0))
            .otherwise(round(col("h") / log(col("n_sources").cast("double")), 6))
            .as("norm_entropy"))
        .orderBy("lang")
    }),

    // MERGEABLE FREQUENT-ITEMS (heavy-hitter) sketch lifecycle
    // (functions/Freq, DataSketches LongsSketch — Misra–Gries family):
    // the fourth sketch verb beside HLL/KLL/theta, answering "which keys
    // dominate and how often" (hot users, hot domains, hot dedup keys)
    // from stored per-day sketch rows merged over any window — raw
    // events never re-read. ORACLE-graded exactly, not self-parity: the
    // sketch is deterministic (count-based purges, no randomization),
    // and with distinct user_ids « maxMapSize=4096 no purge ever fires,
    // so getMaximumError()==0 and every estimate IS the exact count —
    // the emitted max_err column grades that exactness claim itself,
    // while FreqSpec pins the estimation-mode envelope at a tiny map.
    // Top-10 via orderBy+limit (TakeOrderedAndProject) with a total
    // (est desc, user_id) tiebreak.
    "a_freq_topk" -> ((s, d) => {
      graft.functions.Freq.register(s)
      val daily = evMs(s, d)
        .withColumn("day", truncNtz("day", col("ts_ms")))
        .groupBy("day")
        .agg(expr("graft_freq_agg(user_id, 4096)").as("sk"))
      daily.agg(expr("graft_freq_merge(sk, 4096)").as("sk"))
        .select(expr("graft_freq_maxerr(sk)").as("max_err"),
          explode(expr("graft_freq_items(sk)")).as("r"))
        .select(col("r.item").as("user_id"), col("r.est").as("est_cnt"),
          col("max_err"))
        .orderBy(col("est_cnt").desc, col("user_id").asc)
        .limit(10)
    }),

    // 2-D HISTOGRAM (price bin × order month) — the heatmap binning
    // behind drift dashboards and joint-distribution profiling, which
    // the 1-D s_hist_numeric can't see (a marginal histogram hides a
    // seasonal price shift; the joint one shows it). Bin keys are
    // row-local arithmetic on literals (floor(x/width), month()), so
    // the whole op is ONE groupBy whose shuffle carries #bins rows
    // after map-side partial aggregation — at 100 TB the scan
    // dominates and the heatmap is KB-sized. Exact boundaries: prices
    // on an exact multiple of the width divide exactly in IEEE (both
    // operands exact), so bin edges are engine-identical.
    "a_hist2d" -> ((s, d) =>
      t(s, d, "orders")
        .select(floor(col("o_totalprice") / 25000).cast("bigint")
            .as("price_bin"),
          month(col("o_orderdate")).cast("bigint").as("order_month"))
        .groupBy("price_bin", "order_month")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("price_bin", "order_month")),

    // PIVOT: order counts spread across status columns per priority.
    // Values are pinned (F/O/P) so both engines emit the same columns;
    // pivot cells with no group are 0, not null.
    "a_pivot" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .count()
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("F"),
          coalesce(col("O"), lit(0L)).as("O"),
          coalesce(col("P"), lit(0L)).as("P"))
        .orderBy("o_orderpriority")),

    // UNPIVOT (melt): wide per-returnflag decimal sums back to long form.
    // The unpivoted variable column carries the measure name.
    "a_unpivot" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(decOut(sum(dec(col("l_quantity")))).as("qty"),
          decOut(sum(dec(col("l_discount")))).as("disc"),
          decOut(sum(dec(col("l_tax")))).as("tax"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("qty"), col("disc"), col("tax")), "measure", "val")
        .orderBy("l_returnflag", "measure")),

    // Two-phase SALTED aggregation — the hot-key lever when the group
    // cardinality is tiny (3 returnflags here: a plain groupBy funnels
    // the whole table through 3 reduce tasks, so 997 of 1000 cluster
    // cores idle through the final agg at 100 TB). Phase 1 groups by
    // (key, salt = l_orderkey mod 16) → 48 evenly-sized partials across
    // the cluster; phase 2 recombines the 48-row frame. DECIMAL sums
    // are associative-exact, so the salted recombination is bit-equal
    // to the direct plan — the oracle IS the plain one-phase groupBy.
    "a_skew_twophase" -> ((s, d) => {
      val part = t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), pmod(col("l_orderkey"), lit(16)).as("salt"))
        .agg(sum(dec(col("l_quantity"))).as("p_qty"),
          sum(dec(col("l_extendedprice"))).as("p_price"),
          count(lit(1)).as("p_cnt"))
      part.groupBy("l_returnflag")
        .agg(decOut(sum(col("p_qty"))).as("sum_qty"),
          decOut(sum(col("p_price"))).as("sum_price"),
          sum(col("p_cnt")).as("n_rows"))
        .orderBy("l_returnflag")
    }),

    // Per-group OLS REGRESSION (closed form): slope/intercept/R² of
    // extendedprice on quantity — the trend-estimation staple next to
    // a_stats' corr/covar; both engines compute the same
    // sums-of-products closed form over identical parquet doubles, so
    // round-6 re-syncs summation-order noise (the corr precedent). One
    // groupBy, map-side partials — scale-free.
    "a_regression" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(regr_slope(col("l_extendedprice"), col("l_quantity")), 6)
          .as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 6)
            .as("intercept"),
          round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6)
            .as("r2"),
          regr_count(col("l_extendedprice"), col("l_quantity")).as("n"))
        .orderBy("l_returnflag")),

    // IQR OUTLIER detection per group — the data-validation twin of
    // a_stats (Tukey fences: outside [q1 − 1.5·IQR, q3 + 1.5·IQR]): the
    // aggregate-decide-reapply pattern (SURVEY §1.1 — flexcalc's
    // analyze-then-apply shape): one stats pass computes the per-group
    // fences, the |groups|-row fence frame broadcasts back, one counting
    // pass flags. Fences round to the 6-dp grid on BOTH engines before
    // comparison so quantile-interpolation ulp noise can't flip a count.
    "a_outliers" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val fences = li.groupBy("l_returnflag")
        .agg(expr("percentile(l_extendedprice, 0.25D)").as("q1"),
          expr("percentile(l_extendedprice, 0.75D)").as("q3"))
        .select(col("l_returnflag"),
          round(col("q1") - lit(1.5) * (col("q3") - col("q1")), 6).as("lo"),
          round(col("q3") + lit(1.5) * (col("q3") - col("q1")), 6).as("hi"))
      li.join(broadcast(fences), Seq("l_returnflag"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("l_extendedprice") < col("lo") ||
            col("l_extendedprice") > col("hi"), 1L).otherwise(0L))
            .as("n_outliers"),
          first(col("lo")).as("lo"), first(col("hi")).as("hi"))
        .orderBy("l_returnflag")
    }),

    // Exact MODE per group with a DETERMINISTIC tiebreak — the built-in
    // `mode()` is tie-arbitrary on both engines, so the contract form is
    // the two-level shape: count per (group, value), then rank by
    // (count desc, value asc) and keep rank 1. Scale: the first groupBy
    // shuffles on the COMPOSITE key (cardinality |groups|·|values| —
    // parallel even when |groups| is tiny), the window then runs over
    // value-cardinality-sized groups, never raw rows. l_quantity's
    // values are exact integral doubles, so value ordering is identical
    // across engines.
    "a_mode" -> ((s, d) => {
      val counts = t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_returnflag").orderBy(col("cnt").desc, col("l_quantity").asc)
      counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_returnflag"),
          round(col("l_quantity"), 6).as("mode_qty"), col("cnt"))
        .orderBy("l_returnflag")
    })
  )

  val oracleSql: Map[String, String] = Map(
    // Exact-mode theta sketches (n « k): every estimate equals the true
    // distinct count, so the full set-algebra pipeline is hash-gradeable.
    "a_theta_ops" ->
      ("WITH a AS (SELECT DISTINCT CAST(floor(value) AS BIGINT) v " +
        "FROM events WHERE event_type = 'view'), " +
        "b AS (SELECT DISTINCT CAST(floor(value) AS BIGINT) v " +
        "FROM events WHERE event_type = 'purchase') " +
        "SELECT (SELECT count(*) FROM a) AS n_view, " +
        "(SELECT count(*) FROM b) AS n_purchase, " +
        "(SELECT count(*) FROM (SELECT v FROM a INTERSECT SELECT v FROM b)) AS n_both, " +
        "(SELECT count(*) FROM (SELECT v FROM a EXCEPT SELECT v FROM b)) AS n_view_only"),
    "a_entropy" ->
      ("WITH bs AS (SELECT lang, source, count(*) AS cnt FROM documents GROUP BY lang, source), " +
        "bl AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS n_docs, count(*) AS n_sources " +
        "FROM bs GROUP BY lang) " +
        "SELECT bs.lang, n_docs, n_sources, " +
        "round(sum(-(CAST(cnt AS DOUBLE) / n_docs) * ln(CAST(cnt AS DOUBLE) / n_docs)), 6) AS entropy, " +
        "CASE WHEN n_sources = 1 THEN 0.0 ELSE " +
        "round(sum(-(CAST(cnt AS DOUBLE) / n_docs) * ln(CAST(cnt AS DOUBLE) / n_docs)) " +
        "/ ln(CAST(n_sources AS DOUBLE)), 6) END AS norm_entropy " +
        "FROM bs JOIN bl ON bs.lang = bl.lang " +
        "GROUP BY bs.lang, n_docs, n_sources ORDER BY bs.lang"),
    // exact-regime contract: no purge ⇒ estimates are exact counts and
    // max_err is 0 — the oracle states both
    "a_freq_topk" ->
      ("SELECT user_id, count(*) AS est_cnt, CAST(0 AS BIGINT) AS max_err " +
        "FROM events GROUP BY user_id " +
        "ORDER BY est_cnt DESC, user_id LIMIT 10"),
    "a_hist2d" ->
      ("SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS price_bin, " +
        "month(o_orderdate) AS order_month, count(*) AS cnt " +
        "FROM orders GROUP BY 1, 2 ORDER BY 1, 2"),
    "a_group_sum_q1" ->
      ("SELECT l_returnflag, l_linestatus, " +
        "round(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_qty, " +
        "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_base_price, " +
        "round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_disc_price, " +
        "round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_charge, " +
        "round(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / count(*), 6) AS avg_qty, " +
        "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / count(*), 6) AS avg_price, " +
        "count(*) AS count_order " +
        "FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),
    // Full recompute over base ∪ delta — the merged incremental view
    // must hash-equal it (algebraic mergeability, the IVM contract).
    "a_ivm_agg" ->
      ("SELECT o_orderstatus AS status, " +
        "CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon, " +
        "count(*) AS n_orders, " +
        "round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 6) AS revenue, " +
        "min(o_totalprice) AS min_price, max(o_totalprice) AS max_price, " +
        "round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) / count(*), 6) AS avg_price " +
        "FROM orders GROUP BY status, mon ORDER BY status, mon"),
    "a_count_distinct" ->
      ("SELECT c_mktsegment, count(DISTINCT c_custkey) AS n_cust, " +
        "count(DISTINCT o_orderkey) AS n_orders " +
        "FROM customer JOIN orders ON c_custkey = o_custkey " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"),
    "a_multi_distinct" ->
      ("SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts, " +
        "count(DISTINCT l_suppkey) AS n_supps " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "a_rollup" ->
      ("SELECT r_name, n_name, count(*) AS cust_cnt, " +
        "CAST(grouping(r_name) AS INTEGER) AS g_r, CAST(grouping(n_name) AS INTEGER) AS g_n " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY ROLLUP (r_name, n_name) " +
        "ORDER BY g_r, g_n, r_name NULLS FIRST, n_name NULLS FIRST"),
    "a_cube" ->
      ("SELECT l_returnflag, l_linestatus, " +
        "round(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_qty, " +
        "count(*) AS cnt, CAST(grouping(l_returnflag) AS INTEGER) AS g_f, " +
        "CAST(grouping(l_linestatus) AS INTEGER) AS g_s " +
        "FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus) " +
        "ORDER BY g_f, g_s, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"),
    "a_gsets" ->
      ("SELECT c_mktsegment, n_name, count(*) AS cust_cnt, " +
        "CAST(grouping(c_mktsegment) AS INTEGER) AS g_seg, " +
        "CAST(grouping(n_name) AS INTEGER) AS g_nat " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
        "GROUP BY GROUPING SETS ((c_mktsegment), (n_name), ()) " +
        "ORDER BY g_seg, g_nat, c_mktsegment NULLS FIRST, n_name NULLS FIRST"),
    "a_having" ->
      ("SELECT n_name, count(*) AS cust_cnt FROM customer " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "GROUP BY n_name HAVING count(*) > 55 ORDER BY n_name"),
    "a_stats" ->
      ("SELECT l_returnflag, round(stddev_samp(l_quantity), 6) AS sd_qty, " +
        "round(var_samp(l_quantity), 6) AS var_qty, " +
        "round(corr(l_quantity, l_extendedprice), 6) AS corr_qp, " +
        "round(covar_samp(l_quantity, l_extendedprice), 6) AS cov_qp, " +
        "round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity), 6) AS median_qty " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "a_pivot" ->
      ("SELECT o_orderpriority, " +
        "count(*) FILTER (WHERE o_orderstatus = 'F') AS F, " +
        "count(*) FILTER (WHERE o_orderstatus = 'O') AS O, " +
        "count(*) FILTER (WHERE o_orderstatus = 'P') AS P " +
        "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "a_unpivot" ->
      ("WITH w AS (SELECT l_returnflag, " +
        "round(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE), 6) AS qty, " +
        "round(CAST(sum(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE), 6) AS disc, " +
        "round(CAST(sum(CAST(l_tax AS DECIMAL(38,6))) AS DOUBLE), 6) AS tax " +
        "FROM lineitem GROUP BY l_returnflag) " +
        "SELECT l_returnflag, measure, val FROM (" +
        "SELECT l_returnflag, 'qty' AS measure, qty AS val FROM w " +
        "UNION ALL SELECT l_returnflag, 'disc', disc FROM w " +
        "UNION ALL SELECT l_returnflag, 'tax', tax FROM w) " +
        "ORDER BY l_returnflag, measure"),
    "a_minmax_by" ->
      ("SELECT o_orderstatus, round(CAST(max(o_totalprice) AS DOUBLE), 6) AS max_price, " +
        "arg_max(o_orderkey, ov) AS best_key, arg_min(o_orderkey, ov) AS worst_key " +
        "FROM (SELECT *, lpad(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 12, '0') " +
        "|| '#' || lpad(CAST(o_orderkey AS VARCHAR), 10, '0') AS ov FROM orders) " +
        "GROUP BY o_orderstatus ORDER BY o_orderstatus"),
    "a_collect_sorted" ->
      ("SELECT n_regionkey, coalesce(string_agg(n_name, ',' ORDER BY n_name), '') AS names " +
        "FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"),
    // The PLAIN one-phase groupBy: the salted two-phase plan must be
    // value-identical (decimal addition is associative-exact).
    "a_skew_twophase" ->
      ("SELECT l_returnflag, " +
        "round(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_qty, " +
        "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_price, " +
        "count(*) AS n_rows " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    // DuckDB's regr_* family computes the identical closed form; note
    // the (y, x) argument order matches Spark's.
    "a_regression" ->
      ("SELECT l_returnflag, " +
        "round(regr_slope(l_extendedprice, l_quantity), 6) AS slope, " +
        "round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept, " +
        "round(regr_r2(l_extendedprice, l_quantity), 6) AS r2, " +
        "CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    // Tukey fences from quantile_cont (same interpolation family as
    // Spark's percentile — a_stats precedent), rounded to the shared
    // 6-dp grid before the comparison.
    "a_outliers" ->
      ("WITH st AS (SELECT l_returnflag, " +
        "quantile_cont(l_extendedprice, 0.25) AS q1, " +
        "quantile_cont(l_extendedprice, 0.75) AS q3 " +
        "FROM lineitem GROUP BY l_returnflag), " +
        "b AS (SELECT l_returnflag, round(q1 - 1.5 * (q3 - q1), 6) AS lo, " +
        "round(q3 + 1.5 * (q3 - q1), 6) AS hi FROM st) " +
        "SELECT l.l_returnflag, count(*) AS n_rows, " +
        "CAST(sum(CASE WHEN l_extendedprice < lo OR l_extendedprice > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers, " +
        "any_value(lo) AS lo, any_value(hi) AS hi " +
        "FROM lineitem l JOIN b USING (l_returnflag) " +
        "GROUP BY l.l_returnflag ORDER BY l.l_returnflag"),
    // Deterministic-tiebreak mode: NOT the tie-arbitrary built-in mode().
    "a_mode" ->
      ("WITH c AS (SELECT l_returnflag, l_quantity, count(*) AS cnt " +
        "FROM lineitem GROUP BY l_returnflag, l_quantity), " +
        "r AS (SELECT l_returnflag, l_quantity, cnt, row_number() OVER " +
        "(PARTITION BY l_returnflag ORDER BY cnt DESC, l_quantity ASC) AS rn FROM c) " +
        "SELECT l_returnflag, round(l_quantity, 6) AS mode_qty, cnt " +
        "FROM r WHERE rn = 1 ORDER BY l_returnflag")
  )
}
