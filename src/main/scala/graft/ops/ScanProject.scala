package graft.ops

import org.apache.spark.sql.functions._
import graft.ops.T._

/** Groups S (scans/sources) + P (projection/filter/predicates) — SURVEY.md §2b.
  *
  * Reference analog: flexcalc/batch.py::scheduler.read_data (R1) with its
  * `sampling=`/`skip=` subsample args maps to Parquet column pruning +
  * predicate pushdown + deterministic modulo sampling here; write_data (R2)
  * is exercised by the Verify parquet sink on every query.
  */
object ScanProject {

  val queries: Map[String, Q] = Map(
    // R1 analog: full scan, all columns.
    "s_scan_full" -> ((s, d) =>
      t(s, d, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")),

    // R1 analog: column pruning — ReadSchema should list only 3 columns.
    "s_scan_prune" -> ((s, d) =>
      t(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")),

    // R1 analog: predicate pushdown — PushedFilters should carry the bound.
    "s_scan_pushdown" -> ((s, d) =>
      t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")
        .orderBy("o_orderkey")),

    // R1 `sampling=` analog: deterministic every-10th-key sample (no RNG —
    // TABLESAMPLE differs across engines, SURVEY §2b).
    "s_scan_sample_det" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(pmod(col("l_orderkey"), lit(10)) === 0)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")),

    // GENERATED source — a table from NO input at all (the dbt
    // date-spine / calendar-dimension verb): sequence() + explode
    // produces the rows, so the only data is the generator's bounds.
    // Distributed note: a year of days is driver-trivial; for a
    // billion-row series the same shape runs `spark.range(n)` +
    // timestampadd so generation parallelizes across executors.
    "s_gen_series" -> ((s, d) => {
      s.range(0, 1)
        .select(explode(expr(
          "sequence(TIMESTAMP_NTZ '1995-01-01 00:00:00', " +
            "TIMESTAMP_NTZ '1995-12-31 00:00:00', INTERVAL 1 DAY)")).as("day"))
        .select(col("day"),
          date_format(col("day"), "E").as("dow"),
          date_format(col("day"), "E").isin("Sat", "Sun").as("is_weekend"))
        .orderBy("day")
    }),

    // PARQUET AGGREGATE PUSHDOWN — COUNT/MIN/MAX answered from row-group
    // FOOTER STATISTICS instead of data pages: the scan reads ~KB of
    // metadata per file where a normal plan decompresses every page of
    // the aggregated columns (at 100 TB: a metadata-only sweep vs a full
    // column scan). Requires the DSv2 parquet path (`useV1SourceList=""`)
    // plus `parquet.aggregatePushdown` — both CLOSURE-scoped via the
    // eager-checkpoint device (the j_runtime_filter precedent) so no
    // other graded plan is perturbed. The raw-file read is deliberate:
    // T.t's normalizeTs projection would sit between scan and agg and
    // disqualify the rewrite (fixture longs/doubles need no shim).
    // PlanShapeSpec pins `PushedAggregation: [COUNT(*), MIN(...)…]` in
    // the executed plan. MIN/MAX only — parquet footers can answer
    // nothing order-sensitive, and COUNT(DISTINCT) stays a real agg.
    "s_agg_pushdown" -> ((s, d) => {
      val v1K = "spark.sql.sources.useV1SourceList"
      val aggK = "spark.sql.parquet.aggregatePushdown"
      val oldV1 = s.conf.getOption(v1K)
      val oldAgg = s.conf.getOption(aggK)
      s.conf.set(v1K, "")
      s.conf.set(aggK, "true")
      try
        checkpointed(
          s.read.parquet(s"$d/lineitem.parquet")
            .agg(expr("count(*)").as("n_rows"),
              min(col("l_orderkey")).as("min_okey"),
              max(col("l_orderkey")).as("max_okey"),
              min(col("l_quantity")).as("min_qty"),
              max(col("l_quantity")).as("max_qty")),
          eager = true)
      finally {
        oldV1.fold(s.conf.unset(v1K))(s.conf.set(v1K, _))
        oldAgg.fold(s.conf.unset(aggK))(s.conf.set(aggK, _))
      }
    }),

    // Equi-width HISTOGRAM of a numeric column — the profiling verb next
    // to s_profile_stats' scalar stats (ANALYZE-style distribution
    // sketching; the optimizer-statistics and data-drift input). Two
    // passes: one 1-row min/max agg broadcast back as a crossJoin'd
    // literal frame, then one data-sized groupBy on the bin index
    // floor((x − min)/w) clamped to the last bin — exact same IEEE ops
    // on both engines from identical parquet doubles, so bin boundaries
    // can't drift. Bin count fixed at 20; empty bins are emitted via a
    // generated spine so the histogram shape is complete (a 100 TB
    // profile must distinguish "empty bin" from "absent row").
    "s_hist_numeric" -> ((s, d) => {
      val mm = t(s, d, "orders")
        .agg(min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
      val binned = t(s, d, "orders").crossJoin(broadcast(mm))
        .withColumn("w", (col("hi") - col("lo")) / lit(20.0))
        .withColumn("bin",
          least(floor((col("o_totalprice") - col("lo")) / col("w")), lit(19L))
            .cast("long"))
        .groupBy("bin").agg(count(lit(1)).as("n"))
      val spine = s.range(0, 20).select(col("id").as("bin"))
        .crossJoin(broadcast(mm))
        .withColumn("w", (col("hi") - col("lo")) / lit(20.0))
      spine.join(binned, Seq("bin"), "left")
        .select(col("bin"),
          round(col("lo") + col("bin") * col("w"), 6).as("bin_lo"),
          round(col("lo") + (col("bin") + 1) * col("w"), 6).as("bin_hi"),
          coalesce(col("n"), lit(0L)).as("n"))
        .orderBy("bin")
    }),

    // Projection arithmetic in double, emitted as round(…, 6) (§7.3 R6 —
    // per-row arithmetic is order-independent so no decimal needed) — same
    // charge expression as TPC-H.
    "p_proj_arith" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
            (lit(1.0) + col("l_tax")), 6).as("charge"),
          concat_ws("|", col("l_returnflag"), col("l_linestatus")).as("flags"))
        .orderBy("l_orderkey", "l_linenumber")),

    // Compound predicates: AND/OR/NOT, IN, BETWEEN, LIKE.
    "p_filter_compound" -> ((s, d) =>
      t(s, d, "part")
        .filter(
          col("p_size").between(10, 30) &&
            (col("p_type").like("PROMO%") ||
              col("p_brand").isin("Brand#1", "Brand#2")) &&
            !(col("p_size") === 15))
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
        .orderBy("p_partkey")),

    // Three-valued logic: nullif / IS NULL / coalesce / IS DISTINCT FROM.
    "p_filter_null_logic" -> ((s, d) =>
      t(s, d, "lineitem")
        .withColumn("qn", expr("nullif(l_quantity, 1.0D)"))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("qn").isNull.as("q_is_null"),
          coalesce(col("qn"), lit(-1.0)).as("q_coalesced"),
          (!(col("qn") <=> col("l_discount"))).as("q_distinct_disc"))
        .orderBy("l_orderkey", "l_linenumber")),

    // Tiered CASE WHEN → bucket counts.
    "p_case_when" -> ((s, d) =>
      t(s, d, "orders")
        .withColumn("bucket",
          when(col("o_totalprice") < 50000, "low")
            .when(col("o_totalprice") < 150000, "mid")
            .otherwise("high"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("bucket")),

    // Per-column profiling (ANALYZE shape) — see profileStats below.
    "s_profile_stats" -> profileStats,

    // KEY-SKEW profile — the diagnostic that decides every skew
    // intervention in this library (SaltedJoin.saltCounts sizes its
    // factors from exactly these group sizes; AQE's skew-join threshold
    // is this distribution's tail): group-size distribution of a join/agg
    // key in two levels — groupBy(key) → sizes (data-sized shuffle with
    // map-side partial combine), then ONE agg over the #groups-sized
    // frame. The hottest key travels via orderBy+limit
    // (TakeOrderedAndProject, total tiebreak) and meets the stats row in
    // a 1-row × 1-row crossJoin. skew_ratio = max/avg is the headline
    // number: ~1 ⇒ even, » 1 ⇒ salt (events.user_id is the contract's
    // deliberately skewed key).
    "s_skew_profile" -> ((s, d) => {
      val sizes = t(s, d, "events")
        .groupBy("user_id").agg(count(lit(1)).as("sz"))
      val top = sizes.orderBy(col("sz").desc, col("user_id").asc).limit(1)
        .select(col("user_id").as("top_key"), col("sz").as("top_sz"))
      sizes.agg(
          count(lit(1)).as("n_groups"),
          sum(col("sz")).as("n_rows"),
          max(col("sz")).as("max_sz"),
          round(expr("percentile(sz, 0.5D)"), 6).as("p50_sz"),
          round(expr("percentile(sz, 0.9D)"), 6).as("p90_sz"))
        .crossJoin(broadcast(top))
        .select(col("n_groups"), col("n_rows"), col("max_sz"),
          col("p50_sz"), col("p90_sz"),
          round(col("max_sz") / (col("n_rows").cast("double") / col("n_groups")), 6)
            .as("skew_ratio"),
          col("top_key"), col("top_sz"))
    })
  )

  /** Column-profiling key (split out of the map literal for readability):
    * the ANALYZE/data-profiling staple every corpus pipeline runs before
    * planning — per column: non-null count, exact distinct count, min,
    * max. Profiled columns only int64/string (never doubles: a double's
    * string form is engine-specific; int64/string render identically).
    *
    * Shape: one UNION branch per column, each a single-column agg.
    * The alternative single-pass multi-distinct plans as ONE Expand
    * (×(cols+1) row replication) feeding a SortAggregate — measured
    * 4.6 s at sf0.1 vs ~1 s for this form, and the economics only get
    * worse at 100 TB: each union branch scans ONLY its own column
    * (columnar pruning — the 4 branches together read the same bytes
    * the Expand scan reads once) and pays a distinct-sized hash
    * shuffle, vs Expand's cols× row blow-up through a sort. Production
    * profiling swaps countDistinct → approx_count_distinct (graded at
    * `a_approx_hll`) — everything else here is identical.
    */
  private def profileStats: Q = (s, d) => {
    val li = t(s, d, "lineitem")
    val cols = Seq("l_orderkey", "l_suppkey", "l_linenumber", "l_returnflag")
    cols.map { c =>
      li.agg(
        count(col(c)).as("n_nonnull"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_val"),
        max(col(c)).cast("string").as("max_val"))
        .select(lit(c).as("col_name"), col("n_nonnull"),
          col("n_distinct"), col("min_val"), col("max_val"))
    }.reduce(_ unionByName _).orderBy("col_name")
  }

  val oracleSql: Map[String, String] = Map(
    "s_hist_numeric" ->
      ("WITH mm AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders), " +
        "b AS (SELECT least(CAST(floor((o_totalprice - lo) / ((hi - lo) / 20.0)) AS BIGINT), 19) AS bin, " +
        "count(*) AS n FROM orders CROSS JOIN mm GROUP BY bin), " +
        "spine AS (SELECT CAST(range AS BIGINT) AS bin FROM range(0, 20)) " +
        "SELECT s.bin, " +
        "round(lo + s.bin * ((hi - lo) / 20.0), 6) AS bin_lo, " +
        "round(lo + (s.bin + 1) * ((hi - lo) / 20.0), 6) AS bin_hi, " +
        "CAST(coalesce(b.n, 0) AS BIGINT) AS n " +
        "FROM spine s CROSS JOIN mm LEFT JOIN b ON b.bin = s.bin " +
        "ORDER BY s.bin"),
    "s_gen_series" ->
      ("SELECT ts AS day, strftime(ts, '%a') AS dow, " +
        "strftime(ts, '%a') IN ('Sat', 'Sun') AS is_weekend " +
        "FROM generate_series(TIMESTAMP '1995-01-01', TIMESTAMP '1995-12-31', " +
        "INTERVAL 1 DAY) t(ts) ORDER BY day"),
    "s_agg_pushdown" ->
      ("SELECT count(*) AS n_rows, " +
        "min(l_orderkey) AS min_okey, max(l_orderkey) AS max_okey, " +
        "min(l_quantity) AS min_qty, max(l_quantity) AS max_qty " +
        "FROM lineitem"),
    "s_scan_full" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "s_scan_prune" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "s_scan_pushdown" ->
      ("SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority " +
        "FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01' ORDER BY o_orderkey"),
    "s_scan_sample_det" ->
      ("SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem " +
        "WHERE l_orderkey % 10 = 0 ORDER BY l_orderkey, l_linenumber"),
    "p_proj_arith" ->
      ("SELECT l_orderkey, l_linenumber, " +
        "round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax), 6) AS charge, " +
        "l_returnflag || '|' || l_linestatus AS flags " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber"),
    "p_filter_compound" ->
      ("SELECT p_partkey, p_name, p_brand, p_type, p_size FROM part " +
        "WHERE p_size BETWEEN 10 AND 30 " +
        "AND (p_type LIKE 'PROMO%' OR p_brand IN ('Brand#1','Brand#2')) " +
        "AND NOT (p_size = 15) ORDER BY p_partkey"),
    "p_filter_null_logic" ->
      ("SELECT l_orderkey, l_linenumber, qn IS NULL AS q_is_null, " +
        "coalesce(qn, -1.0) AS q_coalesced, qn IS DISTINCT FROM l_discount AS q_distinct_disc " +
        "FROM (SELECT *, nullif(l_quantity, 1.0) AS qn FROM lineitem) " +
        "ORDER BY l_orderkey, l_linenumber"),
    "p_case_when" ->
      ("SELECT CASE WHEN o_totalprice < 50000 THEN 'low' " +
        "WHEN o_totalprice < 150000 THEN 'mid' ELSE 'high' END AS bucket, " +
        "count(*) AS cnt FROM orders GROUP BY 1 ORDER BY bucket"),
    "s_skew_profile" ->
      ("WITH sizes AS (SELECT user_id, count(*) AS sz FROM events GROUP BY user_id), " +
        "top AS (SELECT user_id AS top_key, sz AS top_sz FROM sizes " +
        "ORDER BY sz DESC, user_id LIMIT 1), " +
        "stats AS (SELECT count(*) AS n_groups, CAST(sum(sz) AS BIGINT) AS n_rows, " +
        "max(sz) AS max_sz, " +
        "round(percentile_cont(0.5) WITHIN GROUP (ORDER BY sz), 6) AS p50_sz, " +
        "round(percentile_cont(0.9) WITHIN GROUP (ORDER BY sz), 6) AS p90_sz FROM sizes) " +
        "SELECT n_groups, n_rows, max_sz, p50_sz, p90_sz, " +
        "round(max_sz / (CAST(n_rows AS DOUBLE) / n_groups), 6) AS skew_ratio, " +
        "top_key, top_sz FROM stats CROSS JOIN top"),
    // One UNION ALL branch per profiled column — the relational spelling
    // of the stack() pivot.
    "s_profile_stats" -> Seq(
      "l_orderkey", "l_suppkey", "l_linenumber", "l_returnflag")
      .map(c =>
        s"SELECT '$c' AS col_name, count($c) AS n_nonnull, " +
          s"count(DISTINCT $c) AS n_distinct, " +
          s"CAST(min($c) AS VARCHAR) AS min_val, " +
          s"CAST(max($c) AS VARCHAR) AS max_val FROM lineitem")
      .mkString("", " UNION ALL ", " ORDER BY col_name")
  )
}
