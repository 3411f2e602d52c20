package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.T._

/** Group J (joins) — SURVEY.md §2b.
  *
  * The reference (flexcalc) has no relational joins — only positional
  * stitch/merge (process.py::append_tile, batch.py::merge, R10/R25); the
  * full join surface is built Spark-natively per the north star.
  *
  * Scale notes (100 TB): small dims (region/nation/supplier/part) broadcast —
  * AQE does this automatically, `j_broadcast` pins it explicitly. The band
  * join `j_theta_band` is pre-bucketed on 5-minute keys so Spark executes an
  * equi-join O(n·k) instead of a per-user cross product (SURVEY §7.4.2).
  */
object Joins {

  val queries: Map[String, Q] = Map(
    "j_inner_eq" -> ((s, d) =>
      t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(count(lit(1)).as("order_cnt"),
          decOut(sum(dec(col("o_totalprice")))).as("total_spent"))
        .orderBy("c_custkey")),

    "j_left_outer" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(count(col("o_orderkey")).as("order_cnt"))
        .orderBy("c_custkey")),

    "j_right_outer" -> ((s, d) =>
      t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"), "right")
        .groupBy("c_custkey", "c_name")
        .agg(count(col("o_orderkey")).as("order_cnt"))
        .orderBy("c_custkey")),

    // Full outer over two overlapping key-partitioned slices of orders:
    // %3∈{0,1} vs %3∈{1,2} → nulls on both sides.
    "j_full_outer" -> ((s, d) => {
      val o = t(s, d, "orders").select("o_orderkey")
      val a = o.filter(pmod(col("o_orderkey"), lit(3)).isin(0, 1))
        .select(col("o_orderkey").as("a_key"))
      val b = o.filter(pmod(col("o_orderkey"), lit(3)).isin(1, 2))
        .select(col("o_orderkey").as("b_key"))
      a.join(b, col("a_key") === col("b_key"), "full")
        .select(col("a_key"), col("b_key"),
          coalesce(col("a_key"), col("b_key")).as("okey"))
        .orderBy("okey")
    }),

    "j_semi" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_orderstatus") === "O"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    "j_anti" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    "j_cross" -> ((s, d) =>
      t(s, d, "region")
        .crossJoin(t(s, d, "nation"))
        .select(col("r_regionkey"), col("n_nationkey"),
          concat(col("r_name"), lit("-"), col("n_name")).as("pair"))
        .orderBy("r_regionkey", "n_nationkey")),

    // Explicit broadcast-hash join: plan must show BroadcastHashJoin.
    "j_broadcast" -> ((s, d) =>
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("line_cnt"),
          decOut(sum(dec(col("l_quantity")))).as("sum_qty"))
        .orderBy("p_brand")),

    // 4-way chain — Catalyst reorders; dims broadcast under AQE.
    "j_multiway" -> ((s, d) =>
      t(s, d, "region")
        .join(t(s, d, "nation"), col("r_regionkey") === col("n_regionkey"))
        .join(t(s, d, "customer"), col("n_nationkey") === col("c_nationkey"))
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .groupBy("r_regionkey", "r_name")
        .agg(count(lit(1)).as("order_cnt"),
          decOut(sum(dec(col("o_totalprice")))).as("total_price"))
        .orderBy("r_regionkey")),

    // Band join, pre-bucketed on 5-min keys (SURVEY §7.4.2): the probe side
    // is exploded to buckets {b, b-1} so `bucket(e1) = jb(e2)` is an
    // equi-join key; the raw band predicate then refines. Each qualifying
    // pair matches exactly one bucket pairing → no duplicates.
    // ts is ms-truncated on BOTH engines before comparing (ns trap, §1.2).
    "j_theta_band" -> ((s, d) => {
      val e = t(s, d, "events").select(
        col("event_id"), col("user_id"),
        truncNtz("millisecond", col("ts")).as("ts_ms"))
      val bucketed = e.withColumn("b",
        expr("unix_millis(cast(ts_ms as timestamp)) div 300000"))
      val e1 = bucketed.select(col("user_id").as("u"),
        col("event_id").as("a_id"), col("ts_ms").as("a_ts"), col("b"))
      val e2 = bucketed
        .withColumn("jb", explode(array(col("b"), col("b") - 1)))
        .select(col("user_id").as("u2"), col("event_id").as("b_id"),
          col("ts_ms").as("b_ts"), col("jb"))
      e1.join(e2,
          col("u") === col("u2") && col("b") === col("jb") &&
            col("b_ts") > col("a_ts") &&
            col("b_ts") <= col("a_ts") + expr("INTERVAL 5 MINUTES"))
        .select(col("u").as("user_id"), col("a_id"), col("b_id"))
        .orderBy("a_id", "b_id")
    }),

    // As-of via running max over earlier rows (deterministic window form,
    // identical on both engines; ordering key (ts_ms, event_id) breaks
    // post-truncation ties).
    "j_asof" -> ((s, d) => {
      val e = t(s, d, "events")
        .filter(col("event_type").isin("view", "purchase"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          truncNtz("millisecond", col("ts")).as("ts_ms"))
      val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      e.withColumn("prev_view_ts",
          max(when(col("event_type") === "view", col("ts_ms"))).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          col("ts_ms").as("purchase_ts"), col("prev_view_ts"))
        .orderBy("event_id")
    }),

    // NEAREST-event as-of (round-11 addition) — the bidirectional variant
    // of j_asof (backward-only): for each purchase, the view event
    // closest in time in EITHER direction, ties to the earlier side.
    // Same zero-join window device: backward max / forward min of the
    // conditional event time over one (user, ts, id) total order — two
    // frames sharing one shuffle+sort, per-user state a single timestamp
    // each way at any scale. Millisecond deltas are exact integers.
    "j_asof_nearest" -> ((s, d) => {
      val e = t(s, d, "events")
        .filter(col("event_type").isin("view", "purchase"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          truncNtz("millisecond", col("ts")).as("ts_ms"))
      val ord = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
      val prevW = ord.rowsBetween(Window.unboundedPreceding, -1)
      val nextW = ord.rowsBetween(1, Window.unboundedFollowing)
      e.withColumn("prev_view_ts",
          max(when(col("event_type") === "view", col("ts_ms"))).over(prevW))
        .withColumn("next_view_ts",
          min(when(col("event_type") === "view", col("ts_ms"))).over(nextW))
        .filter(col("event_type") === "purchase")
        .withColumn("d_prev",
          expr("timestampdiff(MILLISECOND, prev_view_ts, ts_ms)"))
        .withColumn("d_next",
          expr("timestampdiff(MILLISECOND, ts_ms, next_view_ts)"))
        .withColumn("direction",
          when(col("d_prev").isNotNull &&
            (col("d_next").isNull || col("d_prev") <= col("d_next")), "prev")
            .when(col("d_next").isNotNull, "next")
            .otherwise("none"))
        .withColumn("nearest_view_ts",
          when(col("direction") === "prev", col("prev_view_ts"))
            .when(col("direction") === "next", col("next_view_ts")))
        .withColumn("delta_ms",
          when(col("direction") === "prev", col("d_prev"))
            .when(col("direction") === "next", col("d_next")))
        .select(col("user_id"), col("event_id"),
          col("ts_ms").as("purchase_ts"), col("nearest_view_ts"),
          col("direction"), col("delta_ms"))
        .orderBy("event_id")
    }),

    // STALENESS-BOUNDED as-of (round-12 addition) — the feature-store
    // "max feature age" rule j_asof stops short of: a backward match is
    // accepted only while the matched feature is FRESH ENOUGH (here 30
    // minutes); an older match is flagged stale and yields NULL, and
    // no-match stays distinct from stale (the three states mean
    // different things to a training job: use / refuse / impute). Same
    // zero-join window device as j_asof — the tolerance is a row-local
    // CASE after the window, so the scale shape (one per-user
    // shuffle+sort, single-timestamp state) is unchanged at 100 TB.
    "j_asof_tolerance" -> ((s, d) => {
      val e = t(s, d, "events")
        .filter(col("event_type").isin("view", "purchase"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          truncNtz("millisecond", col("ts")).as("ts_ms"))
      val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      e.withColumn("prev_view_ts",
          max(when(col("event_type") === "view", col("ts_ms"))).over(w))
        .filter(col("event_type") === "purchase")
        .withColumn("age_all",
          expr("timestampdiff(MILLISECOND, prev_view_ts, ts_ms)"))
        .select(col("user_id"), col("event_id"),
          col("ts_ms").as("purchase_ts"),
          when(col("age_all") <= 1800000L, col("prev_view_ts"))
            .as("fresh_view_ts"),
          when(col("age_all") <= 1800000L, col("age_all")).as("age_ms"),
          when(col("prev_view_ts").isNull, "none")
            .when(col("age_all") <= 1800000L, "fresh")
            .otherwise("stale").as("status"))
        .orderBy("event_id")
    }),

    // Theta inequality join, bounded by the nation equi-key; the bigger
    // side is fanned so the ~n_s×n_c/|nation| pair work parallelizes.
    "j_theta_ineq" -> ((s, d) =>
      fan(s, t(s, d, "customer"))
        .join(broadcast(t(s, d, "supplier")),
          col("s_nationkey") === col("c_nationkey") &&
            col("s_acctbal") > col("c_acctbal"))
        .select("s_suppkey", "c_custkey")
        .orderBy("s_suppkey", "c_custkey")),

    // The SQL FRONT DOOR, graded: TPC-H Q3's shape (segment filter →
    // 3-way join → revenue agg → top 10) submitted as a `spark.sql`
    // string over registered temp views — every other key drives the
    // DataFrame API; this one proves the same engine, optimizer, and
    // determinism idioms (decimal sum, decOut rounding, tie-broken
    // LIMIT) hold for a SQL-string user. Catalyst plans it identically
    // to the DataFrame twin (one logical plan either way).
    "j_sql_q3" -> ((s, d) => {
      t(s, d, "customer").createOrReplaceTempView("graft_customer")
      t(s, d, "orders").createOrReplaceTempView("graft_orders")
      t(s, d, "lineitem").createOrReplaceTempView("graft_lineitem")
      s.sql(
        "SELECT o_orderkey, " +
          "round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE), 6) AS revenue, " +
          "o_orderdate, o_orderpriority " +
          "FROM graft_customer JOIN graft_orders ON c_custkey = o_custkey " +
          "JOIN graft_lineitem ON l_orderkey = o_orderkey " +
          "WHERE c_mktsegment = 'BUILDING' " +
          "AND o_orderdate < TIMESTAMP_NTZ '1998-01-01 00:00:00' " +
          "AND l_shipdate > TIMESTAMP_NTZ '1998-01-01 00:00:00' " +
          "GROUP BY o_orderkey, o_orderdate, o_orderpriority " +
          "ORDER BY revenue DESC, o_orderkey LIMIT 10")
    }),

    // EXISTENCE join (round-12 addition): EXISTS predicates in the
    // SELECT list — not a filter — so Catalyst plans the dedicated
    // ExistenceJoin variant (a semi-join that EMITS the boolean instead
    // of dropping rows; j_semi/j_anti grade the filtering forms, this
    // grades the flag form a feature pipeline uses: "has any X" as a
    // column). Two existence probes against the same fact side, each a
    // hash join on the customer key — never a per-row subquery loop;
    // at 100 TB both probes shuffle/broadcast by the same key.
    "j_exists_flag" -> ((s, d) => {
      t(s, d, "customer").createOrReplaceTempView("graft_customer")
      t(s, d, "orders").createOrReplaceTempView("graft_orders")
      s.sql(
        "SELECT c_custkey, " +
          "EXISTS(SELECT 1 FROM graft_orders o WHERE o.o_custkey = c.c_custkey " +
          "AND o.o_totalprice > 150000.0) AS has_big, " +
          "EXISTS(SELECT 1 FROM graft_orders o WHERE o.o_custkey = c.c_custkey " +
          "AND o.o_orderpriority = '1-URGENT') AS has_urgent " +
          "FROM graft_customer c ORDER BY c_custkey")
    }),

    // Correlated SCALAR subqueries, graded: one count + one max per
    // customer row, written as correlated subselects — Catalyst's
    // decorrelation (RewriteCorrelatedScalarSubquery) turns each into a
    // left outer aggregate join, so the plan that executes is
    // shuffle-sane even though the query is written row-at-a-time. Both
    // aggregates are order-insensitive-exact (integer count, double max
    // over identical parquet values) — no float-summation boundary for
    // engines to disagree on.
    "j_sql_corr" -> ((s, d) => {
      t(s, d, "customer").createOrReplaceTempView("graft_corr_cust")
      t(s, d, "orders").createOrReplaceTempView("graft_corr_ords")
      s.sql(
        "SELECT c_custkey, " +
          "(SELECT count(*) FROM graft_corr_ords o WHERE o.o_custkey = c.c_custkey) AS n_orders, " +
          "(SELECT round(max(o_totalprice), 6) FROM graft_corr_ords o WHERE o.o_custkey = c.c_custkey) AS max_price " +
          "FROM graft_corr_cust c ORDER BY c_custkey")
    }),

    // LATERAL correlated subquery, graded: top order per customer via
    // `, LATERAL (... ORDER BY ... LIMIT 1)` — the SQL spelling of
    // o_topk_per_group; inner-lateral semantics drop order-less
    // customers. Deterministic: identical parquet doubles on both
    // engines, ties broken by o_orderkey.
    "j_lateral" -> ((s, d) => {
      t(s, d, "customer").createOrReplaceTempView("graft_lat_cust")
      t(s, d, "orders").createOrReplaceTempView("graft_lat_ords")
      s.sql(
        "SELECT c_custkey, l.o_orderkey, l.o_totalprice " +
          "FROM graft_lat_cust c, " +
          "LATERAL (SELECT o_orderkey, o_totalprice FROM graft_lat_ords o " +
          "WHERE o.o_custkey = c.c_custkey " +
          "ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) l " +
          "ORDER BY c_custkey")
    }),

    // Co-bucketed join through the catalog (sources/Bucketing), graded:
    // both sides land as managed tables bucketed 8 ways on the join key
    // — the pay-the-shuffle-ONCE-at-write-time layout; the join then
    // reads co-located buckets. THIS key grades value correctness
    // through the bucketed write→catalog→scan→join path (the part an
    // oracle can check); BucketingSpec separately pins the zero-Exchange
    // SortMergeJoin plan with broadcast disabled — the part it can't.
    "j_bucketed" -> ((s, d) => {
      val cust = t(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val ords = t(s, d, "orders")
        .select(col("o_custkey").as("c_custkey"), col("o_totalprice"))
      graft.sources.Bucketing.writeBucketed(cust, "graft_jb_cust", "c_custkey", 8)
      graft.sources.Bucketing.writeBucketed(ords, "graft_jb_ords", "c_custkey", 8)
      graft.sources.Bucketing.bucketJoin(s, "graft_jb_cust", "graft_jb_ords", "c_custkey")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          decOut(sum(dec(col("o_totalprice")))).as("total"))
        .orderBy("c_mktsegment")
    }),

    // POINT-IN-TIME join against an SCD2 dimension — the feature-store
    // staple (training-data assembly asks "what was this entity's state
    // AT each observation time", and joining the current state instead
    // is the classic label-leakage bug): materialize each user's state
    // intervals (the t_scd2 build), then resolve the prevailing state at
    // every hourly grid point. NOT an interval join: the UNION-WINDOW
    // device plans it as one sort per user — dim changes and grid points
    // interleave on (ts, kind, ver) and `last(state, ignoreNulls)`
    // carries the prevailing state forward, so each observation pays
    // O(log) in a per-user sort instead of a range-join fan-out. The
    // (ts, kind, ver) order is TOTAL: kind puts a same-timestamp state
    // change BEFORE the grid point that must see it (valid_from is
    // inclusive), ver breaks same-ms change ties by recency. Grid points
    // before a user's first change are dropped (no prevailing state).
    "j_pit_scd2" -> ((s, d) =>
      // lazy localCheckpoint BEFORE the global orderBy: the range
      // exchange's partitioner samples its child, re-executing the
      // union + as-of window — the expensive final stage — a second
      // time (w_frame_range's measured device). Values/order unchanged.
      // The device itself (no join, union + window) is pinned by
      // PlanShapeSpec on [[pitScd2Resolve]] — the checkpoint hides it
      // from this frame's executed plan.
      graft.ops.T.checkpointed(pitScd2Resolve(s, d))
        .orderBy("user_id", "hour")),

    // RUNTIME BLOOM-FILTER join reduction — Spark's runtime row-level
    // filtering, the scan-side lever AQE can't give you: a selective
    // predicate on the DIM side is compiled at optimization time into a
    // bloom-filter AGGREGATE over the dim's join keys, and the fact side
    // gains a might_contain() filter BEFORE its shuffle — at 100 TB the
    // fact rows that would never find a match die at the scan instead of
    // crossing the wire (the difference between shuffling a day of
    // lineitems and shuffling the 5 % with urgent orders). The fact side
    // carries a shuffle_hash hint so the fixture-sized dim doesn't
    // broadcast (broadcast joins need no runtime filter — at production
    // scale BOTH sides exceed the broadcast threshold, which is exactly
    // when this rule fires). Confs (enable + zero the application-side
    // size gate, which defaults to 10 GB) are scoped to the closure:
    // the join MATERIALIZES here via T.checkpointed(eager) and the
    // session confs are restored before returning, so no other graded
    // plan is perturbed. PlanShapeSpec pins the bloom aggregate and the
    // pushed might_contain; the oracle is the plain join — the grade IS
    // "the bloom filter changed nothing but the shuffle volume".
    // FUZZY STRING JOIN with blocking — approximate entity matching
    // (catalog reconciliation, crawl-URL titles, OCR noise): pairs of
    // part names within Levenshtein distance 3, restricted by a blocking
    // contract (shared first character + length band ≤ 2) that is PART
    // of the graded semantics, so the oracle states it verbatim. The
    // scale discipline is the identical-signature CONTRACTION (the dedup
    // family's device): duplicates collapse to DISTINCT names first
    // (64 here; vocabulary-sized generally), the quadratic edit-distance
    // work runs on the names frame only, and per-name multiplicities ride
    // along as counts — never a row-pair explosion over the data.
    // SPATIAL RADIUS JOIN via 2-D GRID BUCKETING — the geospatial twin
    // of j_interval_overlap's 1-D cell grid (and the join-side sibling
    // of x_io_zorder's storage-side 2-D clustering): points within
    // Euclidean distance r pair up by equi-joining r-sized grid cells —
    // one side replicates to its 3×3 cell neighborhood, the other joins
    // its own cell, the exact distance refines. LOSSLESS blocking (any
    // pair within r spans adjacent cells when the cell size is r), so
    // the oracle replays the PLAIN quadratic radius join and the grade
    // proves the grid changed the work, never the pairs. Coordinates
    // are manufactured integers (multiplier-mod scatter), so distances
    // compare exactly — no haversine/libm divergence. At 100 TB:
    // candidate work is cells × per-cell density², the all-pairs
    // product never forms, skewed cells salt like any hot equi-key.
    "j_spatial_grid" -> ((s, d) => {
      val cust = t(s, d, "customer").select(col("c_custkey").as("cid"),
        pmod(col("c_custkey") * 7919, lit(1000)).cast("long").as("ax"),
        pmod(col("c_custkey") * 104729, lit(1000)).cast("long").as("ay"))
      val supp = t(s, d, "supplier").select(col("s_suppkey").as("sid"),
        pmod(col("s_suppkey") * 7919 + 500, lit(1000)).cast("long").as("sx"),
        pmod(col("s_suppkey") * 104729 + 500, lit(1000)).cast("long").as("sy"))
      val c = cust
        .withColumn("cx", expr("ax div 30")).withColumn("cy", expr("ay div 30"))
      val offsets = for { dx <- -1 to 1; dy <- -1 to 1 }
        yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))
      val sRep = supp
        .withColumn("o", explode(array(offsets: _*)))
        .select(col("sid"), col("sx"), col("sy"),
          (expr("sx div 30") + col("o.dx")).as("cx"),
          (expr("sy div 30") + col("o.dy")).as("cy"))
      val dist2 = (col("ax") - col("sx")) * (col("ax") - col("sx")) +
        (col("ay") - col("sy")) * (col("ay") - col("sy"))
      c.join(sRep, Seq("cx", "cy"))
        .filter(dist2 <= 900)
        .select(col("cid"), col("sid"), dist2.as("dist2"))
        .orderBy("cid", "sid")
    }),

    "j_fuzzy_levenshtein" -> ((s, d) => {
      val names = t(s, d, "part").groupBy(col("p_name"))
        .agg(count(lit(1)).as("n"))
      val a = names.select(col("p_name").as("name_a"), col("n").as("n_a"),
        substring(col("p_name"), 1, 1).as("blk"))
      val b = names.select(col("p_name").as("name_b"), col("n").as("n_b"),
        substring(col("p_name"), 1, 1).as("blk"))
      a.join(b, "blk")
        .filter(col("name_a") < col("name_b") &&
          abs(length(col("name_a")) - length(col("name_b"))) <= 2)
        // THRESHOLD form: banded DP short-circuits at distance > 3
        // (O(band·n) per pair instead of O(n²)); for kept rows the
        // returned distance is identical to the unbounded form, and
        // rows beyond the threshold return -1 — outside [0, 3] exactly
        // like the old post-filter
        .withColumn("dist",
          levenshtein(col("name_a"), col("name_b"), 3).cast("long"))
        .filter(col("dist").between(0, 3))
        .select(col("name_a"), col("name_b"), col("dist"),
          col("n_a"), col("n_b"))
        .orderBy("name_a", "name_b")
    }),

    // DYNAMIC PARTITION PRUNING graded end to end — the OTHER scan-side
    // runtime lever beside j_runtime_filter (that one kills fact ROWS via
    // a bloom filter; this one kills whole fact PARTITIONS before the
    // scan even lists them): the fact table is laid out hive-partitioned
    // by day, the dim side carries a selective predicate, and Catalyst
    // compiles the dim's surviving join keys into a runtime
    // `dynamicpruning` subquery on the fact scan's PartitionFilters —
    // reusing the join's own broadcast, so the pruning costs nothing
    // extra (reuseBroadcastOnly, the default). At 100 TB on a
    // date-partitioned fact this is the difference between scanning the
    // store and scanning the qualifying days. Both tables are WRITTEN
    // then read back (scan-over-layout is the thing under test);
    // PlanShapeSpec pins the dynamicpruning expression in the fact scan.
    // Dim day is a DATE on both sides so the fact join key stays the
    // BARE partition attribute (a cast there would disqualify DPP);
    // emitted day re-cast to string (DATE output ban, §7.3 R6).
    "j_dpp" -> ((s, d) => {
      val factDir = dppFactScratch
      val dimDir = dppDimScratch
      val fact = evMs(s, d)
        .select(col("event_id"), col("user_id"), col("value"),
          truncNtz("day", col("ts_ms")).cast("date").as("day"))
      // whole day-partitions per task at an explicit count (the
      // Snapshot stagedLayout finding): unrepartitioned, every scan
      // task writes a file into every day dir it sees (tasks×days tiny
      // files — slower to write AND to re-scan)
      fact.repartition(
          math.max(s.sparkContext.defaultParallelism, 1), col("day"))
        .write.mode("overwrite").partitionBy("day").parquet(factDir)
      fact.select(col("day")).distinct()
        .withColumn("dow", date_format(col("day"), "E"))
        .write.mode("overwrite").parquet(dimDir)
      val factR = s.read.parquet(factDir)
      val dimR = s.read.parquet(dimDir).filter(col("dow") === "Mon")
      factR.join(dimR, "day")
        .groupBy("day")
        .agg(count(lit(1)).as("n_events"),
          decOut(sum(dec(col("value")))).as("sum_value"))
        .select(col("day").cast("string").as("day"),
          col("n_events"), col("sum_value"))
        .orderBy("day")
    }),

    "j_runtime_filter" -> ((s, d) => {
      val enabledK = "spark.sql.optimizer.runtime.bloomFilter.enabled"
      val gateK =
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
      // the injection rule declines when EITHER side can broadcast by
      // size (a broadcast join needs no runtime filter), so the
      // production regime — both sides over the threshold — is simulated
      // by zeroing the threshold for the closure's lifetime
      val bcastK = "spark.sql.autoBroadcastJoinThreshold"
      val oldEnabled = s.conf.getOption(enabledK)
      val oldGate = s.conf.getOption(gateK)
      val oldBcast = s.conf.getOption(bcastK)
      s.conf.set(enabledK, "true")
      s.conf.set(gateK, "0")
      s.conf.set(bcastK, "-1")
      try {
        val dim = t(s, d, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"), col("o_orderdate"))
        val fact = t(s, d, "lineitem")
          .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
        checkpointed(
          fact.hint("shuffle_hash").join(dim, "o_orderkey")
            .groupBy(truncNtz("month", col("o_orderdate")).as("month"))
            .agg(count(lit(1)).as("n_lines"),
              decOut(sum(dec(col("l_quantity")))).as("sum_qty"))
            .orderBy("month"),
          eager = true)
      } finally {
        oldEnabled.fold(s.conf.unset(enabledK))(s.conf.set(enabledK, _))
        oldGate.fold(s.conf.unset(gateK))(s.conf.set(gateK, _))
        oldBcast.fold(s.conf.unset(bcastK))(s.conf.set(bcastK, _))
      }
    }),

    // INCREMENTAL VIEW MAINTENANCE of a JOIN — the delta algebra that
    // completes t_rollup_incremental (aggregate IVM) for joined views:
    // a materialized join view V = A ⋈ B is refreshed from deltas as
    // ΔV = ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB, then merged (count/sum are
    // re-aggregable, so V₁ = re-agg(V₀ ∪ agg(ΔV)) with no retraction
    // algebra needed for inserts). Graded: the incremental result must
    // EQUAL the full recompute — the oracle is the plain full join, so
    // the grade IS "the delta algebra changed nothing but the work".
    // At 100 TB: ΔA⋈B₀ and A₀⋈ΔB are delta×base joins whose shuffles
    // carry the DELTA plus the base's matching keys only (with the base
    // bucketed on the join key — x_dedup_incremental's device — the
    // base side doesn't even shuffle); nightly cost scales with the
    // delta, never the store. Splits here: orders after 2000-07-01 are
    // ΔA, lineitems shipped after 2000-07-01 are ΔB — both non-empty at
    // every SF, and every A-month appears in V so the merge exercises
    // both update and carry-over groups.
    "j_ivm_delta" -> ((s, d) => {
      val cutoff = lit("2000-07-01").cast("timestamp_ntz")
      val a = t(s, d, "orders").select(col("o_orderkey"),
        truncNtz("month", col("o_orderdate")).as("month"))
      val b = t(s, d, "lineitem").select(col("l_orderkey").as("o_orderkey"),
        col("l_quantity"), col("l_shipdate"))
      val (a0, da) = (a.filter(col("month") < cutoff),
        a.filter(col("month") >= cutoff))
      val (b0, db) = (b.filter(col("l_shipdate") < cutoff),
        b.filter(col("l_shipdate") >= cutoff))
      def agg0(v: org.apache.spark.sql.DataFrame) = v.groupBy("month")
        .agg(count(lit(1)).as("cnt"), sum(dec(col("l_quantity"))).as("qty"))
      val v0 = agg0(a0.join(b0, "o_orderkey"))
      val dv = agg0(da.join(b0, "o_orderkey")
        .unionByName(a0.join(db, "o_orderkey"))
        .unionByName(da.join(db, "o_orderkey")))
      v0.unionByName(dv)
        .groupBy("month")
        .agg(sum(col("cnt")).as("cnt"), decOut(sum(col("qty"))).as("sum_qty"))
        .orderBy("month")
    }),

    // Skew-SALTED equi-join (operators/SaltedJoin), graded end to end on
    // the contract's skew fixture: events has very few distinct user_id
    // (15 at sf0.001), so a plain shuffled join funnels each user's whole
    // event history through ONE task — at 100 TB that's a handful of
    // reduce tasks doing all the work. SaltedJoin scatters the big side
    // over (user_id, hash(event_id) mod 8) and replicates the user-sized
    // dim side 8×: identical results, even tasks, shuffle growth only on
    // the SMALL side — the standard trade. The dim is manufactured from
    // the corpus (distinct user → tier label) so the key needs no extra
    // fixture; the oracle is the PLAIN join+group, i.e. the grade IS
    // "salting changed nothing but the distribution".
    "j_skew_salted" -> ((s, d) => {
      val ev = t(s, d, "events").select("user_id", "event_id", "value")
      val dim = t(s, d, "events").select("user_id").distinct()
        .withColumn("tier",
          concat(lit("tier"), pmod(col("user_id"), lit(3))))
      graft.operators.SaltedJoin
        .join(ev, dim, "user_id", spread = col("event_id"), nSalts = 8)
        .groupBy("user_id", "tier")
        .agg(count(lit(1)).as("n_events"),
          decOut(sum(dec(col("value")))).as("value_sum"))
        .orderBy("user_id")
    }),

    // INTERVAL-×-INTERVAL overlap join — the range-join class j_theta_band
    // (point-in-window) doesn't cover: open-order windows [date, +7d]
    // overlapping finished-order windows [date, +3d] per customer. The
    // grid-bucket device generalizes: each interval EXPLODES to the week
    // cells it covers (≤ 2 cells at these widths), the join is an
    // equi-join on (customer, cell) — overlapping intervals always share
    // a cell — then the exact overlap predicate filters and a distinct
    // collapses pairs that met in 2 cells. At 100 TB this is the
    // standard interval-join shape (genomics/session overlap): work is
    // cells×density per key, never |A|×|B|, and Catalyst plans a plain
    // shuffled hash join on the composite key.
    "j_interval_overlap" -> ((s, d) => {
      val day0 = "TIMESTAMP_NTZ'1995-01-01 00:00:00'"
      def cellsOf(startC: String, endC: String) = expr(
        s"explode(sequence(timestampdiff(DAY, $day0, $startC) div 7, " +
          s"timestampdiff(DAY, $day0, $endC) div 7))")
      val o = t(s, d, "orders")
      val a = o.filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("ck"), col("o_orderkey").as("a_key"),
          col("o_orderdate").as("a_start"),
          (col("o_orderdate") + expr("INTERVAL 7 DAYS")).as("a_end"))
        .withColumn("cell", cellsOf("a_start", "a_end"))
      val b = o.filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("ck2"), col("o_orderkey").as("b_key"),
          col("o_orderdate").as("b_start"),
          (col("o_orderdate") + expr("INTERVAL 3 DAYS")).as("b_end"))
        .withColumn("cell2", cellsOf("b_start", "b_end"))
      a.join(b, col("ck") === col("ck2") && col("cell") === col("cell2") &&
          col("a_start") <= col("b_end") && col("b_start") <= col("a_end"))
        .select(col("ck").as("custkey"), col("a_key"), col("b_key"),
          expr("timestampdiff(DAY, greatest(a_start, b_start), " +
            "least(a_end, b_end))").as("overlap_days"))
        .distinct()
        .orderBy("custkey", "a_key", "b_key")
    })
  )

  /** j_dpp scratch tables: one per JVM, graded read phase reuses them. */
  /** j_pit_scd2's pre-sort frame — the UNION-WINDOW point-in-time
    * resolution (no join anywhere): dim changes and grid points
    * interleave on (ts, kind, ver) and `last(state, ignoreNulls)`
    * carries the prevailing state forward. Factored out so
    * PlanShapeSpec can pin the device's plan shape directly — the
    * graded key wraps this in a lazy checkpoint (whose executed plan
    * shows only the materialized RDD) before its global sort.
    */
  private[graft] def pitScd2Resolve(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val e = t(s, d, "events")
      .withColumn("ts_ms", truncNtz("millisecond", col("ts")))
    val ord = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
    val dim = e
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(ord).isNull ||
          lag(col("event_type"), 1).over(ord) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("ver", sum(col("chg")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("ver"))
      .agg(first(col("event_type")).as("state"),
        min(col("ts_ms")).as("pt"))
      .select(col("user_id"), col("pt"), lit(0).as("kind"),
        col("ver"), col("state"))
    val grid = e.groupBy("user_id")
      .agg(min(truncNtz("hour", col("ts_ms"))).as("h0"),
        max(truncNtz("hour", col("ts_ms"))).as("h1"))
      .select(col("user_id"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("pt"))
      .select(col("user_id"), col("pt"), lit(1).as("kind"),
        lit(Long.MaxValue).as("ver"),
        lit(null).cast("string").as("state"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("pt"), col("kind"), col("ver"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dim.unionByName(grid)
      .withColumn("state_at", last(col("state"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1 && col("state_at").isNotNull)
      .select(col("user_id"), col("pt").as("hour"), col("state_at"))
  }

  private lazy val dppFactScratch: String = T.scratchDir("graft_dpp_fact")
  private lazy val dppDimScratch: String = T.scratchDir("graft_dpp_dim")

  val oracleSql: Map[String, String] = Map(
    // the blocking predicate is the graded contract, stated verbatim
    // Plain quadratic radius join — result-identical to the grid form
    // (the blocking is lossless), so the grade proves the optimization
    // preserved the pairs.
    "j_spatial_grid" ->
      ("WITH c AS (SELECT c_custkey AS cid, " +
        "CAST((c_custkey * 7919) % 1000 AS BIGINT) AS ax, " +
        "CAST((c_custkey * 104729) % 1000 AS BIGINT) AS ay FROM customer), " +
        "sp AS (SELECT s_suppkey AS sid, " +
        "CAST((s_suppkey * 7919 + 500) % 1000 AS BIGINT) AS sx, " +
        "CAST((s_suppkey * 104729 + 500) % 1000 AS BIGINT) AS sy FROM supplier) " +
        "SELECT cid, sid, " +
        "(ax - sx) * (ax - sx) + (ay - sy) * (ay - sy) AS dist2 " +
        "FROM c JOIN sp ON (ax - sx) * (ax - sx) + (ay - sy) * (ay - sy) <= 900 " +
        "ORDER BY cid, sid"),
    "j_fuzzy_levenshtein" ->
      ("WITH names AS (SELECT p_name, count(*) AS n FROM part GROUP BY p_name) " +
        "SELECT a.p_name AS name_a, b.p_name AS name_b, " +
        "CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist, " +
        "a.n AS n_a, b.n AS n_b " +
        "FROM names a JOIN names b " +
        "ON substring(a.p_name, 1, 1) = substring(b.p_name, 1, 1) " +
        "AND a.p_name < b.p_name " +
        "AND abs(length(a.p_name) - length(b.p_name)) <= 2 " +
        "AND levenshtein(a.p_name, b.p_name) <= 3 " +
        "ORDER BY name_a, name_b"),
    "j_asof_nearest" ->
      ("WITH e AS (SELECT event_id, user_id, event_type, " +
        "date_trunc('milliseconds', ts) AS ts_ms " +
        "FROM events WHERE event_type IN ('view','purchase')), " +
        "fr AS (SELECT event_id, user_id, event_type, ts_ms, " +
        "max(CASE WHEN event_type = 'view' THEN ts_ms END) OVER " +
        "(PARTITION BY user_id ORDER BY ts_ms, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_view_ts, " +
        "min(CASE WHEN event_type = 'view' THEN ts_ms END) OVER " +
        "(PARTITION BY user_id ORDER BY ts_ms, event_id " +
        "ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_view_ts " +
        "FROM e), " +
        "p AS (SELECT user_id, event_id, ts_ms, prev_view_ts, next_view_ts, " +
        "date_diff('millisecond', prev_view_ts, ts_ms) AS d_prev, " +
        "date_diff('millisecond', ts_ms, next_view_ts) AS d_next " +
        "FROM fr WHERE event_type = 'purchase'), " +
        "dir AS (SELECT *, CASE " +
        "WHEN d_prev IS NOT NULL AND (d_next IS NULL OR d_prev <= d_next) THEN 'prev' " +
        "WHEN d_next IS NOT NULL THEN 'next' ELSE 'none' END AS direction FROM p) " +
        "SELECT user_id, event_id, ts_ms AS purchase_ts, " +
        "CASE direction WHEN 'prev' THEN prev_view_ts WHEN 'next' THEN next_view_ts END AS nearest_view_ts, " +
        "direction, " +
        "CASE direction WHEN 'prev' THEN d_prev WHEN 'next' THEN d_next END AS delta_ms " +
        "FROM dir ORDER BY event_id"),
    "j_dpp" ->
      ("WITH f AS (SELECT event_id, value, " +
        "CAST(date_trunc('day', date_trunc('milliseconds', ts)) AS DATE) AS day " +
        "FROM events), " +
        "dim AS (SELECT DISTINCT day, strftime(day, '%a') AS dow FROM f) " +
        "SELECT CAST(f.day AS VARCHAR) AS day, count(*) AS n_events, " +
        "round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_value " +
        "FROM f JOIN dim ON f.day = dim.day WHERE dim.dow = 'Mon' " +
        "GROUP BY f.day ORDER BY day"),
    "j_inner_eq" ->
      ("SELECT c_custkey, c_name, count(*) AS order_cnt, " +
        "round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 6) AS total_spent " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY c_custkey, c_name ORDER BY c_custkey"),
    "j_left_outer" ->
      ("SELECT c_custkey, c_name, count(o_orderkey) AS order_cnt " +
        "FROM customer LEFT JOIN orders ON c_custkey = o_custkey " +
        "GROUP BY c_custkey, c_name ORDER BY c_custkey"),
    "j_right_outer" ->
      ("SELECT c_custkey, c_name, count(o_orderkey) AS order_cnt " +
        "FROM orders RIGHT JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY c_custkey, c_name ORDER BY c_custkey"),
    "j_full_outer" ->
      ("SELECT a.a_key AS a_key, b.b_key AS b_key, coalesce(a.a_key, b.b_key) AS okey " +
        "FROM (SELECT o_orderkey AS a_key FROM orders WHERE o_orderkey % 3 IN (0,1)) a " +
        "FULL OUTER JOIN (SELECT o_orderkey AS b_key FROM orders WHERE o_orderkey % 3 IN (1,2)) b " +
        "ON a.a_key = b.b_key ORDER BY okey"),
    "j_semi" ->
      ("SELECT c_custkey, c_name FROM customer WHERE EXISTS " +
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O') " +
        "ORDER BY c_custkey"),
    "j_anti" ->
      ("SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey"),
    "j_cross" ->
      ("SELECT r_regionkey, n_nationkey, r_name || '-' || n_name AS pair " +
        "FROM region CROSS JOIN nation ORDER BY r_regionkey, n_nationkey"),
    "j_broadcast" ->
      ("SELECT p_brand, count(*) AS line_cnt, " +
        "round(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_qty " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "GROUP BY p_brand ORDER BY p_brand"),
    "j_multiway" ->
      ("SELECT r_regionkey, r_name, count(*) AS order_cnt, " +
        "round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 6) AS total_price " +
        "FROM region JOIN nation ON r_regionkey = n_regionkey " +
        "JOIN customer ON n_nationkey = c_nationkey " +
        "JOIN orders ON c_custkey = o_custkey " +
        "GROUP BY r_regionkey, r_name ORDER BY r_regionkey"),
    "j_theta_band" ->
      ("WITH e AS (SELECT event_id, user_id, date_trunc('milliseconds', ts) AS ts_ms FROM events) " +
        "SELECT e1.user_id AS user_id, e1.event_id AS a_id, e2.event_id AS b_id " +
        "FROM e e1 JOIN e e2 ON e1.user_id = e2.user_id " +
        "AND e2.ts_ms > e1.ts_ms AND e2.ts_ms <= e1.ts_ms + INTERVAL 5 MINUTE " +
        "ORDER BY a_id, b_id"),
    "j_asof" ->
      ("WITH e AS (SELECT event_id, user_id, event_type, date_trunc('milliseconds', ts) AS ts_ms " +
        "FROM events WHERE event_type IN ('view','purchase')) " +
        "SELECT user_id, event_id, ts_ms AS purchase_ts, prev_view_ts FROM (" +
        "SELECT user_id, event_id, event_type, ts_ms, " +
        "max(CASE WHEN event_type = 'view' THEN ts_ms END) OVER (" +
        "PARTITION BY user_id ORDER BY ts_ms, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_view_ts FROM e) " +
        "WHERE event_type = 'purchase' ORDER BY event_id"),
    "j_asof_tolerance" ->
      ("WITH e AS (SELECT event_id, user_id, event_type, date_trunc('milliseconds', ts) AS ts_ms " +
        "FROM events WHERE event_type IN ('view','purchase')), " +
        "m AS (SELECT user_id, event_id, event_type, ts_ms, " +
        "max(CASE WHEN event_type = 'view' THEN ts_ms END) OVER (" +
        "PARTITION BY user_id ORDER BY ts_ms, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_view_ts FROM e), " +
        "a AS (SELECT user_id, event_id, ts_ms, prev_view_ts, " +
        "date_diff('millisecond', prev_view_ts, ts_ms) AS age_all FROM m " +
        "WHERE event_type = 'purchase') " +
        "SELECT user_id, event_id, ts_ms AS purchase_ts, " +
        "CASE WHEN age_all <= 1800000 THEN prev_view_ts END AS fresh_view_ts, " +
        "CASE WHEN age_all <= 1800000 THEN age_all END AS age_ms, " +
        "CASE WHEN prev_view_ts IS NULL THEN 'none' " +
        "WHEN age_all <= 1800000 THEN 'fresh' ELSE 'stale' END AS status " +
        "FROM a ORDER BY event_id"),
    "j_exists_flag" ->
      ("SELECT c_custkey, " +
        "EXISTS(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey " +
        "AND o.o_totalprice > 150000.0) AS has_big, " +
        "EXISTS(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey " +
        "AND o.o_orderpriority = '1-URGENT') AS has_urgent " +
        "FROM customer c ORDER BY c_custkey"),
    "j_theta_ineq" ->
      ("SELECT s_suppkey, c_custkey FROM supplier JOIN customer " +
        "ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal " +
        "ORDER BY s_suppkey, c_custkey"),
    "j_sql_q3" ->
      ("SELECT o_orderkey, " +
        "round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE), 6) AS revenue, " +
        "o_orderdate, o_orderpriority " +
        "FROM customer JOIN orders ON c_custkey = o_custkey " +
        "JOIN lineitem ON l_orderkey = o_orderkey " +
        "WHERE c_mktsegment = 'BUILDING' " +
        "AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00' " +
        "AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00' " +
        "GROUP BY o_orderkey, o_orderdate, o_orderpriority " +
        "ORDER BY revenue DESC, o_orderkey LIMIT 10"),
    "j_sql_corr" ->
      ("SELECT c_custkey, " +
        "(SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders, " +
        "(SELECT round(max(o_totalprice), 6) FROM orders o WHERE o.o_custkey = c.c_custkey) AS max_price " +
        "FROM customer c ORDER BY c_custkey"),
    "j_lateral" ->
      ("SELECT c_custkey, l.o_orderkey, l.o_totalprice " +
        "FROM customer c, " +
        "LATERAL (SELECT o_orderkey, o_totalprice FROM orders o " +
        "WHERE o.o_custkey = c.c_custkey " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) l " +
        "ORDER BY c_custkey"),
    "j_bucketed" ->
      ("SELECT c_mktsegment, count(*) AS n_orders, " +
        "round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 6) AS total " +
        "FROM customer JOIN orders ON c_custkey = o_custkey " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"),
    // The oracle is the UNSALTED join+group — the salted plan must be
    // value-identical to the plain one. (dim join contributes nothing
    // beyond the tier label: every user is in the distinct-user dim.)
    "j_pit_scd2" ->
      ("WITH e AS (SELECT user_id, event_id, event_type, date_trunc('milliseconds', ts) AS ts_ms FROM events), " +
        "flagged AS (SELECT user_id, event_type, ts_ms, event_id, " +
        "CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) IS NULL " +
        "OR lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) <> event_type " +
        "THEN 1 ELSE 0 END AS chg FROM e), " +
        "vers AS (SELECT user_id, event_type, ts_ms, " +
        "CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ver FROM flagged), " +
        "dim AS (SELECT user_id, min(ts_ms) AS pt, 0 AS kind, ver, min(event_type) AS state " +
        "FROM vers GROUP BY user_id, ver), " +
        "b AS (SELECT user_id, min(date_trunc('hour', ts_ms)) AS h0, " +
        "max(date_trunc('hour', ts_ms)) AS h1 FROM e GROUP BY user_id), " +
        "grid AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS pt, " +
        "1 AS kind, 9223372036854775807 AS ver, CAST(NULL AS VARCHAR) AS state FROM b), " +
        "r AS (SELECT user_id, pt, kind, last_value(state IGNORE NULLS) OVER (" +
        "PARTITION BY user_id ORDER BY pt, kind, ver " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS state_at " +
        "FROM (SELECT * FROM dim UNION ALL SELECT * FROM grid)) " +
        "SELECT user_id, pt AS hour, state_at FROM r " +
        "WHERE kind = 1 AND state_at IS NOT NULL ORDER BY user_id, hour"),
    "j_runtime_filter" ->
      ("SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month, " +
        "count(*) AS n_lines, " +
        "round(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_qty " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "WHERE o_orderpriority = '1-URGENT' GROUP BY month ORDER BY month"),
    // the full recompute IS the oracle — grading that the delta algebra
    // changed nothing
    "j_ivm_delta" ->
      // CAST: DuckDB date_trunc('month') returns DATE; Spark stays NTZ
      ("SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month, count(*) AS cnt, " +
        "round(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_qty " +
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey " +
        "GROUP BY month ORDER BY month"),
    "j_skew_salted" ->
      ("SELECT user_id, 'tier' || CAST(user_id % 3 AS VARCHAR) AS tier, " +
        "count(*) AS n_events, " +
        "round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS value_sum " +
        "FROM events GROUP BY user_id ORDER BY user_id"),
    // The oracle is the DIRECT overlap join (quadratic per customer is
    // fine for DuckDB at sf0.01) — the grid bucketing must be invisible
    // in the result.
    "j_interval_overlap" ->
      ("WITH a AS (SELECT o_custkey AS ck, o_orderkey AS a_key, " +
        "o_orderdate AS a_start, o_orderdate + INTERVAL 7 DAY AS a_end " +
        "FROM orders WHERE o_orderstatus = 'O'), " +
        "b AS (SELECT o_custkey AS ck, o_orderkey AS b_key, " +
        "o_orderdate AS b_start, o_orderdate + INTERVAL 3 DAY AS b_end " +
        "FROM orders WHERE o_orderstatus = 'F') " +
        "SELECT a.ck AS custkey, a_key, b_key, " +
        "date_diff('day', greatest(a_start, b_start), least(a_end, b_end)) AS overlap_days " +
        "FROM a JOIN b ON a.ck = b.ck " +
        "AND a_start <= b_end AND b_start <= a_end " +
        "ORDER BY custkey, a_key, b_key")
  )
}
