package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.T._

/** Group W (window functions) — SURVEY.md §2b.
  *
  * Reference analog: flexcalc's per-neighborhood operators
  * (process.py::interpolate_holes R7, subtract_air R5) are window-shaped:
  * a value computed from surrounding rows of the same partition. Windows
  * shuffle once on the partition key and sort within — at 100 TB the
  * partition key (customer / user / status) must carry the parallelism,
  * so no query here uses a global (unpartitioned) window except w_ntile,
  * where the global total order IS the semantics under test.
  *
  * Every window order key is made total with a trailing unique key so both
  * engines see the same frame contents (SURVEY §7.3 R1).
  */
object Windows {

  val queries: Map[String, Q] = Map(
    "w_rownum" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          row_number().over(w).cast("bigint").as("rn"))
        .orderBy("o_custkey", "rn")
    }),

    // Real ties: ordering on the 5-valued o_orderpriority.
    "w_rank_dense" -> ((s, d) => {
      val w = Window.partitionBy("o_orderstatus").orderBy("o_orderpriority")
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
          rank().over(w).cast("bigint").as("rnk"),
          dense_rank().over(w).cast("bigint").as("drnk"))
        .orderBy("o_orderkey")
    }),

    "w_ntile" -> ((s, d) => {
      val w = Window.orderBy("o_totalprice", "o_orderkey")
      t(s, d, "orders")
        .select(col("o_orderkey"), ntile(4).over(w).cast("bigint").as("tile"))
        .orderBy("o_orderkey")
    }),

    "w_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
      t(s, d, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          truncNtz("millisecond", col("ts")).as("ts_ms"))
        .select(col("user_id"), col("event_id"),
          (unix_millis(col("ts_ms").cast("timestamp")) -
            unix_millis(lag(col("ts_ms"), 1).over(w).cast("timestamp")))
            .as("gap_ms"),
          lead(col("event_type"), 1).over(w).as("next_type"))
        .orderBy("user_id", "event_id")
    }),

    "w_frame_rows" -> ((s, d) => {
      val w = Window.partitionBy("o_orderstatus")
        .orderBy("o_orderdate", "o_orderkey").rowsBetween(-6, 0)
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderdate"),
          decOut(sum(dec(col("o_totalprice"))).over(w)).as("mov_sum"),
          avgOut(sum(dec(col("o_totalprice"))).over(w), count(lit(1)).over(w))
            .as("mov_avg"))
        .orderBy("o_orderstatus", "o_orderdate", "o_orderkey")
    }),

    // RANGE frame over the numeric order key: all rows within 1000 of the
    // current price (ties included by definition → deterministic).
    "w_frame_range" -> ((s, d) => {
      val w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice")
        .rangeBetween(-1000, 0)
      // lazy localCheckpoint BEFORE the global orderBy: the range
      // exchange's partitioner SAMPLES its child, which re-executed the
      // whole sliding-frame window — the one expensive operator here —
      // a second time (two equal ~1.2 s jobs in the profile). The
      // checkpoint materializes the window once; the sample and the
      // shuffle both read blocks. Values and final order are untouched.
      graft.ops.T.checkpointed(t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          count(lit(1)).over(w).as("band_n"),
          decOut(sum(dec(col("o_totalprice"))).over(w)).as("band_sum")))
        .orderBy("o_orderstatus", "o_totalprice", "o_orderkey")
    }),

    // TIME-interval RANGE frame — the trailing-window rolling metric
    // (events in the last hour per user): w_frame_range's RANGE device
    // applied to event TIME. Spark's rangeBetween needs a numeric order
    // column, so the order key is exact integer seconds-since-epoch
    // (timestampdiff — the same function DuckDB spells date_diff), and
    // the frame [now−3600 s, now] is the interval DuckDB writes as
    // RANGE INTERVAL 1 HOUR PRECEDING. Ties (same second) share a frame
    // by RANGE semantics on both engines, so no tiebreak is needed for
    // determinism; the count/sum aggregates are order-insensitive.
    "w_range_time" -> ((s, d) => {
      val secs = expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts_ms)")
      val w = Window.partitionBy("user_id").orderBy(col("epoch_s"))
        .rangeBetween(-3600, 0)
      evMs(s, d)
        .withColumn("epoch_s", secs)
        .select(col("user_id"), col("event_id"), col("ts_ms"),
          count(lit(1)).over(w).as("n_1h"),
          decOut(sum(dec(col("value"))).over(w)).as("sum_1h"))
        .orderBy("user_id", "ts_ms", "event_id")
    }),

    // Cumulative revenue + post-window filter (QUALIFY analog).
    "w_running_total" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          sum(dec(col("o_totalprice"))).over(w).as("cum_dec"))
        .filter(col("cum_dec") > lit(300000).cast("decimal(38,6)"))
        .select(col("o_custkey"), col("o_orderkey"),
          decOut(col("cum_dec")).as("cum_total"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "w_first_last" -> ((s, d) => {
      val w = Window.partitionBy("o_orderstatus").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "orders")
        .select(col("o_orderstatus"),
          first(col("o_orderkey")).over(w).as("first_key"),
          last(col("o_orderkey")).over(w).as("last_key"))
        .distinct()
        .orderBy("o_orderstatus")
    }),

    // Distribution ranks: percent_rank = (rank-1)/(n-1), cume_dist =
    // rank_with_ties/n — tie-free under the (price, unique key) order,
    // so both are exact small rationals that the two engines compute
    // identically in IEEE double before the conventional round-6.
    "w_dist" -> ((s, d) => {
      val w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"))
        .orderBy("o_orderkey")
    }),

    // ROLLING EXACT MEDIAN over the last-5-rows frame per user — the
    // robust moving baseline (a_mad's rolling twin: one spike moves a
    // rolling mean arbitrarily, the rolling median by at most one rank).
    // The frame is 5 rows, so per-row cost is O(frame log frame) and
    // the window parallelizes per user. Emission is TIE-SAFE by
    // construction: a percentile()/quantile_cont interpolation over
    // even-size leading frames (sizes 2 and 4 at each partition start)
    // halves a 6-dp value onto the exact x.xxxxxx5 half grid, where a
    // 1-ulp cross-engine difference in (a+b)/2 vs a+(b-a)*0.5 flips the
    // final round — the t_ewma comment's observed hazard. So instead of
    // interpolating in double, the frame's values quantize to
    // DECIMAL(18,6), sort, and emit 2×median as an EXACT decimal sum
    // (odd frame: 2×mid; even frame: the two middle elements' sum) —
    // integer arithmetic on the 6-dp grid, no division, no ties; the
    // final cast to double is correctly rounded from the same exact
    // decimal on both engines.
    "w_moving_median" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts_ms"), col("event_id"))
        .rowsBetween(-4, 0)
      evMs(s, d)
        .withColumn("arr", array_sort(collect_list(
          round(col("value"), 6).cast("decimal(18,6)")).over(w)))
        .select(col("user_id"), col("event_id"),
          round(col("value"), 6).as("value"),
          when(size(col("arr")) % 2 === 1,
            element_at(col("arr"), expr("int((size(arr) + 1) div 2)")) * 2)
            .otherwise(element_at(col("arr"), expr("int(size(arr) div 2)")) +
              element_at(col("arr"), expr("int(size(arr) div 2) + 1")))
            .cast("double").as("med5_x2"))
        .orderBy("user_id", "event_id")
    }),

    // GAPS-AND-ISLANDS: maximal runs of consecutive active minutes per
    // user — the classic row_number-difference device (a run of
    // consecutive minute indexes m has constant m − row_number, so that
    // difference IS the island key; no self-join, no recursion). Shape:
    // distinct (user, minute) → per-user window → per-island agg — two
    // shuffles, both partitioned by user, fully parallel at 100 TB (the
    // window never spans users). Minute index = whole minutes since
    // 2024-01-01 via timestampdiff — an exact integer on both engines
    // (ts is minute-truncated first, so no sub-minute precision feeds
    // the difference; DuckDB's date_diff('minute', …) is the same
    // function).
    "w_islands" -> ((s, d) => {
      val mins = evMs(s, d)
        .withColumn("ts_min", truncNtz("minute", col("ts_ms")))
        .select(col("user_id"),
          expr("timestampdiff(MINUTE, TIMESTAMP_NTZ'2024-01-01 00:00:00', ts_min)")
            .as("m"))
        .distinct()
      val w = Window.partitionBy("user_id").orderBy("m")
      mins.withColumn("isl", col("m") - row_number().over(w))
        .groupBy("user_id", "isl")
        .agg(min("m").as("start_min"), max("m").as("end_min"),
          count(lit(1)).as("n_minutes"))
        .select("user_id", "start_min", "end_min", "n_minutes")
        .orderBy("user_id", "start_min")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "w_range_time" ->
      ("WITH e AS (SELECT user_id, event_id, value, " +
        "date_trunc('milliseconds', ts) AS ts_ms FROM events), " +
        "s AS (SELECT user_id, event_id, value, ts_ms, " +
        "date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts_ms) AS epoch_s FROM e) " +
        "SELECT user_id, event_id, ts_ms, " +
        "count(*) OVER w AS n_1h, " +
        "round(CAST(sum(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE), 6) AS sum_1h " +
        "FROM s WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s " +
        "RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) " +
        "ORDER BY user_id, ts_ms, event_id"),
    "w_moving_median" ->
      ("WITH e AS (SELECT user_id, event_id, value, " +
        "date_trunc('milliseconds', ts) AS ts_ms FROM events), " +
        "f AS (SELECT user_id, event_id, value, " +
        "list_sort(list(CAST(round(value, 6) AS DECIMAL(18,6))) OVER (" +
        "PARTITION BY user_id ORDER BY ts_ms, event_id " +
        "ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) AS arr FROM e) " +
        "SELECT user_id, event_id, round(value, 6) AS value, " +
        "CAST(CASE WHEN len(arr) % 2 = 1 THEN arr[(len(arr) + 1) // 2] * 2 " +
        "ELSE arr[len(arr) // 2] + arr[len(arr) // 2 + 1] END AS DOUBLE) AS med5_x2 " +
        "FROM f ORDER BY user_id, event_id"),
    "w_rownum" ->
      ("SELECT o_custkey, o_orderkey, o_orderdate, " +
        "row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn " +
        "FROM orders ORDER BY o_custkey, rn"),
    "w_rank_dense" ->
      ("SELECT o_orderkey, o_orderstatus, o_orderpriority, " +
        "rank() OVER (PARTITION BY o_orderstatus ORDER BY o_orderpriority) AS rnk, " +
        "dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY o_orderpriority) AS drnk " +
        "FROM orders ORDER BY o_orderkey"),
    "w_ntile" ->
      ("SELECT o_orderkey, ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS tile " +
        "FROM orders ORDER BY o_orderkey"),
    "w_lag_lead" ->
      ("WITH e AS (SELECT event_id, user_id, event_type, " +
        "date_trunc('milliseconds', ts) AS ts_ms FROM events) " +
        "SELECT user_id, event_id, " +
        "epoch_ms(ts_ms) - epoch_ms(lag(ts_ms, 1) OVER " +
        "(PARTITION BY user_id ORDER BY ts_ms, event_id)) AS gap_ms, " +
        "lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS next_type " +
        "FROM e ORDER BY user_id, event_id"),
    "w_frame_rows" ->
      ("SELECT o_orderkey, o_orderstatus, o_orderdate, " +
        "round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) OVER w AS DOUBLE), 6) AS mov_sum, " +
        "round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) OVER w AS DOUBLE) " +
        "/ count(*) OVER w, 6) AS mov_avg " +
        "FROM orders WINDOW w AS (PARTITION BY o_orderstatus " +
        "ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) " +
        "ORDER BY o_orderstatus, o_orderdate, o_orderkey"),
    "w_frame_range" ->
      ("SELECT o_orderkey, o_orderstatus, o_totalprice, " +
        "count(*) OVER w AS band_n, " +
        "round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) OVER w AS DOUBLE), 6) AS band_sum " +
        "FROM orders WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice " +
        "RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) " +
        "ORDER BY o_orderstatus, o_totalprice, o_orderkey"),
    "w_running_total" ->
      ("SELECT o_custkey, o_orderkey, round(CAST(cum_dec AS DOUBLE), 6) AS cum_total FROM (" +
        "SELECT o_custkey, o_orderkey, " +
        "sum(CAST(o_totalprice AS DECIMAL(38,6))) OVER (" +
        "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_dec FROM orders) " +
        "WHERE cum_dec > 300000 ORDER BY o_custkey, o_orderkey"),
    "w_first_last" ->
      ("SELECT DISTINCT o_orderstatus, " +
        "first_value(o_orderkey) OVER w AS first_key, " +
        "last_value(o_orderkey) OVER w AS last_key " +
        "FROM orders WINDOW w AS (PARTITION BY o_orderstatus " +
        "ORDER BY o_orderdate, o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) " +
        "ORDER BY o_orderstatus"),
    "w_dist" ->
      ("SELECT o_orderkey, o_orderstatus, " +
        "round(percent_rank() OVER w, 6) AS pct_rank, " +
        "round(cume_dist() OVER w, 6) AS cume " +
        "FROM orders WINDOW w AS (PARTITION BY o_orderstatus " +
        "ORDER BY o_totalprice, o_orderkey) " +
        "ORDER BY o_orderkey"),
    // Same row_number-difference device; date_diff on the minute-
    // truncated ts yields the identical integer minute index.
    "w_islands" ->
      ("WITH mins AS (SELECT DISTINCT user_id, " +
        "date_diff('minute', TIMESTAMP '2024-01-01 00:00:00', " +
        "date_trunc('minute', ts)) AS m FROM events), " +
        "isl AS (SELECT user_id, m, " +
        "m - row_number() OVER (PARTITION BY user_id ORDER BY m) AS isl " +
        "FROM mins) " +
        "SELECT user_id, min(m) AS start_min, max(m) AS end_min, " +
        "count(*) AS n_minutes FROM isl GROUP BY user_id, isl " +
        "ORDER BY user_id, start_min")
  )
}
