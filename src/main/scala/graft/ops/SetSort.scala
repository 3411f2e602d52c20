package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.T._

/** Group O (sort / limit / top-k / set ops) — SURVEY.md §2b.
  *
  * Reference analogs: merge('projections'/'volume') (batch.py, R25) → union;
  * optimize_rotation_center's grid-search top-1 (process.py, R27) →
  * order-by-metric-limit-k, expressed per-group as o_topk_per_group.
  *
  * Scale notes: global top-k compiles to TakeOrderedAndProject (no full
  * sort/shuffle of the input); per-group top-k uses a window whose
  * row_number filter Catalyst pushes down via LimitPushDownThroughWindow.
  */
object SetSort {

  val queries: Map[String, Q] = Map(
    // Multi-key sort with injected NULLs and pinned null placement.
    "o_sort_multi" -> ((s, d) =>
      t(s, d, "part")
        .withColumn("size_n", expr("nullif(p_size, 15)"))
        .select(col("p_partkey"), col("p_brand"), col("size_n"))
        .orderBy(col("p_brand").asc, col("size_n").desc_nulls_first,
          col("p_partkey").asc)),

    "o_limit_topk" -> ((s, d) =>
      t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(25)),

    "o_offset_page" -> ((s, d) =>
      t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .offset(25)
        .limit(25)),

    // FIXED-SIZE deterministic sample — the verb x_sample_hash's
    // FRACTION contract can't give ("exactly 200 eval docs", not "2 %"):
    // order by a salted content hash and take k, which is uniform over
    // any key distribution, reproducible across runs/partitionings, and
    // plans as TakeOrderedAndProject (per-partition top-k + driver
    // merge — no reservoir state, no global sort, no second pass to
    // count). The salt pins the sample; changing it redraws.
    "o_sample_fixed" -> ((s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          md5(concat(lit("s1|"), col("o_orderkey").cast("string"))).as("hk"))
        .orderBy(col("hk").asc, col("o_orderkey").asc)
        .limit(200)
        .select("o_orderkey", "o_custkey", "o_totalprice", "hk")),

    "o_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).cast("bigint").as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    }),

    // BAG set operations — EXCEPT ALL / INTERSECT ALL multiset
    // semantics, the half o_except/o_intersect's DISTINCT forms can't
    // express: per key the result multiplicity is max(0, cnt_a − cnt_b)
    // / min(cnt_a, cnt_b), visible in the graded counts precisely where
    // a key repeats on both sides. Spark plans exceptAll/intersectAll
    // as a generate-over-counts rewrite (sum ±1 per side, replicate) —
    // two aggregations, no join explosion, scale-safe.
    "o_except_all" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val a = li.filter(col("l_quantity") > 25).select(col("l_orderkey").as("k"))
      val b = li.filter(col("l_tax") > 0.05).select(col("l_orderkey").as("k"))
      val ex = a.exceptAll(b).groupBy("k")
        .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
      val ia = a.intersectAll(b).groupBy("k")
        .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
      ex.unionByName(ia).select("op", "k", "n").orderBy("op", "k")
    }),

    // Overlapping slices → duplicates preserved; (okey, src) unique.
    "o_union_all" -> ((s, d) => {
      val o = t(s, d, "orders")
      val a = o.filter(pmod(col("o_orderkey"), lit(3)).isin(0, 1))
        .select(lit("a").as("src"), col("o_orderkey"))
      val b = o.filter(pmod(col("o_orderkey"), lit(3)).isin(1, 2))
        .select(lit("b").as("src"), col("o_orderkey"))
      a.unionByName(b).orderBy("o_orderkey", "src")
    }),

    "o_union_distinct" -> ((s, d) => {
      val o = t(s, d, "orders")
      o.filter(col("o_orderstatus") === "O").select("o_custkey")
        .union(o.filter(col("o_totalprice") > 100000).select("o_custkey"))
        .distinct()
        .orderBy("o_custkey")
    }),

    "o_intersect" -> ((s, d) => {
      val o = t(s, d, "orders")
      o.filter(col("o_orderstatus") === "F").select("o_custkey")
        .intersect(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
        .orderBy("o_custkey")
    }),

    "o_except" -> ((s, d) => {
      val o = t(s, d, "orders")
      o.filter(col("o_orderstatus") === "F").select("o_custkey")
        .except(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
        .orderBy("o_custkey")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "o_except_all" ->
      ("WITH a AS (SELECT l_orderkey AS k FROM lineitem WHERE l_quantity > 25), " +
        "b AS (SELECT l_orderkey AS k FROM lineitem WHERE l_tax > 0.05), " +
        "ex AS (SELECT * FROM a EXCEPT ALL SELECT * FROM b), " +
        "ia AS (SELECT * FROM a INTERSECT ALL SELECT * FROM b) " +
        "SELECT * FROM (" +
        "SELECT 'except_all' AS op, k, count(*) AS n FROM ex GROUP BY k " +
        "UNION ALL " +
        "SELECT 'intersect_all' AS op, k, count(*) AS n FROM ia GROUP BY k) " +
        "ORDER BY op, k"),
    "o_sort_multi" ->
      ("SELECT p_partkey, p_brand, nullif(p_size, 15) AS size_n FROM part " +
        "ORDER BY p_brand ASC, size_n DESC NULLS FIRST, p_partkey ASC"),
    "o_limit_topk" ->
      ("SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25"),
    "o_offset_page" ->
      ("SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25 OFFSET 25"),
    "o_sample_fixed" ->
      ("SELECT o_orderkey, o_custkey, o_totalprice, " +
        "md5('s1|' || CAST(o_orderkey AS VARCHAR)) AS hk FROM orders " +
        "ORDER BY hk ASC, o_orderkey ASC LIMIT 200"),
    "o_topk_per_group" ->
      ("SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (" +
        "SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (" +
        "PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn " +
        "FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn"),
    "o_union_all" ->
      ("SELECT 'a' AS src, o_orderkey FROM orders WHERE o_orderkey % 3 IN (0,1) " +
        "UNION ALL SELECT 'b' AS src, o_orderkey FROM orders WHERE o_orderkey % 3 IN (1,2) " +
        "ORDER BY o_orderkey, src"),
    "o_union_distinct" ->
      ("SELECT o_custkey FROM orders WHERE o_orderstatus = 'O' " +
        "UNION SELECT o_custkey FROM orders WHERE o_totalprice > 100000 " +
        "ORDER BY o_custkey"),
    "o_intersect" ->
      ("SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' " +
        "INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O' " +
        "ORDER BY o_custkey"),
    "o_except" ->
      ("SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' " +
        "EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O' " +
        "ORDER BY o_custkey")
  )
}
