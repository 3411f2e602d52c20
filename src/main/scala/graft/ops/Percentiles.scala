package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** THRESHOLD-ROUTED per-group percentiles — the documented routing rule
  * the exact-percentile graded keys (`a_mad`, `a_stats`,
  * `w_moving_median`, `s_skew_profile`) carry in their Scaladoc,
  * graduated into code.
  *
  * The two regimes it routes between:
  *
  *  - **Exact** (`percentile(...)`): a HOLISTIC aggregate — Spark
  *    buffers every value of a group in the aggregation buffer. The
  *    right answer for a nightly-exact job whose groups are bounded
  *    (the `a_mad` contract), and the WRONG one at 100 TB with three
  *    `l_returnflag`-sized groups, where the buffer IS the table.
  *  - **KLL sketch** (`functions/Kll`): bounded ~KB state per group,
  *    mergeable map-side partials, a proven normalized rank-error bound
  *    (~1.65 % at k = 200, 99 % confidence) that merging never degrades
  *    — the only shape that survives unbounded groups.
  *
  * [[grouped]] makes the routing DATA-DRIVEN: a first #groups-sized
  * counting pass (algebraic, cheap) splits groups at `exactMaxRows`;
  * groups at or under the threshold compute exact percentiles, groups
  * above it KLL estimates, and the result carries a `method` column so
  * downstream consumers can see which guarantee each row has. Cost
  * shape at scale: the count pass + one pass per occupied regime, each
  * scanning only its own groups' rows (semi-join pushdown) — never a
  * holistic buffer over an unbounded group. PropertySpec pins the
  * routing split, the exact side against `percentile()`, and the sketch
  * side inside the established 2ε rank envelope.
  */
object Percentiles {

  /** Per-group percentiles with explicit exact-vs-sketch routing.
    *
    * @param df          input frame
    * @param groupCols   grouping columns (empty = one global group)
    * @param valueCol    numeric column to rank (cast to double)
    * @param ps          percentile ranks in [0, 1], e.g. Seq(0.5, 0.99)
    * @param exactMaxRows groups with more non-null values than this
    *                    route to the KLL sketch; the default keeps the
    *                    exact buffer well under executor memory
    * @param k           KLL accuracy parameter (200 ≈ 1.65 % rank error)
    * @return one row per group per rank:
    *         groupCols ++ (p, value, n, method['exact'|'kll']).
    *         Groups whose valueCol is ENTIRELY NULL are OMITTED — no row
    *         at any rank (count(v) = 0 routes to neither regime; there
    *         is no value to rank, and `percentile()` itself would return
    *         NULL). Downstream consumers that must distinguish a missing
    *         group from missing data should left-join this result back
    *         onto their group spine and treat an absent row as
    *         "no non-null values".
    */
  def grouped(df: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[Double], exactMaxRows: Long = 10000000L,
      k: Int = 200): DataFrame = {
    require(ps.nonEmpty, "at least one percentile rank required")
    require(ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentile ranks must be in [0, 1], got ${ps.mkString(", ")}")
    require(exactMaxRows >= 0, "exactMaxRows must be >= 0")
    graft.functions.Kll.register(df.sparkSession)
    val gcols = groupCols.map(col)
    val v = col(valueCol).cast("double")
    // global-group spelling: a constant key keeps one code path
    val (keyed, keys) =
      if (groupCols.nonEmpty) (df, groupCols)
      else (df.withColumn("_all", lit(1)), Seq("_all"))
    val kcols = keys.map(col)
    val counts = keyed.groupBy(kcols: _*).agg(count(v).as("_n"))
    def side(pred: Column): DataFrame =
      keyed.join(counts.filter(pred).select(kcols: _*), keys, "left_semi")
    val pArr = array(ps.map(lit): _*)
    def explodeRanks(agged: DataFrame, method: String): DataFrame =
      agged
        .select(kcols ++ Seq(col("_n"), posexplode(col("_q"))
          .as(Seq("_i", "value"))): _*)
        .select(kcols ++ Seq(
          element_at(pArr, col("_i") + 1).as("p"),
          col("value"), col("_n").as("n"), lit(method).as("method")): _*)
    val exact = explodeRanks(
      side(col("_n") <= exactMaxRows && col("_n") > 0)
        .groupBy(kcols: _*)
        .agg(count(v).as("_n"),
          expr(s"percentile(cast($valueCol as double), " +
            s"array(${ps.map(p => s"${p}D").mkString(",")}))").as("_q")),
      "exact")
    val sketch = explodeRanks(
      side(col("_n") > exactMaxRows)
        .groupBy(kcols: _*)
        .agg(count(v).as("_n"),
          expr(s"graft_kll_agg(cast($valueCol as double), $k)").as("_sk"))
        .withColumn("_q", array(ps.map(p =>
          expr(s"graft_kll_quantile(_sk, ${p}D)")): _*)),
      "kll")
    val out = exact.unionByName(sketch)
    if (groupCols.nonEmpty) out else out.drop("_all")
  }
}
