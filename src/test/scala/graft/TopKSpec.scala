package graft

import org.apache.spark.sql.functions._

import graft.ops.T
import graft.plans.TopK

/** The custom top-k-per-key operator (LogicalPlan + Strategy + SparkPlan)
  * must return the exact window-formulation answer while planning NO sort.
  */
class TopKSpec extends SparkSpec {

  test("perKey equals the window formulation on a unique order column") {
    val orders = T.t(spark, sf(), "orders")
    val got = TopK.perKey(orders, Seq("o_orderstatus"), "o_orderkey", 5)
      .select("o_orderstatus", "o_orderkey").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderstatus").orderBy(col("o_orderkey").desc)
    val expect = orders
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("o_orderstatus", "o_orderkey").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("perKey ascending and k larger than the group") {
    import spark.implicits._
    val df = Seq(
      ("a", 3L), ("a", 1L), ("a", 2L),
      ("b", 10L)).toDF("key", "v")
    val top2 = TopK.perKey(df, Seq("key"), "v", 2, desc = false)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(top2 === Set(("a", 1L), ("a", 2L), ("b", 10L)))
  }

  test("plan: custom exec node, hash exchange on the key, and NO sort") {
    val orders = T.t(spark, sf(), "orders")
    val df = TopK.perKey(orders, Seq("o_orderstatus"), "o_totalprice", 3)
    df.count() // force planning through AQE
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(plan.contains("Exchange hashpartitioning(o_orderstatus"), plan)
    assert(!plan.contains("Sort "), s"window-style sort crept back in:\n$plan")
  }
}
