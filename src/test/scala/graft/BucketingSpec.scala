package graft

import org.apache.spark.sql.functions._

import graft.sources.Bucketing
import graft.ops.T

/** T1 specs for bucketed co-located joins: the write-once-shuffle-never
  * claim is asserted on the executed plan, not just documented.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed join of two co-bucketed tables plans with zero Exchange") {
    val cust = T.t(spark, sf(), "customer").select("c_custkey", "c_name")
    val ords = T.t(spark, sf(), "orders").select("o_custkey", "o_totalprice")
      .withColumnRenamed("o_custkey", "c_custkey")
    Bucketing.writeBucketed(cust, "b_cust", "c_custkey", 4)
    Bucketing.writeBucketed(ords, "b_ords", "c_custkey", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-join path: a broadcast would also avoid the
      // Exchange but wouldn't prove bucket co-location
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketJoin(spark, "b_cust", "b_ords", "c_custkey")
      val expected = cust.join(ords, Seq("c_custkey")).count()
      assert(joined.count() === expected)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_cust")
      spark.sql("DROP TABLE IF EXISTS b_ords")
    }
  }

  test("partitioned parquet sink prunes partitions at scan (PartitionFilters)") {
    // The 100 TB layout: fact tables land partitioned by a low-cardinality
    // key; a filtered read must touch ONLY matching directories — visible
    // as a PartitionFilters entry and as partitions pruned from the scan.
    val dir = java.nio.file.Files.createTempDirectory("partsink").toString
    val ev = T.evMs(spark, sf())
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    ev.write.mode("overwrite").partitionBy("event_type").parquet(s"$dir/ev")
    val read = spark.read.parquet(s"$dir/ev").filter(col("event_type") === "click")
    val expected = ev.filter(col("event_type") === "click").count()
    assert(read.count() === expected)
    assert(expected > 0)
    val scan = read.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters: [") &&
      scan.replaceAll("\\s", "").contains("PartitionFilters:[isnotnull(event_type"),
      s"scan does not prune on the partition column:\n$scan")
    // the pruned scan must not read the partition column from data files
    assert(!scan.contains("ReadSchema: struct<event_id:bigint,user_id:bigint,event_type"),
      s"partition column leaked into ReadSchema:\n$scan")
  }
}
