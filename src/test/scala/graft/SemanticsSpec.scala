package graft

import java.sql.Timestamp

import org.apache.spark.sql.catalyst.expressions.{Expression => CExpr}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.ops.{Clamp, CentroidAgg, GeoMeanAgg, T}

/** T1 semantic pin-tests for the determinism traps and custom machinery
  * (SURVEY.md §7.3/§7.4): ns-timestamp read, session-window gap boundary,
  * as-of strictly-earlier ordering, Clamp expression (interpreted +
  * codegen), typed Aggregators, hole interpolation.
  */
class SemanticsSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  test("events ns-timestamp fixture reads as µs TIMESTAMP_NTZ (SURVEY §1.2 trap)") {
    val e = T.t(spark, sf(), "events")
    // NTZ by design: tz-adjusted TimestampType would round-trip through
    // parquet as TIMESTAMPTZ and break type parity with the naive oracle.
    assert(e.schema("ts").dataType === org.apache.spark.sql.types.TimestampNTZType)
    assert(e.count() === 1000)
    // date_trunc to ms then µs-remainder must be zero
    val bad = e.filter(
      unix_micros(col("ts").cast("timestamp")) -
        unix_micros(date_trunc("millisecond", col("ts").cast("timestamp"))) >= 1000)
    assert(bad.count() === 0)
  }

  test("session_window gap boundary is INCLUSIVE (merge at exactly gap)") {
    import spark.implicits._
    def sessions(ts2: String): Long =
      Seq((1L, Timestamp.valueOf("2024-01-01 00:00:00")),
        (1L, Timestamp.valueOf(ts2))).toDF("uid", "ts")
        .groupBy(col("uid"), session_window(col("ts"), "30 minutes"))
        .count().count()
    assert(sessions("2024-01-01 00:30:00") === 1)     // == gap → merged
    assert(sessions("2024-01-01 00:30:00.001") === 2) // > gap → new session
    assert(sessions("2024-01-01 00:29:59") === 1)     // < gap → merged
  }

  test("as-of: same-timestamp view with smaller event_id counts as earlier") {
    import spark.implicits._
    val ts = Timestamp.valueOf("2024-01-01 10:00:00")
    val df = Seq(
      (0L, 1L, "purchase", ts), // before the view in (ts, event_id) order
      (1L, 1L, "view", ts),
      (2L, 1L, "purchase", ts)  // after the view → sees it
    ).toDF("event_id", "user_id", "event_type", "ts_ms")
    val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val out = df.withColumn("prev_view_ts",
        max(when(col("event_type") === "view", col("ts_ms"))).over(w))
      .filter(col("event_type") === "purchase")
      .select("event_id", "prev_view_ts")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(0L).isEmpty)
    assert(out(2L).contains(ts))
  }

  test("Clamp expression: interpreted eval, codegen path, and null propagation") {
    import spark.implicits._
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_clamp", (args: Seq[CExpr]) => Clamp(args(0), args(1), args(2)),
      "scala_udf")
    val df = Seq(Some(-5.0), Some(0.5), Some(99.0), None).toDF("x")
    val got = df.select(expr("graft_clamp(x, 0.0D, 1.0D)").as("c"))
      .collect().map(r => Option(r.get(0))).toSeq
    assert(got === Seq(Some(0.0), Some(0.5), Some(1.0), None))
    // must agree with the composed built-in form (the oracle's spelling)
    val agree = df.na.drop().select(
      (expr("graft_clamp(x, 0.0D, 1.0D)") === least(greatest(col("x"), lit(0.0)), lit(1.0))).as("ok"))
      .collect().forall(_.getBoolean(0))
    assert(agree)
  }

  test("GeoMeanAgg: geometric mean of (2, 8) is 4; partition-order independent") {
    import spark.implicits._
    val gm = udaf(GeoMeanAgg)
    val v = Seq(2.0, 8.0).toDF("x").repartition(4)
      .agg(gm(col("x"))).head().getDouble(0)
    assert(math.abs(v - 4.0) < 1e-9)
  }

  test("GeoMeanAgg: non-positive input fails with a clear domain error") {
    import spark.implicits._
    val gm = udaf(GeoMeanAgg)
    val e = intercept[Exception] {
      Seq(2.0, 0.0).toDF("x").agg(gm(col("x"))).head()
    }
    assert(e.getMessage != null)
    // the root cause carries the domain message, not a NumberFormatException
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(e).exists(c =>
      Option(c.getMessage).exists(_.contains("requires positive inputs"))))
  }

  test("CentroidAgg: element-wise mean of [1,3] and [3,5] is [2,4]") {
    import spark.implicits._
    val cen = udaf(CentroidAgg)
    val v = Seq(Seq(1f, 3f), Seq(3f, 5f)).toDF("e").repartition(3)
      .agg(cen(col("e"))).head().getSeq[Double](0)
    assert(v === Seq(2.0, 4.0))
  }

  test("interpolate: hole filled with avg of neighbors") {
    import spark.implicits._
    val df = Seq((1L, 1L, 1.0), (1L, 2L, 0.2), (1L, 3L, 3.0))
      .toDF("user_id", "event_id", "value")
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val filled = df
      .withColumn("v0", expr("CASE WHEN value < 0.5 THEN NULL ELSE value END"))
      .select(col("event_id"),
        coalesce(col("v0"), (lag(col("v0"), 1).over(w) + lead(col("v0"), 1).over(w)) / 2.0)
          .as("filled"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(filled(2L) === 2.0)
    assert(filled(1L) === 1.0)
  }

  test("otsu threshold: single row, classes partition the input") {
    val out = SparkEntry.queries("x_flex_threshold_otsu")(spark, sf()).collect()
    assert(out.length === 1)
    val total = T.t(spark, sf(), "events").count()
    assert(out(0).getAs[Long]("n_below") + out(0).getAs[Long]("n_above") === total)
  }

  test("normalizeTs: ns shim fires only for known ts columns; LTZ re-cast; bigints untouched") {
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    // 1700000000123456789 ns = 2023-11-14 22:13:20.123456 UTC
    val df = Seq((1L, 1700000000123456789L, 42L)).toDF("id", "l_shipdate", "other")
      .withColumn("evt", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    val out = T.normalizeTs(df)
    assert(out.schema("l_shipdate").dataType === TimestampNTZType)
    assert(out.schema("other").dataType === LongType)
    assert(out.schema("id").dataType === LongType)
    assert(out.schema("evt").dataType === TimestampNTZType)
    val r = out.select(col("l_shipdate").cast("string")).collect()(0).getString(0)
    assert(r === "2023-11-14 22:13:20.123456")
  }

  test("t_retention: every user is active on their cohort day (offset-0 cells cover all users)") {
    val ret = SparkEntry.queries("t_retention")(spark, sf())
    val zeroUsers = ret.filter(col("day_offset") === 0L)
      .agg(sum(col("n_users"))).collect()(0).getLong(0)
    val users = T.t(spark, sf(), "events").select("user_id").distinct().count()
    assert(zeroUsers === users)
    // offsets are bounded by the fixture's 30-day span and never negative
    val range = ret.agg(min(col("day_offset")), max(col("day_offset"))).collect()(0)
    assert(range.getLong(0) === 0L)
    assert(range.getLong(1) < 31L)
  }

  test("a_skew_twophase: the salted two-phase plan is bit-equal to the direct groupBy") {
    val salted = SparkEntry.queries("a_skew_twophase")(spark, sf())
    val direct = T.t(spark, sf(), "lineitem")
      .groupBy("l_returnflag")
      .agg(T.decOut(sum(T.dec(col("l_quantity")))).as("sum_qty"),
        T.decOut(sum(T.dec(col("l_extendedprice")))).as("sum_price"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
    assert(salted.collect().toSeq === direct.collect().toSeq)
  }
}
