package graft

import org.apache.spark.sql.functions._

/** T1 checks for functions/Freq (graded by `a_freq_topk`): the
  * estimation-mode properties the exact-regime oracle can't see — a
  * purging sketch still brackets every true count in [lb, ub], misses no
  * true heavy hitter (NO_FALSE_NEGATIVES), and the per-group merge
  * lifecycle equals a single global build in the exact regime.
  */
class FreqSpec extends SparkSpec {

  test("estimation mode: tiny map purges, but [lb, ub] brackets every true count") {
    graft.functions.Freq.register(spark)
    import spark.implicits._
    // 3 heavy keys (400/300/200) over a 400-singleton tail, map of 16
    val rows = Seq.tabulate(400)(_ => 1L) ++ Seq.tabulate(300)(_ => 2L) ++
      Seq.tabulate(200)(_ => 3L) ++ (100L until 500L)
    val truth = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val sk = rows.toDF("v").agg(expr("graft_freq_agg(v, 16)").as("sk"))
    val err = sk.select(expr("graft_freq_maxerr(sk)")).head().getLong(0)
    assert(err > 0, "tail must force purges (else this test grades nothing)")
    val items = sk
      .select(explode(expr("graft_freq_items(sk)")).as("r"))
      .select(col("r.item"), col("r.est"), col("r.lb"), col("r.ub"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every emitted estimate brackets the true count
    items.foreach { case (item, est, lb, ub) =>
      val c = truth(item)
      assert(lb <= c && c <= ub, s"item $item: true $c outside [$lb, $ub]")
      assert(est >= lb && est <= ub)
    }
    // no false negatives: every key whose true count exceeds the error
    // bound must be present
    val emitted = items.map(_._1).toSet
    truth.filter(_._2 > err).keys.foreach { k =>
      assert(emitted.contains(k), s"true heavy hitter $k (count ${truth(k)}) missing")
    }
  }

  test("merge lifecycle equals one global build in the exact regime") {
    graft.functions.Freq.register(spark)
    import spark.implicits._
    val df = (1L to 1000L).map(v => (v % 7, v % 50)).toDF("g", "v")
    val perGroup = df.groupBy("g").agg(expr("graft_freq_agg(v, 256)").as("sk"))
    val merged = perGroup.agg(expr("graft_freq_merge(sk, 256)").as("sk"))
      .select(expr("graft_freq_maxerr(sk)").as("err"),
        explode(expr("graft_freq_items(sk)")).as("r"))
      .select(col("err"), col("r.item"), col("r.est"))
      .collect()
    assert(merged.head.getLong(0) === 0L, "50 distinct « 256 must stay exact")
    val got = merged.map(r => r.getLong(1) -> r.getLong(2)).toMap
    val want = df.groupBy("v").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("a_freq_topk on the fixture runs in the exact regime (max_err == 0)") {
    val r = SparkEntry.queries("a_freq_topk")(spark, sf()).collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getLong(2) === 0L))
    // and the emitted estimates equal exact per-user counts
    val exact = graft.ops.T.t(spark, sf(), "events")
      .groupBy("user_id").count().collect()
      .map(r2 => r2.getLong(0) -> r2.getLong(1)).toMap
    r.foreach(row => assert(exact(row.getLong(0)) === row.getLong(1)))
  }
}
