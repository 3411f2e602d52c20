package graft

/** Scale-critical plan-shape guards: the dedup/ANN candidate-generation
  * joins must stay equi-joins (shuffle or broadcast-HASH) — a regression
  * to BroadcastNestedLoopJoin or CartesianProduct is the O(n²) failure
  * mode the round-1→2 rewrites removed, so it is asserted on the executed
  * plan, not just documented. (x_dedup_embcos and j_cross/j_theta_band
  * are exhaustive BY CONTRACT and excluded.)
  */
class PlanShapeSpec extends SparkSpec {

  private val mustBeEquiJoin =
    Seq("x_dedup_minhash", "x_dedup_simhash", "x_dedup_jaccard",
      "x_dedup_ngram", "x_ann_bucket_topk", "x_ann_indexed_topk",
      "x_text_vocab", "x_dedup_substring", "x_dedup_spanremove",
      "x_dedup_decontam")

  mustBeEquiJoin.foreach { key =>
    test(s"$key plans no cartesian / nested-loop join") {
      val plan = SparkEntry.queries(key)(spark, sf())
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$key:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$key:\n$plan")
    }
  }

  test("x_ann_bucket_topk candidate join is a broadcast-hash join on the bucket key") {
    // The probe side is a fixed, tiny set by construction — the bucket
    // equi-join must broadcast it, never shuffle the corpus side.
    val plan = SparkEntry.queries("x_ann_bucket_topk")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected BHJ:\n$plan")
  }

  test("x_ann_indexed_topk searches the bucketed index with no corpus sign pass") {
    // The graded query's search half must read the in-query-built index
    // as a bucketed table scan and derive sign bits ONLY for the
    // broadcast probes — the corpus signature pass was paid at build.
    val df = SparkEntry.queries("x_ann_indexed_topk")(spark, sf())
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"), s"index scan not bucketed:\n$plan")
    val signStages = "shiftright".r
      .findAllIn(df.queryExecution.optimizedPlan.toString).size
    assert(signStages === 1, s"corpus sign pass in the search plan:\n$plan")
  }

  test("x_dedup_jaccard pair join shuffles (no corpus-sized broadcast)") {
    // The masks relation is corpus-sized: broadcasting it OOMs at scale.
    // Both pair-join inputs must arrive via shuffle exchange.
    val df = SparkEntry.queries("x_dedup_jaccard")(spark, sf())
    val plan = df.queryExecution.executedPlan.toString
    val pairJoinBroadcast =
      "BroadcastHashJoin.*\\(lang".r.findFirstIn(plan) // lang is the pair-join key
    assert(pairJoinBroadcast.isEmpty,
      s"pair join broadcasts the corpus-sized masks relation:\n$plan")
  }
}
