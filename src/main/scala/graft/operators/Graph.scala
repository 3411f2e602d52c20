package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.T

/** Link-graph analytics for corpus curation.
  *
  * Web-scale corpus pipelines weight document quality by the authority of
  * the HOST GRAPH (inter-site links): PageRank-family centrality over the
  * host-to-host edge list is the classic signal (the Common Crawl host
  * ranking shape). This module gives the engine that computational class —
  * iterative sparse matrix-vector products expressed as per-round
  * join + aggregate (the Pregel message shape) under the repo's
  * deterministic driver-loop regime (pinned rounds, per-round rounding,
  * checkpointed loop state — SURVEY §3.3), so results are
  * oracle-replayable as unrolled SQL and identical across engines,
  * reruns, and partitionings.
  */
object Graph {

  /** Weighted PageRank over an edge list `(src, dst, w)` with a PINNED
    * number of power iterations.
    *
    * Semantics: nodes = every distinct src or dst. r₀ = 1/N (rounded 9);
    * r_{t+1}(v) = round((1−d)/N + d·Σ_u r_t(u)·w(u,v)/W(u), 9) with
    * W(u) = Σ_v w(u,v). Per-round rounding to 9 decimals is the
    * trainQualityClassifier device: it re-syncs both engines' summation-
    * order noise (~1e-17) onto one grid every round, so an oracle can
    * replay the loop as unrolled CTE stages. Dangling nodes (no
    * out-edges) redistribute nothing — their mass leaks, the standard
    * simplification; strict stochastic callers add self-loops (host
    * graphs effectively always self-link).
    *
    * Scale: per iteration, ONE equi-join of the node-sized rank frame
    * against the edge list on src and ONE groupBy(dst) sum — both
    * partial-aggregated, shuffle volume edge-linear, no driver state but
    * the single node COUNT (agg→literal, §3.3). The rank frame is
    * localCheckpoint-ed each round so round t's plan never re-derives
    * rounds 0..t−1; the normalized edge frame is persisted for the loop
    * and both are released through [[T.releaseCaches]].
    *
    * Returns `(node, rank)` (rank double, 9-dp grid, Σ ≤ 1).
    */
  def pageRank(edges: DataFrame, iters: Int = 3,
      damping: Double = 0.85): DataFrame = {
    val nodes = T.cached(
      edges.select(col("src").as("node"))
        .union(edges.select(col("dst"))).distinct())
    val n = nodes.count().toDouble // 1 long to the driver (§3.3)
    val outW = edges.groupBy("src").agg(sum("w").as("w_out"))
    val e = T.cached(edges.join(outW, "src")
      .select(col("src"), col("dst"),
        (col("w").cast("double") / col("w_out").cast("double")).as("frac")))
    var ranks = nodes.select(col("node"),
      round(lit(1.0) / lit(n), 9).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = ranks.join(e, col("node") === col("src"))
        .groupBy(col("dst"))
        .agg(sum(col("rank") * col("frac")).as("m"))
      ranks = T.checkpointed(
        nodes.join(contrib, col("node") === col("dst"), "left")
          .select(col("node"),
            round(lit(1.0 - damping) / lit(n) +
              lit(damping) * coalesce(col("m"), lit(0.0)), 9).as("rank")))
    }
    ranks
  }
}
