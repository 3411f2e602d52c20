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

  /** Per-node TRIANGLE counts over an undirected simple graph `(u, v)` —
    * the local-clustering / community-structure signal next to PageRank
    * (authority) and connected components (duplication islands); web
    * curation uses it to spot link farms (abnormally triangle-dense
    * hosts) and isolated spam stars (triangle-free hubs).
    *
    * Algorithm: DEGREE-ORDERED wedge counting (the published scalable
    * shape — Suri & Vassilvitskii's MapReduce triangle count): orient
    * every edge from its lower-(degree, id) endpoint to the higher, form
    * wedges only at each node's OUT-neighbors, and close each wedge with
    * a semi-join against the canonical edge set. Orientation makes every
    * triangle counted from exactly one vertex AND bounds per-node wedge
    * fan-out by the effective degree O(√E) — a raw a<b<c id-ordering is
    * result-identical (the oracle replays that simple form) but lets one
    * low-id high-degree hub generate deg² wedges; at a 100 TB host graph
    * the hub IS the common case, so orientation is the difference
    * between edge^1.5 and edge·hub_degree work. Shuffles: degree agg,
    * orientation join, one self-join on wedge center, one closure
    * semi-join — all equi-joins on node keys, no cartesian anywhere.
    *
    * Returns `(node, n_triangles)` with zero-count nodes included.
    */
  def triangleCount(edges: DataFrame): DataFrame = {
    // canonical simple undirected edge set: a < b, loops dropped
    val canon = T.cached(edges
      .select(least(col("u"), col("v")).as("a"),
        greatest(col("u"), col("v")).as("b"))
      .filter(col("a") =!= col("b")).distinct())
    val nodes = canon.select(col("a").as("n"))
      .union(canon.select(col("b"))).distinct()
    val deg = nodes.join(
      canon.select(col("a").as("n")).union(canon.select(col("b")))
        .groupBy("n").agg(count(lit(1)).as("deg")), Seq("n"))
    // orient each edge low→high by (deg, id); the total (deg, id) order
    // is what makes the orientation acyclic and every wedge unique
    val oriented = canon
      .join(deg.select(col("n").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("deg").as("db")), Seq("b"))
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("src"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("dst"))
    // wedges centered at src between two of its out-neighbors (p < q
    // dedups the unordered neighbor pair), closed by a canonical edge
    val o1 = oriented.select(col("src"), col("dst").as("p"))
    val o2 = oriented.select(col("src"), col("dst").as("q"))
    val tri = o1.join(o2, Seq("src")).filter(col("p") < col("q"))
      .join(canon,
        least(col("p"), col("q")) === col("a") &&
          greatest(col("p"), col("q")) === col("b"), "left_semi")
    val perNode = tri
      .select(explode(array(col("src"), col("p"), col("q"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("n_triangles"))
    nodes.join(perNode, Seq("n"), "left")
      .select(col("n").as("node"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }

  /** COMMON-NEIGHBOR candidates over an undirected graph `(u, v)` — the
    * link-prediction / entity-merge primitive next to triangles: two
    * nodes that are NOT adjacent but share many neighbors are the
    * canonical "should probably be linked/merged" pair (friend
    * suggestion, near-duplicate clusters that banding narrowly missed,
    * citation gaps). Returns `(u, v, n_common)` for every non-adjacent
    * pair with at least `minCommon` shared neighbors, u < v canonical.
    *
    * Algorithm: wedge enumeration — one self-join of the adjacency list
    * on the wedge CENTER (every shared neighbor contributes exactly one
    * (center, u<v) wedge), then a count per endpoint pair and an
    * anti-join against the edge set to keep only non-edges. Work is
    * Σ deg(w)² over centers, the same hub hazard triangleCount's
    * orientation tames — here the pair COUNT is the output, so
    * orientation can't halve it; at a 100 TB host graph you cap or
    * sample hub centers instead (deg(w) ≤ D bound ⇒ work ≤ |E|·D), and
    * every shuffle is an equi-join on node keys — no cartesian anywhere.
    */
  def commonNeighbors(edges: DataFrame, minCommon: Int = 1): DataFrame = {
    val canon = T.cached(edges
      .select(least(col("u"), col("v")).as("a"),
        greatest(col("u"), col("v")).as("b"))
      .filter(col("a") =!= col("b")).distinct())
    val adj = canon.select(col("a").as("w"), col("b").as("n"))
      .union(canon.select(col("b").as("w"), col("a").as("n")))
    val wedges = adj.select(col("w"), col("n").as("u"))
      .join(adj.select(col("w"), col("n").as("v")), Seq("w"))
      .filter(col("u") < col("v"))
    wedges.groupBy("u", "v").agg(count(lit(1)).as("n_common"))
      .join(canon, col("u") === col("a") && col("v") === col("b"),
        "left_anti")
      .filter(col("n_common") >= minCommon)
  }

  /** Multi-source BFS hop distance over an undirected graph `(u, v)` —
    * the reachability/radius primitive next to components (is a page
    * within k link-hops of a trusted seed set? how deep does a duplicate
    * chain run?). `sources` is one column `node`.
    *
    * Algorithm: FRONTIER-PROPAGATED label relaxation. In an unweighted
    * graph a node's distance is FINAL the first round it is reached, so
    * each round joins the edge list against only the NEWLY-settled
    * frontier — per-round shuffle is frontier-incident-edge-sized, and
    * the total work over the whole run is one pass over each edge per
    * direction (the textbook parallel-BFS bound), not rounds×edges as a
    * full relaxation would pay. Termination = empty frontier, probed by
    * the same lazy-localCheckpoint + count device as
    * `Dedup.connectedComponents` (one job per round). The settled frame
    * is node-sized; per-round plans stay flat via checkpointing.
    *
    * Result: `(node, hops)` for every node of the graph; unreachable
    * nodes carry NULL hops. An oracle replays the simple full-relaxation
    * form (min over neighbors each round) — result-identical because
    * first-reach minimality makes relaxation and frontier propagation
    * converge to the same fixpoint.
    */
  def bfsHops(edges: DataFrame, sources: DataFrame,
      maxIter: Int = 50): DataFrame = {
    val e = T.cached(edges
      .select(explode(array(
        struct(col("u").cast("long").as("s"), col("v").cast("long").as("t")),
        struct(col("v").cast("long").as("s"), col("u").cast("long").as("t"))))
        .as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"))
      .filter(col("s") =!= col("t")).distinct())
    val nodes = T.cached(e.select(col("s").as("node")).distinct())
    val src = sources.select(col("node").cast("long").as("node")).distinct()
    // settled = (node, hops) so far. The frontier (nodes settled LAST
    // round) is a FILTER over the checkpointed settled frame — hops ==
    // round−1 — so each round is exactly ONE Spark job: the union of
    // settled and the newly-reached nodes materializes under a lazy
    // localCheckpoint + count, and the same count doubles as the
    // termination probe (count unchanged ⇒ empty frontier). This is the
    // connectedComponents one-job-per-round discipline; a two-frame
    // settled/next spelling measured ~2× the wall at fixture scale
    // purely in per-round scheduling.
    var settled = T.checkpointed(
      nodes.join(src, Seq("node"), "left_semi")
        .select(col("node"), lit(0L).as("hops")))
    var nSettled = settled.count()
    var round = 0
    var done = nSettled == 0L
    while (!done && round < maxIter) {
      round += 1
      val frontier = settled.filter(col("hops") === (round - 1).toLong)
      // settled ∪ raw frontier messages, one min-agg: BFS first-reach
      // minimality makes min(settled.hops, message hops) == settled.hops
      // for every already-settled node (its hops ≤ round−1 < round), so
      // this equals the anti-join+union spelling while costing ONE
      // exchange (the union groupBy) instead of the reached-agg PLUS
      // the anti-join's two shuffled sides per round
      val union = T.checkpointed(settled.unionByName(e
          .join(frontier.select(col("node").as("s")), "s")
          .select(col("t").as("node"), lit(round.toLong).as("hops")))
        .groupBy("node").agg(min("hops").as("hops")))
      val n2 = union.count() // one job: materialize + termination probe
      done = n2 == nSettled
      T.freeCheckpoint(settled)
      settled = union
      nSettled = n2
    }
    if (!done)
      throw new IllegalStateException(
        s"bfsHops did not settle in $maxIter rounds — the graph's " +
          "source-eccentricity exceeds maxIter; raise it rather than " +
          "consume partial (wrong) hop counts (the connectedComponents " +
          "posture: silent truncation has no signal)")
    nodes.join(settled, Seq("node"), "left")
      .select(col("node"), col("hops"))
  }

  /** k-CORE of an undirected simple graph `(u, v)`: the maximal subgraph
    * in which every node has degree ≥ k — the standard density filter
    * for link graphs (spam farms and boilerplate-link rings live in high
    * cores; pendant chains and isolated pages peel away). Returns the
    * surviving `(node, core_deg)` with each node's degree INSIDE the
    * core.
    *
    * Algorithm: iterative peeling to a fixpoint — drop every node whose
    * current degree is < k, drop edges incident to dropped nodes,
    * repeat. Each round is one degree aggregation + one semi-join on
    * both endpoints (edge-linear, partial-aggregated); the round count
    * is the peel depth of the graph (the longest chain hanging off the
    * core), not the node count. Edge state is checkpointed per round so
    * plans stay flat (the `connectedComponents` device); termination is
    * the same single-job count probe. The fixpoint is unique (the k-core
    * is order-independent), so an oracle can replay the same peeling as
    * unrolled rounds — too few unrolled rounds mismatches LOUDLY rather
    * than truncating silently.
    */
  def kCore(edges: DataFrame, k: Int, maxIter: Int = 50): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    var e = T.checkpointed(edges
      .select(least(col("u"), col("v")).cast("long").as("a"),
        greatest(col("u"), col("v")).cast("long").as("b"))
      .filter(col("a") =!= col("b")).distinct())
    var nEdges = e.count()
    var changed = true
    var round = 0
    while (changed && round < maxIter) {
      round += 1
      val deg = e.select(col("a").as("n")).union(e.select(col("b")))
        .groupBy("n").agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select("n")
      val pruned = T.checkpointed(
        e.join(keep.select(col("n").as("a")), Seq("a"), "left_semi")
          .join(keep.select(col("n").as("b")), Seq("b"), "left_semi")
          .select("a", "b"))
      val nPruned = pruned.count() // one job: materialize + converge probe
      changed = nPruned != nEdges
      T.freeCheckpoint(e)
      e = pruned
      nEdges = nPruned
    }
    if (changed)
      throw new IllegalStateException(
        s"kCore did not reach its fixpoint in $maxIter peel rounds — " +
          "the peel depth exceeds maxIter; raise it rather than consume " +
          "a partially-peeled (superset) core")
    val out = e.select(col("a").as("n")).union(e.select(col("b")))
      .groupBy("n").agg(count(lit(1)).as("core_deg"))
      .select(col("n").as("node"), col("core_deg"))
    out
  }
}
