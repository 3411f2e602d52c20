package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.T

/** Graph-side completion of the dedup family: turn a near-duplicate PAIR
  * relation (what the LSH stages emit) into CLUSTER assignments (what a
  * curation pipeline actually consumes — "keep one canonical doc per
  * duplicate cluster"). Pairs only say a~b; transitive chains a~b~c must
  * collapse to one cluster, which is connected components over the pair
  * graph.
  *
  * Algorithm: iterative min-label propagation. Every node starts with
  * label = min(own id, smallest neighbor id); each round replaces the
  * label with the minimum label in the closed neighborhood; fixpoint =
  * every node carries its component's minimum id. This is the standard
  * large-graph CC formulation (the simple variant of map-reduce
  * star-contraction): each round is ONE shuffle linear in |edges|, and
  * rounds needed = graph diameter. LSH duplicate clusters are near-
  * cliques (diameter 1-2), so 2-3 rounds converge; a documented
  * `maxIter` bounds adversarial chains. The driver loop iterates over
  * ACTIONS (the §3.3 driver-loop pattern, like register_volumes'
  * refinement) — per-round data never leaves the executors; the driver
  * sees only the one-row "did any label change" probe.
  *
  * Scale (100 TB): no broadcast, no cross product — every round is a
  * self-equi-join on node id followed by a min-agg, both shuffling on
  * the id. Hot keys ARE real duplicate clusters (bounded by the pair
  * stage's output). Superseded label frames are unpersisted each round,
  * so peak storage is 2×|nodes| + |edges|.
  */
object Dedup {

  /** Connected components of the undirected pair graph.
    *
    * @param pairs frame with long columns `a_id`, `b_id` (one row per
    *              near-duplicate pair; direction irrelevant)
    * @param maxIter safety valve, NOT a truncation: a graph needing more
    *              rounds than this THROWS rather than emitting partial
    *              (wrong) cluster labels — silent non-convergence would
    *              split long duplicate chains with no signal, diverging
    *              from the transitive-closure semantics the oracle
    *              computes. Each round is one cheap edge-linear shuffle,
    *              so the default comfortably covers any real pair graph
    *              (rounds needed = diameter; LSH clusters are 1-3).
    * @param jumpAfter defer the pointer jump until the END of 0-based
    *              round `jumpAfter − 1` (the guard `iter + 1 >= jumpAfter`
    *              runs after round `iter`'s propagation): a graph that
    *              converges within `jumpAfter` propagation rounds never
    *              pays for a jump. It remains the
    *              label-of-label composition that halves remaining chain
    *              depth per round. Deferred because the jump is pure
    *              overhead on graphs that converge first — LSH duplicate
    *              clusters are near-cliques needing ≤ jumpAfter rounds, so
    *              the default makes the common case jump-free while a
    *              pathological chain still finishes in O(log diameter)
    *              rounds after the warm-up.
    * @return (doc_id, cluster_id, n_members): every node that appears in
    *         a pair, its component's minimum id, and the component size —
    *         deterministic, ordered by doc_id
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 50,
      jumpAfter: Int = 2, seed: Option[DataFrame] = None): DataFrame = {
    val labels = ccLabels(pairs, maxIter, jumpAfter, seed)
    // Component sizes via agg + join, NOT a count-over-window: a window
    // partition is indivisible — one degenerate giant component would
    // put ALL its rows in a single buffering task (the window must
    // materialize the partition before emitting). The agg partial-
    // combines map-side (the hot label collapses to one row per task
    // before the shuffle), the sizes frame is component-count-sized (so
    // Spark broadcasts it when small and AQE can split the probe side
    // when it is not), and the labels rows stream through the join
    // without ever concentrating — the 100×-safe spelling.
    val sizes = labels.groupBy("lab").agg(count(lit(1)).as("n_members"))
    labels.join(sizes, "lab")
      .select(col("u").as("doc_id"), col("lab").as("cluster_id"),
        col("n_members"))
      .orderBy("doc_id")
  }

  /** Exact sum of the current label frame — the convergence probe. Label
    * propagation is pointwise monotone non-increasing, so two consecutive
    * rounds have equal sums iff the labels are pointwise equal. The sum
    * is exact: decimal(38,0) holds ~1e38, and any real graph is below
    * ~1e19 rows × max-long labels. The ONE aggregate job doubles as the
    * round's checkpoint materialization (the former spelling needed the
    * per-round old-vs-new join just to feed a changed-rows count).
    */
  private def labSum(labels: DataFrame): Option[java.math.BigDecimal] =
    Option(labels.agg(sum(col("lab").cast("decimal(38,0)"))).head.getDecimal(0))

  /** Value equality of two probe sums (BigDecimal.equals is scale-
    * sensitive; compareTo is the value compare). None = empty graph.
    */
  private def ccSumEq(a: Option[java.math.BigDecimal],
      b: Option[java.math.BigDecimal]): Boolean = (a, b) match {
    case (Some(x), Some(y)) => x.compareTo(y) == 0
    case (None, None) => true
    case _ => false
  }

  /** The label fixpoint of [[connectedComponents]] without the trailing
    * size join / global sort: (u, lab) for every node in a pair, lab =
    * its component's minimum id. Callers that feed the labels into a
    * further join (incremental seeding, contracted-graph member
    * re-attachment) use this directly and skip two exchanges + a sort.
    */
  private[graft] def ccLabels(pairs: DataFrame, maxIter: Int = 50,
      jumpAfter: Int = 2, seed: Option[DataFrame] = None): DataFrame = {
    // Both directions from ONE pass over pairs (a union of two selects
    // would run the upstream pair-generation plan twice inside the same
    // materialization — for LSH pair inputs that is the expensive part).
    // T.cached: registered for post-materialization release by the
    // harness mains (the query-lambda contract returns a lazy frame, so
    // unpersist-before-return would forfeit the reuse it exists for).
    // repartition(col("v")) BEFORE the cache: every propagation round
    // joins edges on v, so hash-partitioning the cached frame once lets
    // the planner co-partition each round's node-sized label frame to it
    // instead of re-shuffling the EDGE-sized side every round (guide
    // §2.4 — one exchange, paid once). The count is deliberately NOT
    // pinned: AQE sizes it from actual edge bytes (tiny fixture → few
    // partitions → few tasks per round; 100 TB → advisory-sized), which
    // is the scale-adaptive layout the round loop then inherits.
    val edges = T.cached(pairs
      .select(explode(array(
        struct(col("a_id").cast("long").as("u"), col("b_id").cast("long").as("v")),
        struct(col("b_id").cast("long").as("u"), col("a_id").cast("long").as("v"))))
        .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .repartition(col("v")))
    // Optional INCREMENTAL seed: labels of a previous run over a
    // subgraph, folded into the initialization with least(). Label
    // propagation is monotone toward each component's min MEMBER id and
    // every seed label IS a member id of its (possibly since-merged)
    // component, so any seed converges to the identical fixpoint — just
    // in fewer rounds, because unchanged regions START at their answer.
    // The incremental-maintenance verb: re-cluster after a shard lands
    // without paying the full graph's diameter again.
    val init0 = {
      val init = edges.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("lab"))
      seed.fold(init) { sd =>
        init.join(sd.select(col("u"), col("lab").as("seed_lab")), Seq("u"), "left")
          .select(col("u"),
            least(col("lab"), coalesce(col("seed_lab"), col("lab"))).as("lab"))
      }
    }
    // Checkpointed frames the CURRENT `labels` plan still reads; each
    // round frees the previous round's set once its own materialization
    // no longer needs them (lineage is truncated, so a superseded frame
    // can never be demanded again).
    var labels = T.checkpointed(init0)
    var live: List[DataFrame] = labels :: Nil
    var prevSum = labSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // One round = UNION + min-agg, not join + groupBy + re-join: the
      // new label min(own, neighborhood) is the min over (u, own lab) ∪
      // (u, each neighbor's lab), so folding both into one aggregate
      // removes the per-round nbrMin⋈labels join and its node-sized
      // exchange (the x_graph_bfs settled∪messages device). Nodes with
      // no surviving neighbor rows keep their label via the union arm —
      // the old left join's coalesce, for free.
      val nbr = edges
        .join(labels.select(col("u").as("v"), col("lab").as("vlab")), "v")
        .select(col("u"), col("vlab").as("lab"))
      // localCheckpoint (lazy) + ONE aggregate: the round's single Spark
      // job both materializes the new label frame — blocks persist,
      // lineage truncates, so per-round plans stay FLAT instead of
      // deepening (re-analysis + scheduling of a growing plan dominated
      // wall time on small graphs) — and returns the label sum whose
      // equality with the previous round's is the convergence bit
      // (labSum's monotonicity argument). The former spelling kept the
      // per-row old label through a join just to count changed rows.
      val step = T.checkpointed(
        nbr.union(labels).groupBy("u").agg(min(col("lab")).as("lab")))
      val s = labSum(step)
      converged = ccSumEq(s, prevSum)
      prevSum = s
      var nextLive: List[DataFrame] = step :: Nil
      labels = step
      if (!converged && iter + 1 >= jumpAfter) {
        // Pointer jump (label-of-label): u's label is itself a node, so
        // compose one hop — lab'(u) = min(lab(u), lab(lab(u))). Halves
        // the remaining chain depth each round, turning O(diameter)
        // edge-join rounds into O(log diameter) — the lever that matters
        // when the EDGE join (corpus-sized) is the per-round cost and a
        // pathological chain would otherwise mean diameter extra passes.
        // Deferred until round `jumpAfter`: LSH near-dup clusters are
        // near-cliques (diameter 1-3) that converge before the jump
        // would ever fire, so the common case pays zero extra jobs.
        // Checkpointed + materialized here (the one extra job, on jump
        // rounds only): the jumped frame is consumed TWICE next round
        // (the nbr join side and the union arm) — lazy, the node-sized
        // jump join would execute twice per round (the round-5 2.4×
        // regression in its uncached form).
        // Monotone and bounded by the component min, so the fixpoint is
        // unchanged. prevSum is re-taken from the POST-jump labels (the
        // labSum agg is also what materializes this lazy checkpoint —
        // same one job the former eager materialization paid): comparing
        // the next step against the pre-jump sum instead would spend one
        // extra full propagation round whenever convergence lands right
        // after an effective jump (measured +0.3 s on the diameter-14
        // x_graph_cc path graph). Left join: every label IS a node in
        // `labels`, but stay total.
        val parent = step.select(col("u").as("p_u"), col("lab").as("p_lab"))
        labels = T.checkpointed(labels.join(parent, col("lab") === col("p_u"), "left")
          .select(col("u"),
            least(col("lab"), coalesce(col("p_lab"), col("lab"))).as("lab")))
        prevSum = labSum(labels)
        nextLive = labels :: nextLive
      }
      live.foreach(T.freeCheckpoint(_))
      live = nextLive
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — the pair " +
          "graph's diameter exceeds maxIter; raise it rather than consume " +
          "partial labels (each extra round is one edge-linear shuffle)")
    labels
  }

  /** Transitive-closure dedup policy: every connected component of the
    * near-dup pair graph keeps exactly its min-id member. More aggressive
    * than Curation's neighbor policy (which keeps any doc with no DIRECT
    * smaller-id neighbor): on a star 1~3, 2~3 this keeps only doc 1,
    * where the neighbor policy keeps 1 AND 2 because their mutual
    * similarity was never established by a pair. Pick per corpus; both
    * are deterministic.
    *
    * @param docs  frame keyed by `doc_id`
    * @param pairs near-dup pairs (`a_id`, `b_id`) over the same ids
    * @return docs minus every non-canonical member of a pair component
    */
  def dropNonCanonical(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val doomed = connectedComponents(pairs)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select("doc_id")
    docs.join(doomed, Seq("doc_id"), "left_anti")
  }

  /** Quality-aware survivor policy: every connected component keeps its
    * BEST-scoring member (ties broken by min doc_id), instead of
    * [[dropNonCanonical]]'s min-id member. This is what production
    * curation wants — when a boilerplate-stripped mirror of a page scores
    * higher than the earlier-crawled original, keep the mirror. Identical
    * cluster semantics (same transitive closure); only the within-cluster
    * choice differs, and exactly when quality order disagrees with id
    * order.
    *
    * Shape: one window shuffle on cluster_id over the (id, score) pairs —
    * node-sized, no doc payloads move — then an ids-only anti-join back to
    * `docs`. Docs in no pair are never shuffled at all.
    *
    * @param docs     frame keyed by `doc_id` carrying `scoreCol`
    * @param pairs    near-dup pairs (`a_id`, `b_id`) over the same ids
    * @param scoreCol numeric quality column in `docs`; higher wins
    */
  def keepBest(docs: DataFrame, pairs: DataFrame, scoreCol: String): DataFrame = {
    val members = connectedComponents(pairs)
      .select("doc_id", "cluster_id")
      .join(docs.select(col("doc_id"), col(scoreCol).as("_score")), Seq("doc_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id")
      .orderBy(col("_score").desc_nulls_last, col("doc_id").asc)
    val doomed = members
      .select(col("doc_id"), row_number().over(w).as("_rn"))
      .filter(col("_rn") > 1)
      .select("doc_id")
    docs.join(doomed, Seq("doc_id"), "left_anti")
  }

  // ------------------------------------------------------------------
  // Incremental dedup: new shard vs a FROZEN corpus. Production curation
  // dedups each incoming batch against history, not against itself — the
  // corpus's minhash signatures are computed ONCE at ingest and persisted
  // as a bucketed table, so every later shard pays only its own signature
  // pass plus a band equi-join that reloads the corpus side pre-hashed
  // (zero Exchange on the 100 TB side; BucketingSpec-style assertion in
  // DedupSpec). Signature semantics are exactly the graded
  // x_dedup_minhash: 8-seed Md5MinHash bands, pair = ≥ minBands agreeing.
  // ------------------------------------------------------------------

  /** One row per (doc_id, seed, mh): the band-join key frame for a
    * (doc_id, text) corpus, via the native one-pass Md5MinHash expression
    * (values ≡ min(md5(tok ∥ '#' ∥ seed)) over distinct space tokens).
    */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    graft.ops.Custom.register(docs.sparkSession)
    docs.select(col("doc_id").cast("long").as("doc_id"),
      posexplode(expr("graft_minhash_md5(text)")).as(Seq("seed", "mh")))
  }

  /** Near-duplicate pairs WITHIN one corpus — the self-join twin of
    * [[dedupAgainst]], same pair semantics as the graded x_dedup_minhash:
    * (a_id, b_id, n_bands ≥ minBands), a_id < b_id, candidates from the
    * (seed, mh) band equi-join. `maxBandFreq` stop-lists band keys
    * carried by more than that many docs BEFORE the join (both join
    * sides — it is one signature frame), bounding any hot key's fan-out
    * at cap²/2 pairs; the miss trade is the one documented on
    * dedupAgainst. The signature frame is T.cached (both sides and the
    * frequency agg read it).
    */
  def minhashSelfPairs(docs: DataFrame, minBands: Int = 4,
      maxBandFreq: Option[Long] = None): DataFrame = {
    val sigs0 = T.cached(minhashSignatures(docs))
    val sigs = maxBandFreq.fold(sigs0) { cap =>
      val hot = sigs0.groupBy("seed", "mh").agg(count(lit(1)).as("_freq"))
        .filter(col("_freq") > cap)
        .select("seed", "mh")
      sigs0.join(broadcast(hot), Seq("seed", "mh"), "left_anti")
    }
    sigs.select(col("doc_id").as("a_id"), col("seed"), col("mh"))
      .join(sigs.select(col("doc_id").as("b_id"), col("seed"), col("mh")),
        Seq("seed", "mh"))
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_bands"))
      .filter(col("n_bands") >= minBands)
  }

  /** Duplicate CLUSTERS of the ≥`minBands` minhash pair graph, via
    * identical-signature CONTRACTION — the 100 TB form of
    * `connectedComponents(minhashSelfPairs(docs))`, with exactly the same
    * result.
    *
    * A near-dup corpus is dominated by EXACT template copies: docs whose
    * full 8-band signatures are identical. In the naive pair graph every
    * such group of k docs is a k-clique (sf0.1 fixture: a 1762-doc group
    * alone contributes 1.55 M of the graph's 9.2 M pairs), so both the
    * band self-join (hot-bucket k² blowup) and every CC propagation round
    * (edge-linear) pay quadratic cost for information a groupBy already
    * has. Contract first:
    *
    *  1. group docs by FULL signature; rep = min(doc_id) per group —
    *     one n-linear agg (sf0.1: 5000 docs → 937 reps);
    *  2. band-join among REPS ONLY (identical sigs agree on all 8 bands,
    *     so doc~doc band agreement ≡ rep~rep agreement — the quotient
    *     graph has the same ≥minBands edges);
    *  3. CC over the rep↔rep pairs ONLY; members re-attach through one
    *     docRep join after the fixpoint (a group's members are pairwise
    *     8-band dups by construction, ≥ minBands for any valid
    *     threshold, so a member's component is exactly its rep's), and
    *     cluster labels still equal the uncontracted graph's min doc_id
    *     (rep = min of its group ⇒ component min doc = component min
    *     rep). Components, labels and member counts all equal the
    *     uncontracted graph's, while the propagation loop's edge volume
    *     drops from corpus-sized (the former star edges) to Σ(rep
    *     pairs) — distinct-signatures-sized.
    *
    * Requires minBands ≤ 8 (a group's internal agreement is all 8 bands);
    * singleton reps with no rep-pairs correctly vanish, and an internally
    * duplicated group (k ≥ 2) surfaces every member even when its rep
    * pairs with no other rep.
    */
  def minhashComponents(docs: DataFrame, minBands: Int = 4): DataFrame = {
    // Cache the per-doc signature ARRAY (8 strings/doc), not the
    // exploded rows: the band frame posexplodes it and the contraction
    // key derives from it with a per-row transform — the former
    // groupBy(doc_id) + collect_list rebuild of what the expression had
    // already produced was a full corpus-sized shuffle, and the md5
    // hashing still runs exactly once (cache build).
    graft.ops.Custom.register(docs.sparkSession)
    val sigArr = T.cached(docs.select(col("doc_id").cast("long").as("doc_id"),
      expr("graft_minhash_md5(text)").as("sigs")))
    val sigs = sigArr.select(col("doc_id"),
      posexplode(col("sigs")).as(Seq("seed", "mh")))
    // Full-signature contraction key: seeds are a fixed 0..7 enumeration,
    // so the seed-ordered concat is deterministic per doc — and
    // transform's (element, index) lambda spells the same "seed#mh"
    // strings the exploded frame's concat_ws did.
    val full = sigArr.select(col("doc_id"), concat_ws("|", array_sort(
      expr("transform(sigs, (mh, i) -> concat(i, '#', mh))"))).as("sig"))
    val groups = full.groupBy("sig")
      .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("n_docs"))
    val docRep = T.cached(full.join(groups, "sig")
      .select(col("doc_id"), col("rep"), col("n_docs")))
    // Band join among representatives only: the hot-bucket fan-out is now
    // bounded by DISTINCT signatures per band value, not docs.
    val repSigs = sigs.join(
      docRep.filter(col("doc_id") === col("rep")).select("doc_id"), Seq("doc_id"))
    val repPairs = repSigs.select(col("doc_id").as("a_id"), col("seed"), col("mh"))
      .join(repSigs.select(col("doc_id").as("b_id"), col("seed"), col("mh")),
        Seq("seed", "mh"))
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_bands"))
      .filter(col("n_bands") >= minBands)
      .select("a_id", "b_id")
    // CC over the REP graph only — the star edges never enter the
    // propagation loop (they used to make every round's edge join
    // corpus-sized; the rep graph is distinct-signatures-sized). Labels
    // transfer to members unchanged: rep = min(doc_id) of its group, so
    // a component's min doc_id over all member docs IS its min rep id —
    // exactly ccLabels' fixpoint over repPairs. A doc surfaces iff its
    // group is internally duplicated (k ≥ 2 — the old star edges) or its
    // rep meets another rep; star-only groups label by their own rep.
    val repLab = ccLabels(repPairs)
      .select(col("u").as("rep"), col("lab"))
    val labeled = docRep.join(repLab, Seq("rep"), "left")
      .filter(col("n_docs") >= 2 || col("lab").isNotNull)
      .select(col("doc_id"), coalesce(col("lab"), col("rep")).as("lab"))
    val sizes = labeled.groupBy("lab").agg(count(lit(1)).as("n_members"))
    labeled.join(sizes, "lab")
      .select(col("doc_id"), col("lab").as("cluster_id"), col("n_members"))
      .orderBy("doc_id")
  }

  /** Build the persisted corpus index: signatures written as a managed
    * parquet table bucketed by the FULL band key (seed, mh) — the
    * incremental join's exact key set, which is what lets the planner
    * reuse the bucketing and plan the corpus side with no Exchange (a
    * subset bucket key would co-locate the rows too, but
    * requireAllClusterKeysForCoPartition makes the planner re-shuffle
    * it). Bucket count is the write-time knob that fixes the join
    * parallelism of every later shard — size it to the target cluster,
    * not the shard.
    */
  def writeCorpusIndex(docs: DataFrame, table: String, buckets: Int = 32): Unit =
    graft.sources.Bucketing.writeBucketed(
      minhashSignatures(docs), table, Seq("seed", "mh"), buckets)

  /** Near-duplicate pairs between a new shard and the frozen corpus:
    * (corpus_id, new_id, n_bands) where ≥ `minBands` of the 8 signature
    * bands agree. The corpus side is the pre-bucketed signature table
    * (loaded by name, NOT recomputed); only the shard pays a signature
    * pass. Same pair semantics as the x_dedup_minhash self-join restricted
    * to (corpus × new) — DedupSpec proves that equivalence on a split
    * corpus.
    *
    * @param maxBandFreq optional hot-band stop-list (the standard minhash
    *        skew defense): a band key (seed, mh) carried by more than this
    *        many corpus docs — boilerplate, empty-ish documents, template
    *        chrome — is dropped from the corpus side BEFORE the join, so
    *        no single key can fan out to a corpus-sized candidate cluster.
    *        Trade, documented and deliberate: a pair is missed or
    *        undercounted only when stop-listed bands were among its
    *        agreeing bands — i.e. agreement carried by corpus-wide
    *        boilerplate, which is exactly the evidence a curation pipeline
    *        should discount. The frequency agg groups by the index's own
    *        bucket key, so it plans with no Exchange on the corpus side,
    *        and the hot set (few keys by definition of the cap) broadcasts
    *        into the anti-join.
    */
  def dedupAgainst(spark: org.apache.spark.sql.SparkSession, corpusIndex: String,
      newDocs: DataFrame, minBands: Int = 4,
      maxBandFreq: Option[Long] = None): DataFrame = {
    val corpusAll = spark.table(corpusIndex)
      .select(col("doc_id").as("corpus_id"), col("seed"), col("mh"))
    val corpus = maxBandFreq.fold(corpusAll) { cap =>
      val hot = spark.table(corpusIndex)
        .groupBy("seed", "mh").agg(count(lit(1)).as("_freq"))
        .filter(col("_freq") > cap)
        .select("seed", "mh")
      corpusAll.join(broadcast(hot), Seq("seed", "mh"), "left_anti")
    }
    val fresh = minhashSignatures(newDocs)
      .select(col("doc_id").as("new_id"), col("seed"), col("mh"))
    corpus.join(fresh, Seq("seed", "mh"))
      .groupBy("corpus_id", "new_id")
      .agg(count(lit(1)).as("n_bands"))
      .filter(col("n_bands") >= minBands)
  }

  /** The shard-ingest filter: new documents that near-duplicate NOTHING in
    * the frozen corpus (the rows an incremental pipeline appends). The
    * duplicate-id set is distinct'd before the anti-join so its shuffle
    * moves ids, not text.
    */
  def filterNovel(spark: org.apache.spark.sql.SparkSession, corpusIndex: String,
      newDocs: DataFrame, minBands: Int = 4,
      maxBandFreq: Option[Long] = None): DataFrame = {
    val dup = dedupAgainst(spark, corpusIndex, newDocs, minBands, maxBandFreq)
      .select(col("new_id").as("doc_id")).distinct()
    newDocs.join(dup, Seq("doc_id"), "left_anti")
  }

  /** Append a shard's signatures to the corpus index — the write-back
    * half of the ingest loop. saveAsTable(Append) validates the catalog
    * bucket spec and writes new files bucket-aligned, so later
    * dedupAgainst joins still reload the corpus side Exchange-free (each
    * append adds one file per bucket; reads merge per-bucket file sets —
    * compact on your own cadence, like any LSM-ish index).
    */
  def appendToCorpusIndex(docs: DataFrame, table: String): Unit =
    graft.sources.Bucketing.appendBucketed(minhashSignatures(docs), table)

  /** Rewrite the corpus index as one file set — the LSM-style compaction
    * for [[appendToCorpusIndex]]: every append adds a file per bucket, so
    * after many shards each bucket is a pile of small files (more tasks,
    * lost per-file sort). Reads the current rows, rewrites them bucketed
    * into a side table, then drop + rename — the read must finish before
    * the drop, which the side-table write guarantees (the rewrite is the
    * materialization). Same name, same spec, one sorted file per bucket
    * per writer task.
    */
  def compactCorpusIndex(spark: org.apache.spark.sql.SparkSession,
      table: String): Unit = {
    val side = table + "_compacting"
    // Crash recovery for the non-atomic swap below (two catalog
    // statements; a crash between DROP and RENAME strands the rows in the
    // side table).
    //
    // SCOPE: this recovery needs the catalog entries to have SURVIVED the
    // crash — i.e. a persistent metastore (Hive/production), or a crash
    // that kept the JVM (task failure, OOM-killed job) on the default
    // in-memory catalog. After a whole-JVM crash on an in-memory catalog,
    // a fresh session sees NO tables: tableExists(side) is false, this
    // path never fires, the compacted rows sit orphaned in the
    // warehouse's side-table directory, and reading `table` throws
    // table-not-found. There is no filesystem-only repair — the bucket
    // spec lives in the catalog, and re-registering bare parquet dirs
    // would silently drop the zero-Exchange property the index exists
    // for. The production posture is therefore: persistent metastore +
    // this recovery; on an in-memory catalog treat the warehouse as
    // scratch and rebuild via writeCorpusIndex (writeBucketed clears the
    // orphaned locations on the way).
    //
    // On entry:
    //  - side exists, main missing → a prior run died inside the swap;
    //    the side table IS the compacted index — finish its rename.
    //  - side exists, main exists → a prior run died before its drop; the
    //    main table is still complete and the side copy is stale —
    //    discard it explicitly rather than letting writeBucketed clobber
    //    it silently.
    val sideExists = spark.catalog.tableExists(side)
    if (sideExists && !spark.catalog.tableExists(table)) {
      spark.sql(s"ALTER TABLE `$side` RENAME TO `$table`")
      return // the recovered table is already one compacted file set
    } else if (sideExists) {
      spark.sql(s"DROP TABLE `$side`")
    }
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table))
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"$table has no bucket spec — not a corpus index"))
    graft.sources.Bucketing.writeBucketed(
      spark.table(table), side, spec.bucketColumnNames, spec.numBuckets)
    spark.sql(s"DROP TABLE `$table`")
    spark.sql(s"ALTER TABLE `$side` RENAME TO `$table`")
  }

  /** One full ingest step: keep only shard docs that near-duplicate
    * neither the corpus NOR an earlier novel doc of the same shard
    * (in-shard minhash pairs, smaller id wins — without this, two copies
    * of a novel doc arriving in one shard would both pass the
    * corpus-only filter and both enter the index), then append the
    * survivors' signatures and return the survivors. The novel set is
    * eagerly localCheckpoint'ed BEFORE the append: its plan READS the
    * index the append mutates, and a mere persist() does not survive —
    * writing a table invalidates every cached plan referencing it, so
    * the "cached" result would silently recompute against the appended
    * index and each novel doc would kill itself. Lineage truncation
    * makes the result independent of the table. (On a real cluster,
    * localCheckpoint lives on executors — a production ingest would
    * land the survivors durably first, which truncates lineage anyway.)
    */
  def ingestShard(spark: org.apache.spark.sql.SparkSession, corpusIndex: String,
      shard: DataFrame, minBands: Int = 4,
      maxBandFreq: Option[Long] = None): DataFrame = {
    val vsCorpus = filterNovel(spark, corpusIndex, shard, minBands, maxBandFreq)
    val inShardDup = minhashSelfPairs(vsCorpus, minBands, maxBandFreq)
      .select(col("b_id").as("doc_id")).distinct()
    val novel = T.checkpointed(
      vsCorpus.join(inShardDup, Seq("doc_id"), "left_anti"), eager = true)
    appendToCorpusIndex(novel, corpusIndex)
    novel
  }

  /** Exact-substring (repeated k-token span) dedup — the Lee-et-al.-style
    * family the set/sketch methods miss: two documents that are globally
    * dissimilar but share a long VERBATIM run (boilerplate header,
    * license block, templated chrome). Finds, for every document, the
    * maximal token spans whose every k-token window also occurs in at
    * least `minDocs` distinct documents.
    *
    * Pipeline (all corpus-linear, no cross product):
    *  1. one md5 per TOKEN → polynomial k-window hashes over the hash
    *     array ([[graft.functions.TextAnalysis.windowHashes]]) — the
    *     rolling-hash trick split into its O(n) hashing half and its
    *     O(n·k) cheap integer half, both narrow map work;
    *  2. explode to (doc_id, pos, wh): one row per token position — the
    *     INVERTED INDEX over window hashes (the x_dedup_ngram device,
    *     one level below: windows, not shingle strings, so matches are
    *     order-sensitive and position-addressed);
    *  3. window hashes repeated across ≥ minDocs documents (one
    *     partial-combined count-distinct agg, uniform md5-derived keys);
    *  4. left-semi join positions against the repeated set (equi on the
    *     hash — shuffle volume is corpus-linear; a hot hash IS shared
    *     boilerplate, which is the output);
    *  5. merge overlapping/adjacent hit windows into maximal spans: the
    *     gaps-and-islands lag-window (the t_session device) per doc —
    *     same-length intervals merge exactly when starts differ by ≤ k.
    *
    * Scale (100 TB): steps 1-2 are map-side; 3-4 shuffle on the window
    * hash (uniform by construction); 5 shuffles on doc_id. Span OUTPUT is
    * bounded by the input token count — unlike pair emission there is no
    * quadratic blowup on duplicate-heavy corpora, which is why this is
    * the production first-pass: remove the spans, THEN run document-level
    * near-dup on what remains.
    *
    * @return (doc_id, span_start, span_len) — 0-based token offset and
    *         token length of each maximal duplicated span, ordered
    */
  /** The excision step completing the exact-substring family: rewrite
    * every document with its duplicated spans REMOVED, keeping exactly
    * one occurrence corpus-wide (the one in the minimum doc_id — the
    * same canonical-survivor convention as the pair policies). The
    * Lee-et-al. production treatment: boilerplate/license/template runs
    * vanish from every copy but one, and the documents themselves
    * survive for document-level near-dup afterwards.
    *
    * Same corpus-linear machinery as [[substringSpans]] plus: a min-agg
    * picks each repeated window's canonical doc; non-canonical hit
    * windows explode to covered token indexes (k rows per hit); an
    * anti-join drops those tokens; a per-doc sort-agg rebuilds the text.
    * Every stage is an equi-shuffle on a hash or doc_id — no broadcast
    * of anything corpus-sized, no pair materialization at all.
    *
    * @return (doc_id, text) for EVERY input doc — untouched docs pass
    *         through byte-identical, fully-covered docs come back empty
    */
  def removeSpans(docs: DataFrame, textCol: String = "text", k: Int = 8,
      minDocs: Int = 2): DataFrame = {
    import graft.functions.TextAnalysis.windowHashes
    val toks = T.cached(docs
      .select(col("doc_id"), split(col(textCol), " ").as("tk"))
      .withColumn("hs", transform(col("tk"), tk =>
        pmod(conv(substring(md5(tk), 1, 8), 16, 10).cast("long"),
          lit(graft.functions.TextAnalysis.fingerprintMod)))))
    val wins = T.cached(toks.filter(size(col("hs")) >= k)
      .select(col("doc_id"), posexplode(windowHashes(col("hs"), k)))
      .toDF("doc_id", "pos", "wh"))
    val repeated = wins.groupBy("wh")
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs).select("wh")
    val hits = wins.join(repeated, Seq("wh"), "left_semi")
    val canon = hits.groupBy("wh").agg(min("doc_id").as("cdoc"))
    val cut = hits.join(canon, "wh")
      .filter(col("doc_id") =!= col("cdoc"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(k - 1))).as("idx"))
      .distinct()
    val kept = toks
      .select(col("doc_id"), posexplode(col("tk")).as(Seq("idx", "tok")))
      .join(cut, Seq("doc_id", "idx"), "left_anti")
      .groupBy("doc_id")
      .agg(concat_ws(" ", expr(
        "transform(array_sort(collect_list(struct(idx, tok))), s -> s.tok)"))
        .as("kept_text"))
    // left join back so fully-cut docs return as empty, not vanish
    docs.select(col("doc_id"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("kept_text"), lit("")).as(textCol))
      .orderBy("doc_id")
  }

  /** (doc_id, pos, wh): every k-token window hash of every doc — the
    * shared inverted-index feedstock of the substring family
    * ([[substringSpans]], [[decontaminate]]).
    */
  private def windowFrame(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    import graft.functions.TextAnalysis.{tokenHashesMd5, windowHashes}
    // Token hashes materialize as their own projection so windowHashes
    // reads an attribute, not a re-derived expression (CollapseProject
    // keeps multi-use non-cheap aliases in their own stage).
    docs.select(col("doc_id"), tokenHashesMd5(col(textCol)).as("hs"))
      .filter(size(col("hs")) >= k)
      .select(col("doc_id"), posexplode(windowHashes(col("hs"), k)))
      .toDF("doc_id", "pos", "wh")
  }

  /** Per-doc benchmark-contamination counts: how many of a document's
    * k-token windows also occur ANYWHERE in `benchmark` (the
    * Brown-et-al./Lee-et-al. train-test decontamination signal — an
    * eval set leaking into pretraining data inflates every downstream
    * score it touches). The benchmark's distinct window-hash set plays
    * the corpus-index role: docs' windows left-semi join it (equi on the
    * hash, benchmark side aggregated tiny), one count agg per doc. Docs
    * with zero hits are absent from the result.
    */
  def contaminationHits(docs: DataFrame, benchmark: DataFrame,
      textCol: String = "text", k: Int = 8): DataFrame = {
    val benchWh = windowFrame(benchmark, textCol, k).select("wh").distinct()
    windowFrame(docs, textCol, k)
      .join(benchWh, Seq("wh"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
  }

  /** Drop every doc whose benchmark overlap exceeds `maxHits` colliding
    * k-token windows (default 0: any verbatim k-run shared with the
    * benchmark kills the doc). The filter form of [[contaminationHits]];
    * anti-join on ids only, so the surviving rows stream through
    * untouched.
    */
  def decontaminate(docs: DataFrame, benchmark: DataFrame,
      textCol: String = "text", k: Int = 8, maxHits: Long = 0): DataFrame = {
    val doomed = contaminationHits(docs, benchmark, textCol, k)
      .filter(col("n_hits") > maxHits).select("doc_id")
    docs.join(doomed, Seq("doc_id"), "left_anti")
  }

  def substringSpans(docs: DataFrame, textCol: String = "text", k: Int = 8,
      minDocs: Int = 2): DataFrame = {
    val wins = T.cached(windowFrame(docs, textCol, k))
    val repeated = wins.groupBy("wh")
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select("wh")
    val hits = wins.join(repeated, Seq("wh"), "left_semi")
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    hits
      .withColumn("brk",
        when(col("pos") - lag("pos", 1).over(byDoc) <= k, 0).otherwise(1))
      .withColumn("g", sum("brk").over(byDoc))
      .groupBy(col("doc_id"), col("g"))
      .agg(min("pos").as("span_start"),
        (max("pos") + lit(k) - min("pos")).as("span_len"))
      .select("doc_id", "span_start", "span_len")
      .orderBy("doc_id", "span_start")
  }

  /** Bloom-filter membership gate, build half (graded form:
    * x_dedup_bloom): the constant-memory pre-dedup a 100 TB ingest runs
    * BEFORE any pairwise machinery — build the bit set once from the
    * frozen corpus, stream new shards through it (bloomMaybeDup), and
    * only maybe-dups proceed to exact/near verification. The filter is
    * represented relationally as the DISTINCT set bit positions — at
    * most `m` rows of one int, broadcast-sized by construction for ANY
    * corpus size (m is the filter's memory budget, not the corpus's).
    * Positions are `k` disjoint 8-hex md5 windows mod m over the
    * x_dedup_exact normalization (lower/trim) — deterministic
    * cross-engine, no RNG. Build = one narrow explode + distinct
    * (one shuffle bounded by m).
    *
    * Sizing note (standard Bloom math): false-positive rate ≈ fill^k
    * where fill ≈ 1 − exp(−k·n/m); k·8 hex chars must fit md5's 32, so
    * k ≤ 4.
    */
  def bloomBits(docs: DataFrame, textCol: String = "text", m: Int = 4096,
      k: Int = 4): DataFrame = {
    require(k >= 1 && k <= 4, s"k=$k: md5 has 32 hex chars = 4 disjoint 8-hex windows")
    docs
      .select(md5(lower(trim(col(textCol))).cast("binary")).as("bf_h"),
        explode(sequence(lit(0), lit(k - 1))).as("j"))
      .select(pmod(
        conv(col("bf_h").substr(col("j") * 8 + 1, lit(8)), 16, 10).cast("bigint"),
        lit(m.toLong)).cast("int").as("pos"))
      .distinct()
  }

  /** Bloom-filter membership gate, probe half: flags each probe row
    * `maybe_dup` iff ALL `k` of its bit positions are set in `bits`
    * (no false negatives — a Bloom filter's defining guarantee, which
    * the spec pins; false positives are deterministic md5 arithmetic).
    * `bits` is broadcast (≤ m rows); the probe side pays one narrow
    * position explode + a broadcast join + one doc-keyed count-agg —
    * no corpus-sized shuffle anywhere.
    */
  def bloomMaybeDup(probes: DataFrame, bits: DataFrame,
      textCol: String = "text", idCol: String = "doc_id", m: Int = 4096,
      k: Int = 4): DataFrame = {
    val hits = probes
      .select(col(idCol),
        md5(lower(trim(col(textCol))).cast("binary")).as("bf_h"),
        explode(sequence(lit(0), lit(k - 1))).as("j"))
      .select(col(idCol), pmod(
        conv(col("bf_h").substr(col("j") * 8 + 1, lit(8)), 16, 10).cast("bigint"),
        lit(m.toLong)).cast("int").as("pos"))
      .join(broadcast(bits), Seq("pos"), "left_semi")
      .groupBy(idCol).agg(count(lit(1)).as("bf_hits"))
      .filter(col("bf_hits") === k)
      .select(col(idCol), lit(true).as("maybe_dup"))
    probes.join(hits, Seq(idCol), "left")
      .withColumn("maybe_dup", coalesce(col("maybe_dup"), lit(false)))
  }
}
