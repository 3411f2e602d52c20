package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch/stream-portable event pipelines (north star: Structured Streaming
  * for streams). Each transform takes ANY DataFrame with (user_id, ts
  * timestamp, value/event_type …) — a batch table or a readStream source —
  * and compiles to the same logical plan; watermarks are attached only on
  * streaming inputs where the API requires it.
  *
  * The graded group T queries (graft.ops.EventTime) are these shapes
  * specialized to the events table; t_stream_runtime + StreamingSpec prove
  * batch/stream parity on real data.
  */
object Pipelines {

  /** Per-user tumbling-window count+sum. */
  def tumblingAgg(events: DataFrame, width: String,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val in = if (events.isStreaming) events.withWatermark("ts", watermarkDelay)
             else events
    in.groupBy(col("user_id"), window(col("ts"), width))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(38,6)")).as("sum_value"))
      .select(col("user_id"), col("window.start").as("win_start"),
        col("cnt"), col("sum_value"))
  }

  /** Per-user session windows (gap-merged; Spark's inclusive-gap rule). */
  def sessionAgg(events: DataFrame, gap: String,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val in = if (events.isStreaming) events.withWatermark("ts", watermarkDelay)
             else events
    in.groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"), col("n_events"))
  }

  /** Keyed dedup. Streaming: state-bounded dropDuplicatesWithinWatermark;
    * batch: plain dropDuplicates — same keep-one-per-key semantics.
    */
  def dedupKeyed(events: DataFrame, keys: Seq[String],
      watermarkDelay: String = "10 minutes"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermarkDelay)
        .dropDuplicatesWithinWatermark(keys)
    else events.dropDuplicates(keys)

  /** Watermarked stream-stream attribution join: each `purchase`-side row
    * pairs with the most recent same-user `view`-side rows within
    * `horizon` BEFORE it (the as-of/attribution pattern of j_asof, in
    * streaming form). Both sides must be watermarked and the join
    * condition must bound event-time distance — that pair of constraints
    * is what lets Spark expire join state instead of buffering both
    * streams forever. Works identically on batch frames (condition-only
    * join, no watermark needed).
    *
    * Inputs need (user_id, ts, event_type); rows are pre-filtered by
    * `leftType`/`rightType`.
    */
  def attributionJoin(left: DataFrame, right: DataFrame,
      leftType: String = "purchase", rightType: String = "view",
      horizon: String = "1 hour",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val l0 = left.filter(col("event_type") === leftType)
      .select(col("user_id").as("l_user"), col("ts").as("l_ts"))
    val r0 = right.filter(col("event_type") === rightType)
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"))
    val l = if (left.isStreaming) l0.withWatermark("l_ts", watermarkDelay) else l0
    val r = if (right.isStreaming) r0.withWatermark("r_ts", watermarkDelay) else r0
    l.join(r,
      col("l_user") === col("r_user") &&
        col("r_ts") < col("l_ts") &&
        col("r_ts") >= col("l_ts") - expr(s"INTERVAL $horizon"))
      .select(col("l_user").as("user_id"), col("l_ts"), col("r_ts"))
  }

  /** Streaming front-end of the corpus-curation pipeline
    * (graft.operators.Curation): the STATELESS gates — language-ID,
    * quality score, Gopher-style repetition filters — run per micro-batch
    * inside the scan, and exact dedup by content hash keeps bounded state
    * via the watermark horizon. Near-dup banding needs a self-join, which
    * streaming can't do unboundedly: the 100 TB topology is this stream
    * front-end feeding a periodic BATCH near-dup compaction
    * (Curation.curate) — the standard lambda split for dedup.
    * Input needs (doc_id, ts, text).
    */
  def curateStream(docs: DataFrame, minQuality: Double = 0.3,
      maxDupLines: Double = 1.0, maxTopNgram: Double = 1.0,
      watermarkDelay: String = "10 minutes",
      classifierWeights: Option[Seq[Double]] = None,
      minClassifierScore: Double = 0.5): DataFrame = {
    import graft.functions.TextAnalysis
    val gated = docs
      .select(col("doc_id"), col("ts"), col("text"),
        TextAnalysis.languageId(col("text")).as("lang"),
        TextAnalysis.qualityScore(col("text")).as("quality"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      .filter(col("quality") >= minQuality &&
        TextAnalysis.duplicateLineFraction(col("text")) <= maxDupLines &&
        TextAnalysis.topNgramFraction(col("text"), 2) <= maxTopNgram)
    // Trained-classifier gate, streaming form: the weights are FROZEN
    // (trained batch-side via Curation.trainQualityClassifier) so σ(w·x)
    // is a stateless per-row expression — no per-doc score join like the
    // batch path needs, no streaming state. The corpus-model perplexity
    // gate has NO streaming form by design: its model is a corpus
    // aggregate (train batch-side, or use this gate).
    val clfGated = classifierWeights match {
      case Some(w) =>
        val wArr = array(w.map(lit): _*)
        val toks = split(col("text"), "\\s+")
        val z = aggregate(
          transform(toks, t => element_at(wArr,
            pmod(conv(substring(md5(t), 1, 6), 16, 10).cast("bigint"),
              lit(w.size.toLong)).cast("int") + 1)),
          lit(0.0), (acc, v) => acc + v) / size(toks)
        gated.filter(lit(1.0) / (lit(1.0) + exp(-z)) >= minClassifierScore)
      case None => gated
    }
    val withKey = clfGated.withColumn("content_key", md5(col("text")))
    dedupKeyed(withKey, Seq("content_key"), watermarkDelay)
      .drop("content_key")
  }

  /** Streaming incremental NEAR-dup dedup: every micro-batch of (doc_id,
    * text) documents is deduped against a FROZEN persisted corpus index
    * ([[graft.operators.Dedup.writeCorpusIndex]]) and the novel survivors
    * go to `sink` — the production shard-ingest topology. foreachBatch is
    * the right tool, not a workaround: the per-pair band-agreement count
    * is a per-shard aggregation with exact batch semantics
    * (Dedup.filterNovel verbatim), the corpus side reloads pre-bucketed
    * with zero Exchange, and the stream stays append-only with NO
    * streaming state at all — the state lives in the corpus index, where
    * a 100 TB pipeline wants it (shared, restart-safe, queryable).
    * Complements [[curateStream]]'s in-stream EXACT dedup, which does use
    * watermarked state.
    *
    * Caller owns checkpointing/trigger via the returned query's options —
    * this only wires the per-batch transform.
    */
  def novelDocsStream(docs: DataFrame, corpusIndex: String, minBands: Int = 4)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.operators.Dedup.filterNovel(
          batch.sparkSession, corpusIndex, batch, minBands))
      }
      .start()

  /** Streaming similarity search — the vector twin of [[novelDocsStream]]:
    * each micro-batch of probe vectors (vec_id, embedding) is top-k
    * searched against a FROZEN pre-built LSH index
    * ([[graft.operators.Ann.writeLshIndex]]) via the indexed path, so the
    * per-batch plan touches the corpus only through the bucketed index
    * scan + the candidate re-rank join — the corpus' signature pass was
    * paid once at build. Signature params must match the index's build
    * params (the same caveat as appendToLshIndex). Batch/stream parity:
    * foreachBatch hands a plain DataFrame to the same lshTopKIndexed call
    * the batch path uses, so results per batch are identical to batch
    * search over the same probes (LibrarySpec proves it).
    */
  def annSearchStream(probes: DataFrame, indexTable: String, emb: DataFrame,
      k: Int, nBits: Int = 16, nBands: Int = 4, dim: Int = 64,
      seed: Long = 42L, probeRadius: Int = 0)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    probes.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.operators.Ann.lshTopKIndexed(batch.sparkSession, indexTable,
          emb, batch, k, nBits, nBands, dim, seed, probeRadius))
      }
      .start()
}
