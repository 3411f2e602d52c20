package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for training-data pipelines (north star:
  * language-ID, quality scoring, token counting, fingerprinting).
  *
  * Everything here is a pure Column expression tree — codegen'd end to end,
  * no UDFs — so at 100 TB these run inside WholeStageCodegen over the scan
  * with zero extra shuffles: `docs.select(languageId($"text"), ...)` is a
  * single map stage.
  *
  * Reference analog: flexcalc has no text surface; these extend the engine
  * per BASELINE.json::north_star. Graded coverage of the tokenize/tf-idf/
  * ngram family lives in graft.ops.Similarity (x_text_*); these are the
  * reusable library forms.
  */
object TextAnalysis {

  /** Whitespace tokens (the corpus' exact tokenization — FIXTURES.md). */
  def tokens(text: Column): Column = split(text, "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: a cheap LLM-token estimate — whitespace split
    * plus a break after every 4 letters inside long words. Proxy only; the
    * real vocab-driven pass is [[subwordTokens]]/[[subwordCountVocab]].
    */
  def subwordCount(text: Column): Column =
    size(split(regexp_replace(text, "([a-z]{4})(?=[a-z])", "$1 "), "\\s+"))

  /** Real subword segmentation: greedy longest-match against `vocab`,
    * single-char fallback for out-of-vocab spans — the [[graft.functions
    * .BpeEncode]] native expression (its Scaladoc has the exact semantics
    * and the 100 TB shape; same narrow-map plan as the proxy). Requires
    * the session to carry the graft function registry
    * (`graft.ops.Custom.register` or GraftExtensions).
    */
  def subwordTokens(text: Column, vocab: Seq[String]): Column =
    call_function("graft_bpe", text, typedLit(vocab))

  /** True LLM-token count under `vocab` — drop-in for [[subwordCount]]
    * where the vocab is known. */
  def subwordCountVocab(text: Column, vocab: Seq[String]): Column =
    size(subwordTokens(text, vocab))

  /** Learn a subword vocabulary FROM the corpus — the missing half of the
    * tokenizer story ([[subwordTokens]] consumes a caller-supplied vocab;
    * this derives one). Frequency-ranked substring selection, the scalable
    * stand-in for iterative BPE merges (true pair-merge training is a
    * vocab-sized driver loop — thousands of sequential passes — where this
    * is ONE aggregation cascade; SentencePiece seeds its unigram model the
    * same way, Kudo & Richardson 2018 §3):
    *
    *  1. distinct whitespace words with corpus frequencies (one agg);
    *  2. every substring up to `maxSubLen` chars of each distinct word,
    *     weighted by the word's frequency (a flatten/transform HOF over
    *     the DISTINCT words — the substring blowup is per unique word,
    *     not per corpus row);
    *  3. one more agg sums weights per substring; multi-char candidates
    *     rank by weight × length (plain frequency would rank every single
    *     char first and fill the budget with them; length-weighting is
    *     what makes "ing" beat "i"+"n"+"g", mirroring what BPE merges
    *     optimize), ties broken lexicographically — deterministic;
    *  4. ALL seen single chars enter the vocab unconditionally (full
    *     charset coverage: encoding then falls back to the single-char
    *     path only for chars never seen in training), then the top
    *     multi-char candidates fill the remaining `vocabSize` slots.
    *
    * The §3.3 aggregate→decide pattern: executors reduce 100 TB of text to
    * a (substring, weight) frame; only the final ranked vocab — bounded by
    * `vocabSize`, a few hundred KB — reaches the driver. The result feeds
    * [[subwordTokens]]/[[subwordCountVocab]] as a literal, so encoding
    * stays a narrow codegen map.
    *
    * @param maxWordLen words longer than this are skipped as vocab
    *        SOURCES (url/hash junk would otherwise dominate the substring
    *        expansion); they still encode fine via shorter learned pieces.
    * @return vocab of ≤ max(vocabSize, #distinct chars) entries: every
    *         seen char, then multi-char substrings by descending score
    */
  def trainVocab(docs: org.apache.spark.sql.DataFrame, textCol: String,
      vocabSize: Int, maxSubLen: Int = 8, maxWordLen: Int = 32): Seq[String] = {
    val words = docs
      .select(explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")).between(1, maxWordLen))
      .groupBy("w").agg(count(lit(1)).as("f"))
    val scored = words
      .select(col("f"), explode(flatten(transform(
        sequence(lit(1), length(col("w"))),
        i => transform(
          sequence(lit(1), least(lit(maxSubLen), length(col("w")) - i + 1)),
          n => col("w").substr(i, n))))).as("s"))
      .groupBy("s").agg(sum(col("f")).as("sf"))
    val chars = scored.filter(length(col("s")) === 1)
      .orderBy(col("s")).select("s")
      .collect().map(_.getString(0)).toSeq
    val multi = scored.filter(length(col("s")) > 1)
      .orderBy((col("sf") * length(col("s"))).desc, col("s").asc)
      .limit(math.max(vocabSize, 0)).select("s")
      .collect().map(_.getString(0)).toSeq
    chars ++ multi.take(math.max(vocabSize - chars.size, 0))
  }

  /** One learned BPE merge rule: at `step`, the corpus' most frequent
    * adjacent symbol pair (`lhs`,`rhs`) — weighted count `cnt` — fused
    * into the new symbol `lhs+rhs`.
    */
  final case class BpeMerge(step: Int, lhs: String, rhs: String, cnt: Long)

  /** Symbol boundary marker inside a word's in-training representation —
    * a control char (U+001F) that whitespace tokens can never contain.
    * The representation is SENTINEL-PADDED with a DOUBLED interior
    * separator: `US s1 US US s2 US US … sn US`. Every symbol is flanked
    * by its own pair of USes, so a merge pattern `US s1 US US s2 US` can
    * only match at true symbol boundaries — a single-separator encoding
    * is ambiguous (symbols ["ab","c"] contain "b␟c", so rule (b,c)
    * would fuse mid-symbol, a merge BPE never chose) — and, because
    * adjacent occurrences share no US (each occurrence carries its own),
    * left-to-right non-overlapping replace() still fuses every
    * occurrence, which is exactly the Sennrich re-tokenization rule. The
    * replacement `US s1s2 US` restores the canonical form.
    */
  private val US = "\u001f"

  /** TRUE iterative BPE merge training (Sennrich et al. 2016) — the
    * pair-merge loop [[trainVocab]]'s one-shot frequency seeding stands
    * in for. The §3.3 driver-loop pattern (like register_volumes /
    * connectedComponents): state is a DataFrame of DISTINCT words as
    * separator-joined symbol sequences with corpus frequencies —
    * vocab-bounded (~10⁶ rows on any real corpus), NOT corpus-sized — and
    * each round is (a) one partial-combined agg counting adjacent symbol
    * pairs weighted by word frequency, (b) the argmax pair — ONE row — to
    * the driver (count desc, then lexicographic (lhs, rhs): fully
    * deterministic), (c) one narrow map fusing that pair everywhere
    * (non-regex replace = the same greedy left-to-right non-overlapping
    * semantics BPE specifies, identical on any engine). N merges = N
    * cheap agg rounds over the word table; the 100 TB corpus is touched
    * exactly once, by the initial word-frequency agg.
    *
    * localCheckpoint per round keeps the plan flat (the word frame is
    * both aggregated and re-mapped every round; without truncation round
    * k would replay rounds 1..k−1) — the frame is vocab-bounded, so the
    * materialization is pennies.
    *
    * Stops early when no adjacent pair remains (every word fused to one
    * symbol). Max pair count is non-increasing over rounds — a merged
    * symbol occurs at most as often as the pair it replaced — pinned by
    * the property suite.
    */
  def trainBpeMerges(docs: org.apache.spark.sql.DataFrame, textCol: String,
      numMerges: Int, maxWordLen: Int = 32): Seq[BpeMerge] = {
    val words0 = docs
      .select(explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")).between(1, maxWordLen))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .select(concat(lit(US), array_join(transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1))), US + US), lit(US)).as("seq"), col("f"))
    // T.checkpointed, not a bare localCheckpoint: Dataset.unpersist does
    // not free checkpoint blocks (LogicalRDD leaf), so the per-round
    // frames would otherwise linger in storage memory until GC.
    var words = graft.ops.T.checkpointed(words0, eager = true)
    val merges = Seq.newBuilder[BpeMerge]
    var step = 1
    var done = false
    while (step <= numMerges && !done) {
      val sp = split(col("seq").substr(lit(2), length(col("seq")) - 2), US + US)
      // sequence(1, 0) DESCENDS in Spark — fully-fused single-symbol
      // words must leave before the pair explode, not hit element_at OOB.
      val best = words.filter(size(sp) >= 2)
        .select(col("f"), explode(transform(sequence(lit(1), size(sp) - 1),
          j => struct(element_at(sp, j).as("s1"),
            element_at(sp, j + 1).as("s2")))).as("p"))
        .groupBy(col("p.s1").as("s1"), col("p.s2").as("s2"))
        .agg(sum("f").as("cnt"))
        .orderBy(col("cnt").desc, col("s1").asc, col("s2").asc)
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (s1, s2, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += BpeMerge(step, s1, s2, cnt)
        val old = words
        words = graft.ops.T.checkpointed(words.select(
          replace(col("seq"), lit(US + s1 + US + US + s2 + US),
            lit(US + s1 + s2 + US)).as("seq"),
          col("f")), eager = true)
        graft.ops.T.freeCheckpoint(old)
        step += 1
      }
    }
    merges.result()
  }

  /** Flatten learned merges into a vocabulary for the NATIVE greedy
    * longest-match encoder ([[subwordTokens]] / `graft_bpe`): all merge
    * products plus their constituent symbols, longest-first is implicit
    * in the encoder. Greedy longest-match over this vocab is the fast
    * single-pass approximation of merge-order inference
    * ([[bpeTokensByMerges]] is the exact form); both round-trip, and on
    * text dominated by trained words they agree exactly.
    */
  def vocabFromMerges(merges: Seq[BpeMerge]): Seq[String] = {
    val syms = scala.collection.mutable.LinkedHashSet[String]()
    merges.foreach { m =>
      m.lhs.foreach(c => syms += c.toString)
      m.rhs.foreach(c => syms += c.toString)
      syms += m.lhs; syms += m.rhs; syms += m.lhs + m.rhs
    }
    syms.toSeq.sorted
  }

  /** Encode whitespace words by APPLYING learned merges in training order
    * — true BPE inference (vs [[subwordTokens]]'s greedy longest-match
    * against a flat vocab). Pure Column expression: each word char-splits
    * to a separator-joined sequence, the N merge rules become N nested
    * non-regex replaces (codegen'd — no UDF, no driver loop at encode
    * time), and the result splits back to subword tokens. Narrow map at
    * any scale.
    */
  def bpeTokensByMerges(text: Column, merges: Seq[BpeMerge]): Column =
    flatten(transform(tokens(text), w => {
      val seq0 = concat(lit(US), array_join(transform(sequence(lit(1), length(w)),
        i => w.substr(i, lit(1))), US + US), lit(US))
      val fused = merges.foldLeft(seq0: Column)((acc, m) =>
        replace(acc, lit(US + m.lhs + US + US + m.rhs + US),
          lit(US + m.lhs + m.rhs + US)))
      split(fused.substr(lit(2), length(fused) - 2), US + US)
    }))

  /** Canonical Unicode bytes (NFC): run before ANY hash-based stage on a
    * multilingual corpus — NFD/NFC mixed encodings are the same text but
    * different md5/minhash inputs ([[graft.functions.UnicodeNormalize]]).
    * Registry-resolved like [[subwordTokens]].
    */
  def normalizeNfc(text: Column): Column = call_function("graft_nfc", text)

  /** Compatibility fold (NFKC): NFC plus fullwidth→ASCII, ligatures,
    * superscripts — the aggressive form for dedup keys (not for output
    * text, which it visibly rewrites).
    */
  def normalizeNfkc(text: Column): Column = call_function("graft_nfkc", text)

  /** Punctuation-aware Unicode tokenization: NFKC-fold, lowercase, then
    * split on any non-letter/digit run (\\p{L}\\p{N} are Unicode classes,
    * so CJK ideographs and accented letters stay inside tokens instead of
    * splitting on them as `\\W` would). Empty strings from leading/
    * trailing separators are filtered. The hygiene-grade alternative to
    * the corpus' exact whitespace [[tokens]].
    */
  def tokensUnicode(text: Column): Column =
    filter(split(lower(normalizeNfkc(text)), "[^\\p{L}\\p{N}]+"),
      t => length(t) > 0)

  /** Fraction of characters that are neither alphanumeric nor whitespace. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(lower(text), "[a-z0-9\\s]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Minimal per-language stopword lists for the heuristic language ID. */
  val defaultStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "es" -> Seq("el", "la", "que", "y", "en", "un", "es", "se", "no", "los"),
    "fr" -> Seq("le", "et", "les", "des", "une", "est", "dans", "pour", "qui", "sur"),
    "zh" -> Seq("wo", "ni", "ta", "shi", "bu", "zai", "you", "hen", "ye", "dou"))

  /** Heuristic language ID: argmax over per-language distinct-stopword
    * hits. Ties resolve to the lexicographically LARGEST language code
    * (array_max on (score, lang) structs) — deterministic. Falls back to
    * "und" (undetermined) when no list matches at all.
    */
  def languageId(text: Column,
      stopwords: Map[String, Seq[String]] = defaultStopwords): Column = {
    val toks = array_distinct(tokens(lower(text)))
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(size(array_intersect(toks, array(words.map(lit): _*))).as("score"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Fraction of characters in a Unicode script block (Java regex script
    * classes, e.g. "Han", "Hiragana", "Katakana", "Hangul") — the signal
    * stopword lists cannot give for unsegmented CJK text. Codegen'd
    * regexp count, narrow map.
    */
  def scriptRatio(text: Column, script: String): Column = {
    require(script.matches("[A-Za-z]+"), s"bad script name $script")
    length(regexp_replace(text, s"[^\\p{Is$script}]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")
  }

  /** Script-aware language ID: CJK scripts are decided by character
    * blocks FIRST — any kana ⇒ 'ja' (Japanese prose mixes kana + Han, so
    * kana is the discriminator), else hangul ⇒ 'ko', else enough Han ⇒
    * 'zh' — and only script-light text falls back to the stopword
    * heuristic [[languageId]]. Whitespace tokenization never sees an
    * ideograph boundary, which is why the stopword path alone
    * misclassifies CJK as 'und'.
    */
  def languageIdScript(text: Column,
      stopwords: Map[String, Seq[String]] = defaultStopwords,
      minCjk: Double = 0.25): Column =
    when(scriptRatio(text, "Hiragana") + scriptRatio(text, "Katakana") > 0.05,
      lit("ja"))
      .when(scriptRatio(text, "Hangul") > minCjk, lit("ko"))
      .when(scriptRatio(text, "Han") > minCjk, lit("zh"))
      .otherwise(languageId(text, stopwords))

  /** Fraction of distinct tokens that are stopwords in ANY language —
    * natural-language text scores high, code/garbage scores low.
    */
  def stopwordRatio(text: Column,
      stopwords: Map[String, Seq[String]] = defaultStopwords): Column = {
    val all = stopwords.values.flatten.toSeq.distinct.sorted
    val toks = array_distinct(tokens(lower(text)))
    size(array_intersect(toks, array(all.map(lit): _*))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** Composite quality score in [0,1]: length band (20..2000 chars),
    * low punctuation noise, some stopword mass. Weights are heuristic —
    * the shape (cheap columnar features → one score) is the point.
    */
  def qualityScore(text: Column): Column = {
    val lenOk = when(length(text).between(20, 2000), 1.0).otherwise(0.0)
    val punct = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val stop = least(stopwordRatio(text) * 4.0, lit(1.0))
    round(lenOk * 0.4 + punct * 0.3 + stop * 0.3, 6)
  }

  /** Character n-gram shingles (distinct, order-free) — the dedup unit for
    * n-gram Jaccard, robust to token-boundary edits where token-set
    * Jaccard is not.
    */
  def shingles(text: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
      i => text.substr(i, lit(n))))

  /** Exact n-gram Jaccard similarity of two texts' shingle sets. */
  def shingleJaccard(a: Column, b: Column, n: Int): Column = {
    val (sa, sb) = (shingles(a, n), shingles(b, n))
    val inter = size(array_intersect(sa, sb)).cast("double")
    inter / (size(sa) + size(sb) - inter)
  }

  /** Gopher-style repetition filter (published corpus-quality heuristic —
    * Rae et al. 2021, "Scaling Language Models", appendix A1.1): the
    * fraction of lines that are duplicates of an earlier line. Boilerplate
    * and scraped navigation text score high; prose scores ~0.
    */
  def duplicateLineFraction(text: Column): Column = {
    val lines = split(text, "\n")
    when(size(lines) > 0,
      (size(lines) - size(array_distinct(lines))).cast("double") /
        size(lines).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Gopher-style top-n-gram fraction: the share of all tokens covered by
    * occurrences of the single most frequent n-gram. High values mean the
    * document is dominated by one repeated phrase (SEO spam, templated
    * text). Pure HOF pipeline: build n-grams positionally, count the mode
    * via a sort of (gram, count) pairs, no shuffle.
    */
  def topNgramFraction(text: Column, n: Int): Column = {
    val toks = tokens(text)
    // sequence(a, b) runs DESCENDING when a > b (the binPool gotcha) —
    // every sequence below is guarded by a size test.
    val grams = when(size(toks) >= n,
      array_sort(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
      .otherwise(expr("cast(array() as array<string>)"))
    // Run-length the sorted grams in ONE pass that carries the previous
    // element in the fold state — so `grams` appears in the expression
    // tree exactly ONCE. HOFs evaluate interpreted (no codegen, no
    // common-subexpression elimination): every reference to the grams
    // subtree re-splits, re-builds, and re-SORTS it per row, and the
    // original element_at(sorted, i)-per-fold-step form re-sorted it per
    // STEP — O(n²·log n)/doc, 60 s for 5 k docs on the one-task stage a
    // single-row-group parquet gives. One reference makes the whole
    // column O(n·log n) with no duplicated work.
    val best = aggregate(
      grams,
      struct(lit(null).cast("string").as("prev"), lit(0).as("run"),
        lit(0).as("best")),
      (acc, g) => {
        val run = when(g === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1)) // null prev (first element) compares false
        struct(g.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    when(size(toks) >= n,
      least((best * n).cast("double") / greatest(size(toks), lit(1)), lit(1.0)))
      .otherwise(lit(0.0))
  }

  /** Gopher-style duplicate n-gram fraction (Rae et al. 2021, appendix
    * A1.1 family): the share of a document's token n-grams that repeat an
    * earlier occurrence within the same document. Complements
    * [[topNgramFraction]] — that metric catches ONE dominant phrase; this
    * one catches diffuse internal repetition (listicles, keyword stuffing,
    * concatenated boilerplate) where no single n-gram dominates. Pure
    * per-row HOF pipeline, no shuffle; integer counts → one double
    * division, so it grades exactly cross-engine (x_text_repetition).
    */
  def dupNgramFraction(text: Column, n: Int): Column = {
    val toks = tokens(text)
    // sequence(a, b) DESCENDS when a > b — guarded by the size test.
    // The gram array appears ONCE (interpreted HOFs re-evaluate every
    // reference — see topNgramFraction); the total gram count is
    // size(toks) − n + 1 by construction, no second build needed.
    val grams = transform(sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))
    val nGrams = size(toks) - (n - 1)
    when(size(toks) >= n,
      (nGrams - size(array_distinct(grams))).cast("double") /
        nGrams.cast("double"))
      .otherwise(lit(0.0))
  }

  /** Order-sensitive document fingerprint: polynomial rolling hash over the
    * Murmur3 hash of each token (aggregate HOF — sequential, deterministic,
    * cross-partition safe because it's per-row). Same token sequence ⇒ same
    * fingerprint; any reordering ⇒ different. Basis for shingle/dedup keys.
    * Modular (prime < 2^42) so the multiply never overflows Long — Spark 4
    * ANSI mode turns silent wrap-around into a runtime error.
    */
  def fingerprint(text: Column): Column = {
    val m = lit(4398046511093L) // prime ~2^42; m * 1000003 < Long.MaxValue
    aggregate(
      transform(tokens(text), t => pmod(hash(t).cast("bigint"), m)),
      lit(0L),
      (acc, h) => pmod(acc * lit(1000003L) + h, m))
  }

  /** Rolling-hash prefix fingerprint, mod P = 2^31−1 */
  val fingerprintMod: Long = 2147483647L
  /** …with multiplier r = 1000003; w(k) = r^k mod P for k = 0..11. */
  val fingerprintWeights: Seq[Long] = Seq(1L, 1000003L, 1426104154L,
    1049561761L, 1604566856L, 1953433226L, 2061642598L, 57298384L,
    1544709545L, 1274554124L, 633364108L, 66148026L)

  /** Weights for a k-token polynomial window hash: w(j) = r^(k−1−j) mod P
    * for j = 0..k−1, so the window hash at position i is
    * Σⱼ h(tokᵢ₊ⱼ)·w(j) mod P — the same r/P family as
    * [[fingerprintWeights]] (and numerically identical to its prefix for
    * k = 12), generated for any k. Used by the exact-substring span
    * dedup ([[graft.operators.Dedup.substringSpans]]).
    */
  def windowHashWeights(k: Int): Seq[Long] = {
    val p = BigInt(fingerprintMod)
    (0 until k).map(j => BigInt(1000003L).modPow(BigInt(k - 1 - j), p).toLong)
  }

  /** Per-token md5-derived hash array, mod P — the cross-engine-exact
    * token hash [[fingerprintMd5]] uses (first 32 md5 bits), as a
    * MATERIALIZABLE array column so window hashing over it pays one md5
    * per TOKEN, not one per (token × window) — the O(n) half of a
    * rolling-hash scheme.
    */
  def tokenHashesMd5(text: Column): Column =
    transform(split(text, " "), tk =>
      pmod(conv(substring(md5(tk), 1, 8), 16, 10).cast("long"),
        lit(fingerprintMod)))

  /** All k-token window hashes of a PRECOMPUTED token-hash array (one
    * slot per 0-based window start): whs[i] = Σⱼ hs[i+j]·w(j) mod P.
    * Every product h·w < 2^62 and the k partial mods sum below 2^31·k,
    * so the arithmetic is exact in signed 64-bit on any engine — the
    * property that makes substring spans oracle-gradeable. Take `hs`
    * from a materialized [[tokenHashesMd5]] column (not inline) so the
    * token hashes aren't recomputed per window.
    */
  def windowHashes(hs: Column, k: Int): Column = {
    val p = lit(fingerprintMod)
    val w = typedLit(windowHashWeights(k))
    // guard: Spark's sequence(0, n) DESCENDS for n < 0, so arrays shorter
    // than k must short-circuit to "no windows", not walk off the end
    when(size(hs) < k, typedLit(Seq.empty[Long])).otherwise(
      transform(sequence(lit(0), size(hs) - k), i =>
        pmod(
          aggregate(sequence(lit(0), lit(k - 1)), lit(0L), (acc, j) =>
            acc + pmod(element_at(hs, (i + j + lit(1)).cast("int"))
              * element_at(w, (j + lit(1)).cast("int")), p)),
          p)))
  }

  /** PII scrub — the redaction stage of a curation pipeline: replace
    * email addresses, then long digit runs (phone/account/card numbers,
    * 7+ digits allowing space/dash/dot separators), then IPv4-looking
    * dotted quads, with typed placeholder tokens. RE2-safe patterns (no
    * lookahead/backreferences) so the same masking is expressible on any
    * regex engine; order matters (emails first — their local parts may
    * contain digits). A narrow codegen'd map — composes before any
    * tokenize/dedup stage at no extra shuffle.
    */
  def maskPii(text: Column): Column = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ip = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
    // >= 7 DIGITS (not 7 chars — "[0-9 .-]{5,}" would redact dates and
    // short enumerations), with optional space/dash/dot separators.
    val num = "[0-9](?:[ .-]*[0-9]){6,}"
    regexp_replace(
      regexp_replace(
        regexp_replace(text, email, "<EMAIL>"),
        ip, "<IP>"),
      num, "<NUM>")
  }

  /** Cross-engine-exact variant of [[fingerprint]] (graded as
    * x_text_fingerprint): rolling hash over the FIRST 12 single-space
    * tokens, token hash = first 32 bits of md5 (identical on any engine;
    * murmur `hash()` is Spark-private), modulus 2^31−1 so every product
    * stays inside signed 64-bit. The Horner fold is re-expressed as
    * Σ hᵢ·(r^(n−1−i) mod P) with the weights precomputed literals —
    * associative, so a fold, a SUM agg, or a SIMD reduction all agree.
    * Same token prefix ⇒ same value; any edit/reorder ⇒ different (whp).
    */
  def fingerprintMd5(text: Column): Column = {
    val P = lit(fingerprintMod)
    val toks = slice(split(text, " "), 1, fingerprintWeights.size)
    val n = size(toks)
    pmod(
      aggregate(
        transform(toks, (tk, i) =>
          pmod(pmod(conv(substring(md5(tk), 1, 8), 16, 10).cast("long"), P)
            * element_at(typedLit(fingerprintWeights), (n - i).cast("int")), P)),
        lit(0L), (acc, x) => acc + x),
      P)
  }
}
