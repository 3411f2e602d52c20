package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text hygiene for multilingual corpora. Hash-based dedup (md5 /
  * minhash / simhash) sees BYTES: "café" in NFC (U+00E9) and in NFD
  * (U+0065 U+0301) are the same text but different byte strings, so a
  * corpus mixing encoders silently fails to dedup — every hash stage needs
  * a canonical form first. `UnicodeNormalize` applies a java.text
  * Normalizer form (NFC for byte-canonical text, NFKC to additionally fold
  * compatibility variants: fullwidth ASCII "ＡＢＣ", ligatures, superscripts
  * — what a multilingual web corpus actually contains). Codegen'd narrow
  * map — composes at the head of a curation pipeline at no extra shuffle.
  */
case class UnicodeNormalize(child: Expression, form: String)
  extends UnaryExpression with ImplicitCastInputTypes {
  require(TextNorm.Forms.contains(form), s"unsupported form $form")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = s"graft_${form.toLowerCase}"
  @transient private lazy val resolvedForm: java.text.Normalizer.Form =
    java.text.Normalizer.Form.valueOf(form)
  override protected def nullSafeEval(input: Any): Any =
    TextNorm.normalize(input.asInstanceOf[UTF8String], resolvedForm)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // The Form enum is resolved once and referenced from generated code —
    // per-row work is only isNormalized + (rarely) normalize.
    val f = ctx.addReferenceObj("form", resolvedForm, "java.text.Normalizer.Form")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.normalize($c, $f)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextNorm {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  // Forms resolved ONCE — the codegen path calls normalize per row, and a
  // per-row Enum.valueOf is avoidable work on a narrow-map hot path.
  private val formOf: Map[String, java.text.Normalizer.Form] =
    Forms.iterator.map(f => f -> java.text.Normalizer.Form.valueOf(f)).toMap

  def normalize(s: UTF8String, form: String): UTF8String =
    normalize(s, formOf(form))

  def normalize(s: UTF8String, f: java.text.Normalizer.Form): UTF8String = {
    val str = s.toString
    // Normalizer.isNormalized is a cheap scan; most real text is already
    // NFC, so the common case allocates nothing.
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }
}

/** Greedy longest-match subword tokenization against a broadcast-literal
  * vocabulary — the real form of the BPE-ish token count (the proxy in
  * [[TextAnalysis.subwordCount]] estimates; this segments). Semantics per
  * whitespace word: repeatedly take the LONGEST vocab entry prefixing the
  * remaining suffix; if none matches, emit the single next character as
  * its own token (the byte-fallback convention) and continue. This is
  * WordPiece-style inference (Devlin et al. 2019 §"WordPiece") without
  * continuation markers — deterministic, vocab-driven, and exactly
  * hand-checkable in a spec.
  *
  * Scale shape: the vocab rides the serialized expression tree (one copy
  * per stage broadcast, like any literal — a real 30k-token vocab is
  * ~300 KB), compiled once per executor into a char trie; each row is then
  * one linear scan. A narrow codegen'd map stage — the same plan shape as
  * every other TextAnalysis feature.
  */
case class BpeEncode(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(StringType, ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe"

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure("graft_bpe vocabulary must be a literal array")
    else TypeCheckResult.TypeCheckSuccess
  }

  /** Trie compiled once per (executor, expression instance): the vocab
    * child is foldable, so this evaluates it without a row.
    */
  @transient private lazy val trie: BpeTrie = {
    val arr = right.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val words = (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
    BpeTrie(words)
  }

  def encode(text: UTF8String): GenericArrayData = trie.encode(text.toString)

  override protected def nullSafeEval(text: Any, vocab: Any): Any =
    encode(text.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpe", this, classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev, (t, _) => s"${ev.value} = $ref.encode($t);")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Flat-map char trie over the vocabulary; terminal nodes mark vocab
  * entries. Longest match = walk as deep as the trie allows, remembering
  * the last terminal depth.
  */
private[functions] case class BpeTrie(vocab: Seq[String]) {
  private val root = new BpeTrie.Node
  vocab.foreach { w =>
    if (w.nonEmpty) {
      var n = root
      w.foreach(c => n = n.children.computeIfAbsent(c, _ => new BpeTrie.Node))
      n.terminal = true
    }
  }

  def encode(text: String): GenericArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    var w = 0
    val words = text.split("\\s+")
    while (w < words.length) {
      val word = words(w)
      var i = 0
      while (i < word.length) {
        // longest vocab prefix of word[i..); -1 if none
        var n = root
        var j = i
        var best = -1
        var live = true
        while (live && j < word.length) {
          val nxt = n.children.get(word.charAt(j))
          if (nxt == null) live = false
          else {
            n = nxt
            j += 1
            if (n.terminal) best = j
          }
        }
        if (best > i) {
          out += UTF8String.fromString(word.substring(i, best))
          i = best
        } else {
          // Out-of-vocab: single CODE POINT fallback token. Advancing one
          // UTF-16 char would split a supplementary-plane character
          // (emoji, CJK ext-B) into two lone surrogates, which encode as
          // replacement bytes and break the re-concatenation invariant.
          val cp = Character.charCount(word.codePointAt(i))
          out += UTF8String.fromString(word.substring(i, i + cp))
          i += cp
        }
      }
      w += 1
    }
    new GenericArrayData(out.toArray)
  }
}

private[functions] object BpeTrie {
  final class Node {
    val children = new java.util.HashMap[Character, Node](4)
    var terminal = false
  }
}
