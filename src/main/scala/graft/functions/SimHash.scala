package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SimHash document fingerprints (north star: SimHash dedup).
  *
  * Classic 64-bit SimHash: per bit b, sum ±1 over the xxhash64 of each
  * token's bit b; the sign becomes signature bit b. Hamming-close
  * signatures ⇔ high token overlap. Pure Column expression (nested HOFs,
  * codegen'd, per-row) — one narrow map stage at any scale.
  */
object SimHash {

  /** 64-bit SimHash of whitespace tokens. Tokens are hashed ONCE up front
    * (`hs`); the per-bit majority vote then folds over the cached hashes —
    * not 64 re-hashes per token. Shift amounts are columns →
    * call_function (the Scala shiftleft/right API only takes literal ints).
    */
  def simhash64(text: Column): Column = {
    val hs = transform(split(text, "\\s+"), t => xxhash64(t))
    val bits = transform(sequence(lit(0), lit(63)), b =>
      when(aggregate(hs, lit(0),
        (acc, h) => acc +
          when(call_function("shiftright", h, b)
            .bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)) >= 0,
        lit(1L)).otherwise(lit(0L)))
    aggregate(
      zip_with(bits, sequence(lit(0), lit(63)),
        (bit, i) => call_function("shiftleft", bit, i)),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** The i-th 16-bit band of a signature (i in 0..3) — LSH blocking key:
    * two signatures within hamming distance 3 share at least one of the
    * four bands (pigeonhole), so a band-bucket join finds all such pairs
    * without any cross product.
    */
  def band16(sig: Column, i: Int): Column =
    shiftright(sig, 16 * i).bitwiseAND(lit(0xFFFFL))
}
