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

  /** 64-bit SimHash of whitespace tokens. Tokens are hashed once by the
    * inner `transform`, and the vote fold receives each hash as a LAMBDA
    * VARIABLE — referencing a lambda variable is a value lookup, so the
    * 64 inner bit-tests per token test a stored long. (HOF lambdas have
    * no common-subexpression elimination: embedding `xxhash64(t)` — or a
    * reference to a named hash-array Column — inside the per-bit lambda
    * re-evaluates it per bit.) Shift amounts are columns → call_function
    * (the Scala shiftleft/right API only takes literal ints).
    */
  def simhash64(text: Column): Column = {
    val votes = aggregate(
      transform(split(text, "\\s+"), t => xxhash64(t)),
      array_repeat(lit(0), 64),
      (acc, h) =>
        zip_with(acc, sequence(lit(0), lit(63)), (a, b) =>
          a + when(call_function("shiftright", h, b)
            .bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)), (v, i) =>
        when(v >= 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
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
