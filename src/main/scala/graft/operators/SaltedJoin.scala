package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigating equi-join (SURVEY §4.2 / north star "salting for skew").
  *
  * When one join key carries a disproportionate share of rows, a shuffled
  * equi-join puts that key's entire workload in one task. Salting splits
  * it: the LEFT side gets a deterministic salt in [0, n) derived from a
  * spread column (so rows of a hot key scatter over n partitions), the
  * RIGHT side is replicated n× with every salt value, and the join key
  * becomes (key, salt). Results are identical to the plain join; shuffle
  * volume grows by n× of the (smaller) right side — the standard trade.
  *
  * AQE's skew-join handles sort-merge skew automatically at runtime; this
  * helper is for the cases AQE can't split (e.g. aggregation keys fed by
  * the join, or deliberate replicated-broadcast topologies).
  */
object SaltedJoin {

  def join(left: DataFrame, right: DataFrame, key: String, spread: Column,
      nSalts: Int): DataFrame = {
    val l = left.withColumn("_salt", pmod(hash(spread), lit(nSalts)))
    val r = right.withColumn("_salt", explode(sequence(lit(0), lit(nSalts - 1))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}
