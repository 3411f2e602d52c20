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
    // collision-free helper name: an input frame legitimately owning a
    // `_salt` column (e.g. output of another salting pass) would
    // otherwise silently join on the wrong thing
    val taken = (left.columns ++ right.columns).toSet
    val salt = Iterator.from(0)
      .map(i => if (i == 0) "_salt" else s"_salt$i")
      .find(!taken(_)).get
    val l = left.withColumn(salt, pmod(hash(spread), lit(nSalts)))
    val r = right.withColumn(salt, explode(sequence(lit(0), lit(nSalts - 1))))
    l.join(r, Seq(key, salt)).drop(salt)
  }

  /** DATA-SIZED salt factors: one row per `key` value with
    * `_nsalts = clamp(ceil(n_key / target), 1, cap)`. A fixed factor
    * (worse: one tied to `spark.sql.shuffle.partitions`) replicates the
    * right side in proportion to CONFIGURATION — at a real cluster's
    * thousands of shuffle partitions the shuffle volume scales with
    * cluster size at constant data. Deriving the factor from measured
    * group sizes instead means: groups small enough for one task's
    * share of the quadratic work pay ZERO replication (`_nsalts` = 1),
    * and a hot group is split just enough (`target` rows per salt cell),
    * never more than `cap`. One tiny aggregation (key-cardinality rows —
    * broadcast it into the salted join); the declarative form keeps the
    * whole decision inside the plan, no driver action.
    *
    * `_nsalts` is this function's OUTPUT CONTRACT (consumers join it in
    * and read it by name), so unlike [[join]]'s internal salt it cannot
    * be renamed per call — the require below makes a caller whose frame
    * already owns `_nsalts` fail loudly instead of mis-joining.
    */
  def saltCounts(df: DataFrame, key: String, target: Long, cap: Int): DataFrame = {
    require(!df.columns.contains("_nsalts"),
      "saltCounts reserves the output column name _nsalts; rename it in the input frame")
    df.groupBy(key).agg(count(lit(1)).as("_n"))
      .select(col(key),
        least(lit(cap), greatest(lit(1),
          ceil(col("_n").cast("double") / target))).cast("int").as("_nsalts"))
  }
}
