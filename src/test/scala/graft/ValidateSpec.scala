package graft

import org.apache.spark.sql.functions._
import graft.operators.Validate

/** T1 checks for operators/Validate (graded by `x_quality_checks`):
  * every rule type counts its INJECTED violations exactly — nulls,
  * out-of-set, out-of-range, failed expectation, duplicate keys, and
  * referential orphans.
  */
class ValidateSpec extends SparkSpec {
  import spark.implicits._

  private def frame = Seq(
    (1L, Option("alpha"), "en", 5L),
    (2L, Option("beta"), "en", 4L),
    (2L, Option("beta"), "en", 4L),     // dup doc_id (twice => 1 extra)
    (3L, None, "xx", 99L),              // null text, bad lang, bad range
    (4L, Option("gamma"), "de", -1L)    // bad range (negative)
  ).toDF("doc_id", "text", "lang", "n_chars")

  test("row, uniqueness, and expectation rules count injected violations") {
    val report = Validate.run(frame, Seq(
      Validate.notNull("text"),
      Validate.inSet("lang", Seq("en", "de")),
      Validate.range("n_chars", 0, 10),
      Validate.check("n_chars_small", col("n_chars") < 50),
      Validate.unique("doc_id")))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(report("not_null:text") === ((5L, 1L)))
    assert(report("in_set:lang") === ((5L, 1L)))
    assert(report("range:n_chars") === ((5L, 2L)))
    assert(report("check:n_chars_small") === ((5L, 1L)))
    assert(report("unique:doc_id") === ((5L, 1L)))
  }

  test("refIntegrity counts orphans, exempts nulls, and names the rule") {
    val child = Seq(Option(1L), Option(2L), Option(7L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Validate.refIntegrity("child_parent", child, "fk", parent, "pk")
      .as[(String, Long, Long)].head()
    assert(r === (("ref:child_parent", 3L, 1L)))
  }

  test("an empty rule suite is rejected loudly, not silently green") {
    val e = intercept[IllegalArgumentException](Validate.run(frame, Nil))
    assert(e.getMessage.contains("at least one rule"))
  }

  test("NULL semantics: domain rules pass NULL values, check violates on NULL") {
    // The documented asymmetry (Validate.scala NULL-semantics note):
    // range/inSet constrain the domain of PRESENT values — a NULL n_chars
    // passes range (absence is notNull's job); check treats an
    // unevaluable (NULL) expectation as broken, i.e. a violation.
    val withNulls = Seq(
      (1L, Option(5L)), (2L, None), (3L, Option(99L))
    ).toDF("doc_id", "n_chars")
    val report = Validate.run(withNulls, Seq(
      Validate.range("n_chars", 0, 10),
      Validate.check("n_chars_small", col("n_chars") < 50)))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(report("range:n_chars") === 1L)       // only 99 violates; NULL passes
    assert(report("check:n_chars_small") === 2L) // 99 AND the NULL violate
  }

  test("an all-green suite reports zero violations everywhere") {
    val clean = frame.filter(col("doc_id") <= 2).dropDuplicates("doc_id")
    val report = Validate.run(clean, Seq(
      Validate.notNull("text"), Validate.unique("doc_id")))
      .as[(String, Long, Long)].collect()
    assert(report.forall(_._3 === 0L))
  }
}
