package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation
import graft.ops.T

/** T1/T3 specs for the end-to-end corpus-curation composition. */
class CurationSpec extends SparkSpec {

  private val enA = "the cat sat on the mat and it is a good day for all " +
    "of us to be out in the sun with a book and a cup of tea"
  private val enANear = enA.replace("tea", "milk") // one-token edit
  private val enB = "this is a different story about the sea and the ships " +
    "that sail on it for many days and nights in a row"
  private val de = "der hund ist nicht mit der katze und das ist ein " +
    "problem zu den zeiten in denen der winter kommt"
  private val junk = "!!!###$$$%%%^^^&&&***((()))___+++"

  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, enA), // kept
      (2L, enA), // exact dup of 1 → dropped
      (3L, enANear), // near-dup of 1 → dropped
      (4L, enB), // kept
      (5L, junk), // quality-gated
      (6L, de) // kept, lang=de
    ).toDF("doc_id", "text")
  }

  test("curate drops exact dups, near-dups, and junk; keeps the rest") {
    val out = Curation.curate(fixture, minQuality = 0.5).collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId.keySet === Set(1L, 4L, 6L))
    assert(byId(1L).getString(1) === "en")
    assert(byId(6L).getString(1) === "de")
    assert(out.forall(_.getDouble(2) >= 0.5))
    assert(byId(1L).getInt(3) === enA.split("\\s+").length)
  }

  test("near-dup stage keeps the chain minimum deterministically") {
    import spark.implicits._
    // a chain of one-token edits: 10 kills 11, 11's membership kills 12
    val chain = Seq(
      (10L, enA),
      (11L, enA.replace("tea", "milk")),
      (12L, enA.replace("tea", "milk").replace("cat", "dog"))
    ).toDF("doc_id", "text")
    val kept = Curation.curate(chain, minQuality = 0.5).collect().map(_.getLong(0))
    assert(kept.toSet === Set(10L))
  }

  test("report aggregates per-language docs/tokens/quality") {
    val rep = Curation.report(Curation.curate(fixture, minQuality = 0.5))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rep.keySet === Set("en", "de"))
    assert(rep("en")._1 === 2 && rep("de")._1 === 1)
    assert(rep("de")._2 === de.split("\\s+").length)
  }

  test("curate on the documents table: no exact dupes survive, rows remain") {
    val docs = T.t(spark, sf(), "documents").select("doc_id", "text")
    val out = Curation.curate(docs).persist()
    val n = out.count()
    assert(n > 0)
    val distinctHashes = out.select(md5(col("text"))).distinct().count()
    assert(distinctHashes === n) // exact dedup actually happened
    out.unpersist()
  }
}
