package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{SimHash, TextAnalysis}
import graft.operators.Volume

/** T3 scalacheck-generated invariants. Inputs come from seeded Gen (fully
  * deterministic); each property evaluates over ONE generated DataFrame in
  * one Spark job, asserting the invariant row-wise — not one job per
  * sample, which would be prohibitively slow.
  */
class GeneratedPropertySpec extends SparkSpec {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val word: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val doc: Gen[String] =
    Gen.choose(1, 40).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))

  test("property: histogram mass conservation on random volumes") {
    val dims = sample(Gen.listOfN(3, Gen.choose(1, 6)), 1L)
    val vals = sample(Gen.listOfN(dims.product, Gen.choose(-50.0, 450.0)), 2L)
    val it = vals.iterator
    val vol = Volume.fromArray(spark, "rnd",
      Array.fill(dims(0), dims(1), dims(2))(it.next().toFloat))
    val mass = Volume.histogram(vol, 0, 400, 16).agg(sum("cnt")).head().getLong(0)
    assert(mass === dims.product.toLong) // out-of-range values clamp into edge bins
  }

  test("property: shingle Jaccard is symmetric, bounded, and 1 on self") {
    import spark.implicits._
    val docs = sample(Gen.listOfN(40, doc), 3L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("id", "text").filter(length(col("text")) >= 3)
    val a = df.select(col("id").as("ia"), col("text").as("ta"))
    val b = df.select(col("id").as("ib"), col("text").as("tb"))
    val pairs = a.crossJoin(b)
      .select(col("ia"), col("ib"),
        TextAnalysis.shingleJaccard(col("ta"), col("tb"), 3).as("jab"),
        TextAnalysis.shingleJaccard(col("tb"), col("ta"), 3).as("jba"))
      .collect()
    pairs.foreach { r =>
      val (ia, ib, jab, jba) = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(jab >= 0.0 && jab <= 1.0)
      assert(jab === jba, s"asymmetric for ($ia,$ib)")
      if (ia == ib) assert(jab === 1.0)
    }
  }

  test("property: simhash self-distance 0, symmetric hamming <= 64") {
    import spark.implicits._
    val docs = sample(Gen.listOfN(30, doc), 4L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val sigs = docs.toDF("id", "text")
      .select(col("id"), SimHash.simhash64(col("text")).as("sig"))
    val a = sigs.select(col("id").as("ia"), col("sig").as("sa"))
    val b = sigs.select(col("id").as("ib"), col("sig").as("sb"))
    val rows = a.crossJoin(b)
      .select(col("ia"), col("ib"), SimHash.hamming(col("sa"), col("sb")).as("h"),
        SimHash.hamming(col("sb"), col("sa")).as("h2"))
      .collect()
    rows.foreach { r =>
      val h = r.getInt(2)
      assert(h >= 0 && h <= 64)
      assert(h === r.getInt(3))
      if (r.getLong(0) == r.getLong(1)) assert(h === 0)
    }
  }

  test("property: clamp stays within bounds for random inputs and bounds") {
    import spark.implicits._
    graft.ops.Custom.register(spark)
    val xs = sample(Gen.listOfN(200, Gen.choose(-1e6, 1e6)), 5L)
    val bounds = sample(Gen.listOfN(200, Gen.choose(-1e3, 1e3)), 6L)
      .grouped(2).map(p => (math.min(p(0), p(1)), math.max(p(0), p(1)))).toSeq
    val df = xs.zip(bounds ++ bounds).map { case (x, (lo, hi)) => (x, lo, hi) }
      .toDF("x", "lo", "hi")
      .selectExpr("x", "lo", "hi", "graft_clamp(x, lo, hi) AS c")
    df.collect().foreach { r =>
      val (lo, hi, c) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(c >= lo && c <= hi)
    }
  }

  test("property: fingerprint is deterministic and content-sensitive") {
    import spark.implicits._
    val docs = sample(Gen.listOfN(50, doc), 7L).distinct
    val fp1 = docs.toDF("text").select(TextAnalysis.fingerprint(col("text")))
      .collect().map(_.getLong(0)).toSeq
    val fp2 = docs.toDF("text").select(TextAnalysis.fingerprint(col("text")))
      .collect().map(_.getLong(0)).toSeq
    assert(fp1 === fp2)
    // distinct docs rarely collide under a ~2^42 modulus; allow none here
    assert(fp1.distinct.size === docs.size)
  }
}
