package graft

import org.apache.spark.sql.functions._

import graft.functions.Gram

/** T1/T3 for ops/Stats + functions/Gram: the single-pass moment matrix
  * must be exact (bit-identical across partitionings — the property that
  * makes a d²-sized float statistic oracle-hashable), and the derived
  * statistics must match hand computations.
  */
class StatsSpec extends SparkSpec {

  test("triIndex bijects the upper triangle in (i, j>=i) row-major order") {
    val d = 5
    val seen = for { i <- 0 until d; j <- i until d } yield Gram.triIndex(d, i, j)
    assert(seen === (0 until d * (d + 1) / 2))
  }

  test("GramAgg: exact sums equal hand-computed BigDecimal moments; partitioning-invariant") {
    import spark.implicits._
    Gram.register(spark)
    val d = 3
    val vecs = Seq(
      Seq(0.5f, -1.25f, 2.0f),
      Seq(1.1f, 0.000001f, -0.75f),
      Seq(-2.5f, 3.25f, 0.125f),
      Seq(0.33f, -0.66f, 0.99f),
      Seq(1.5f, 1.5f, 1.5f))
    def gram(parts: Int) = {
      val q = transform(col("embedding"),
        e => (e.cast("decimal(18,6)") * lit(1000000)).cast("long"))
      vecs.toDF("embedding").repartition(parts)
        .select(q.as("q"))
        .agg(expr(s"graft_gram_agg(q, $d)").as("g"))
        .select(col("g.n"), col("g.m"))
        .head()
    }
    val one = gram(1)
    val many = gram(7)
    assert(one.getLong(0) === 5L)
    // bit-identical decimals regardless of partitioning — integer-exact
    assert(one.getSeq[java.math.BigDecimal](1) === many.getSeq[java.math.BigDecimal](1))
    // hand computation: quantize each float at scale 6 (HALF_UP on the
    // double value — the engines' decimal-cast semantics), then exact sums
    val q = vecs.map(_.map(f =>
      new java.math.BigDecimal(f.toDouble).setScale(6, java.math.RoundingMode.HALF_UP)))
    val m = one.getSeq[java.math.BigDecimal](1)
    for (i <- 0 until d) {
      val expected = q.map(_(i)).reduce(_ add _).setScale(12)
      assert(m(i).compareTo(expected) === 0, s"sum dim $i")
      for (j <- i until d) {
        val expP = q.map(v => v(i).multiply(v(j))).reduce(_ add _).setScale(12)
        assert(m(d + Gram.triIndex(d, i, j)).compareTo(expP) === 0, s"prod ($i,$j)")
      }
    }
  }

  test("GramAgg: dimension mismatch fails loudly") {
    import spark.implicits._
    Gram.register(spark)
    val bad = Seq(Seq(1.0f, 2.0f)).toDF("embedding")
      .select(transform(col("embedding"),
        e => (e.cast("decimal(18,6)") * lit(1000000)).cast("long")).as("q"))
    val e = intercept[Exception] {
      bad.agg(expr("graft_gram_agg(q, 3)")).collect()
    }
    assert(e.getMessage != null)
  }

  test("x_emb_cov: diagonal entries are nonnegative variances; frame is the full triangle") {
    val rows = SparkEntry.queries("x_emb_cov")(spark, sf()).collect()
    assert(rows.length === 64 * 65 / 2)
    val diag = rows.filter(r => r.getAs[Long]("i") == r.getAs[Long]("j"))
    assert(diag.length === 64)
    diag.foreach { r =>
      assert(r.getAs[Double]("cov") >= -1e-9,
        s"negative variance at dim ${r.getAs[Long]("i")}")
    }
  }

  test("x_emb_pca: unit-norm vector whose Rayleigh quotient beats the start vector") {
    val d = 64
    val out = SparkEntry.queries("x_emb_pca")(spark, sf()).collect()
    assert(out.length === d)
    val v = out.sortBy(_.getAs[Long]("i")).map(_.getAs[Double]("v"))
    val eig = out.head.getAs[Double]("eigval")
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-3, "not unit norm")
    assert(eig > 0.0)
    // rebuild the matrix from the graded cov key and check the invariant
    // that holds REGARDLESS of spectral gap: 8 power rounds cannot
    // decrease the Rayleigh quotient vs the uniform start vector
    val m = Array.ofDim[Double](d, d)
    SparkEntry.queries("x_emb_cov")(spark, sf()).collect().foreach { r =>
      val i = r.getAs[Long]("i").toInt
      val j = r.getAs[Long]("j").toInt
      m(i)(j) = r.getAs[Double]("cov")
      m(j)(i) = r.getAs[Double]("cov")
    }
    def rayleigh(x: Array[Double]): Double = {
      val mx = (0 until d).map(i => (0 until d).map(j => m(i)(j) * x(j)).sum)
      (0 until d).map(i => x(i) * mx(i)).sum / x.map(a => a * a).sum
    }
    val v0 = Array.fill(d)(0.125)
    assert(rayleigh(v) >= rayleigh(v0) - 1e-9,
      s"Rayleigh ${rayleigh(v)} fell below start ${rayleigh(v0)}")
    // and the emitted eigenvalue estimate is consistent with the quotient
    assert(math.abs(rayleigh(v) - eig) <= 0.2 * math.max(eig, 1e-9))
  }

  test("a_chi2 on a uniform table is ~0; x_drift_ks on identical slices is 0") {
    // chi2: the graded key's per-nation partials must sum to a small value
    // only when mix is independent — sanity: all partials finite, >= 0
    val chi = SparkEntry.queries("a_chi2")(spark, sf()).collect()
    chi.foreach(r => assert(r.getAs[Double]("chi2_part") >= 0.0))
    // KS between even/odd doc_id slices of the same corpus: small but the
    // statistic itself must sit in [0, 1]
    val ks = SparkEntry.queries("x_drift_ks")(spark, sf()).head()
    val v = ks.getAs[Double]("ks")
    assert(v >= 0.0 && v <= 1.0)
  }
}
