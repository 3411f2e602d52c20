package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.SimHash
import graft.operators.{Ann, SaltedJoin}
import graft.ops.T

/** T1/T3 specs for the ANN scale path, SimHash dedup, salted joins, and
  * the SparkSessionExtensions installer.
  */
class AnnSpec extends SparkSpec {

  private def emb = T.t(spark, sf(), "embeddings")
  private def probes = emb.filter(col("vec_id") <= 10)

  test("bruteTopK returns k ranked neighbors per probe, cosine descending") {
    val out = Ann.bruteTopK(emb, probes, 5).collect()
    assert(out.length === 55) // 11 probes (vec_id 0..10) × 5
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("lshTopK: candidates are verified-exact, recall vs brute force measured") {
    val brute = Ann.bruteTopK(emb, probes, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Ann.lshTopK(emb, probes, 5, nBits = 16, nBands = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    info(f"LSH recall@5 = $recall%.2f (candidates share >=1 of 4 four-bit bands)")
    // 4 bands × 4 bits on near-orthogonal random vectors: candidate set is
    // large, recall should be well above chance (5/499 ≈ 0.01)
    assert(recall >= 0.5, f"recall $recall%.2f unexpectedly low")
    // every reported neighbor must carry its true exact cosine
    val cos = Ann.lshTopK(emb, probes, 5).collect().map(_.getDouble(3))
    assert(cos.forall(c => c >= -1.0000001 && c <= 1.0000001))
  }

  test("lshTopK multi-probe: radius-1 band perturbation only adds candidates") {
    val brute = Ann.bruteTopK(emb, probes, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val r0 = Ann.lshTopK(emb, probes, 5, nBits = 16, nBands = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val r1 = Ann.lshTopK(emb, probes, 5, nBits = 16, nBands = 4, probeRadius = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (rec0, rec1) = ((brute & r0).size.toDouble / brute.size,
      (brute & r1).size.toDouble / brute.size)
    info(f"LSH recall@5: radius 0 = $rec0%.2f, radius 1 = $rec1%.2f")
    // radius-1 candidates are a superset, so top-k recall cannot drop
    assert(rec1 >= rec0)
    assert(rec1 >= 0.7, f"multi-probe recall $rec1%.2f unexpectedly low")
  }

  test("lshTopKIndexed: exact parity with lshTopK; no corpus signature recompute") {
    Ann.writeLshIndex(emb, "ann_lsh_idx", buckets = 4)
    try {
      def key(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          math.round(r.getDouble(3) * 1e9))).toSet
      val direct = Ann.lshTopK(emb, probes, 5)
      val indexed = Ann.lshTopKIndexed(spark, "ann_lsh_idx", emb, probes, 5)
      assert(key(indexed) === key(direct))
      // the search-side plan derives band values ("shiftright" over the
      // signature) ONLY for the broadcast probes; the corpus candidates
      // come from the index table scan. The direct form pays it twice.
      def sigStages(df: org.apache.spark.sql.DataFrame) =
        "shiftright".r.findAllIn(df.queryExecution.optimizedPlan.toString).size
      assert(sigStages(direct) === 2)
      assert(sigStages(indexed) === 1,
        s"corpus signatures recomputed:\n${indexed.queryExecution.optimizedPlan}")
      assert(indexed.queryExecution.optimizedPlan.toString.contains("ann_lsh_idx"))
      // multi-probe works against the index too (perturbation is on the
      // probe side only — the index is untouched by radius)
      val r1direct = Ann.lshTopK(emb, probes, 5, probeRadius = 1)
      val r1idx = Ann.lshTopKIndexed(spark, "ann_lsh_idx", emb, probes, 5, probeRadius = 1)
      assert(key(r1idx) === key(r1direct))
      // shuffled-probe search (probe set too big to broadcast): same
      // results, and the INDEX side plans with zero Exchange — the equi
      // keys (band, bv) are exactly the bucket keys
      val prevT = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val shuffled = Ann.lshTopKIndexed(spark, "ann_lsh_idx", emb, probes, 5,
          broadcastProbes = false)
        assert(key(shuffled) === key(direct))
        val plan = shuffled.queryExecution.executedPlan.toString
        assert(plan.contains("Bucketed: true"), s"index scan not bucketed:\n$plan")
        // the candidate join's index side must not re-shuffle: every
        // Exchange in the plan partitions on probe/pair columns, never on
        // the index's (band, bv)
        assert(!plan.matches("(?s).*Exchange hashpartitioning\\(band#.*"),
          s"index side re-shuffled:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevT)
      // incremental build: an index over half the corpus plus an append
      // of the other half searches identically to the full build
      val half1 = emb.filter(col("vec_id") % 2 === 0)
      val half2 = emb.filter(col("vec_id") % 2 === 1)
      Ann.writeLshIndex(half1, "ann_lsh_idx2", buckets = 4)
      Ann.appendToLshIndex(half2, "ann_lsh_idx2")
      try assert(key(Ann.lshTopKIndexed(spark, "ann_lsh_idx2", emb, probes, 5)) === key(direct))
      finally spark.sql("DROP TABLE IF EXISTS ann_lsh_idx2")
    } finally spark.sql("DROP TABLE IF EXISTS ann_lsh_idx")
  }

  test("signTopKIndexed: matches the inline sign-bucket search; corpus pays no sign pass") {
    // independent expected result: inline sign-bucket top-k computed with
    // plain DataFrame ops (the x_ann_bucket_topk device, bucket as a
    // string key), no Ann code on the expected side
    import org.apache.spark.sql.expressions.Window
    val e = emb.select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("emb"))
      .withColumn("nrm", sqrt(expr(
        "aggregate(emb, cast(0.0 as double), (a, x) -> a + x * x)")))
      .withColumn("bucket", expr(
        "array_join(transform(slice(emb, 1, 8), x -> CASE WHEN x > 0 THEN '1' ELSE '0' END), '')"))
    val p = e.filter(col("vec_id") <= 10)
      .select(col("vec_id").as("probe_id"), col("emb").as("p_emb"),
        col("nrm").as("p_nrm"), col("bucket").as("p_bucket"))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("vec_id").asc)
    val expected = e.join(p,
        col("bucket") === col("p_bucket") && col("vec_id") =!= col("probe_id"))
      .withColumn("cos", expr(
        "aggregate(zip_with(emb, p_emb, (x, y) -> x * y), cast(0.0 as double), (a, v) -> a + v)")
        / (col("nrm") * col("p_nrm")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("probe_id", "vec_id", "rn", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        math.round(r.getDouble(3) * 1e9))).toSet
    Ann.writeSignIndex(emb, "ann_sign_idx", nBits = 8, nBands = 1, buckets = 4)
    try {
      val indexed = Ann.signTopKIndexed(spark, "ann_sign_idx", emb, probes, 3)
      val got = indexed.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getInt(2), math.round(r.getDouble(3) * 1e9))).toSet
      assert(got === expected)
      // the search plan derives band values (shiftright over the
      // signature) only for the broadcast probes; the corpus side is the
      // index table scan — same assertion device as lshTopKIndexed above
      val sigStages = "shiftright".r
        .findAllIn(indexed.queryExecution.optimizedPlan.toString).size
      assert(sigStages === 1,
        s"corpus sign pass recomputed:\n${indexed.queryExecution.optimizedPlan}")
      assert(indexed.queryExecution.optimizedPlan.toString.contains("ann_sign_idx"))
    } finally spark.sql("DROP TABLE IF EXISTS ann_sign_idx")
  }

  test("signTopKIndexed margin-guided multi-probe: recall dial at constant plan shape") {
    // The recall lever VERDICT r10 asked for: probe the nprobe cheapest
    // perturbations of each band (flip lowest-|margin| bits) instead of
    // a single bucket. Config: two 4-bit bands — single-probe recall is
    // LOW by construction (measured 0.26 on the fixture), and the dial
    // must recover it without ever touching the corpus side of the plan.
    val brute = Ann.bruteTopK(emb, probes, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    Ann.writeSignIndex(emb, "ann_mp_idx", nBits = 8, nBands = 2, buckets = 4)
    try {
      def recallAt(np: Int): Double = {
        val got = Ann.signTopKIndexed(spark, "ann_mp_idx", emb, probes, 3,
          nBands = 2, nprobe = np).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        (got & brute).size.toDouble / brute.size
      }
      val recalls = Seq(1, 4, 8, 11).map(np => np -> recallAt(np))
      info(recalls.map { case (np, r) => f"nprobe $np: $r%.3f" }.mkString(", "))
      // probed-bucket sets nest as nprobe grows, so recall is monotone…
      recalls.sliding(2).foreach { case Seq((_, a), (np, b)) =>
        assert(b >= a, s"recall fell at nprobe $np")
      }
      // …and the dial actually spans the range: near-blind single-probe,
      // >= 0.9 at full weight-<=2 probing (measured 0.26 -> 0.97; both
      // deterministic — sign signatures and margins have no RNG)
      assert(recalls.head._2 < 0.6)
      assert(recalls.last._2 >= 0.9,
        f"multi-probe recall ${recalls.last._2}%.3f below 0.9")
      // plan shape: the fan-out is probe-side only — the corpus side is
      // still the bucketed index scan with zero signature recompute
      val plan = Ann.signTopKIndexed(spark, "ann_mp_idx", emb, probes, 3,
        nBands = 2, nprobe = 8).queryExecution.optimizedPlan.toString
      assert("shiftright".r.findAllIn(plan).size === 1,
        s"corpus sign pass recomputed:\n$plan")
      assert(plan.contains("ann_mp_idx"))
    } finally spark.sql("DROP TABLE IF EXISTS ann_mp_idx")
  }

  test("lshTopKIndexed margin-guided multi-probe: recall >= 0.9 at nprobe 4") {
    // The gaussian-family twin of the sign-LSH dial: bit i's margin is
    // |dot(emb, plane_i)| — the r10 VERDICT's target ("recall >= 0.9 at
    // nprobe 4") lands exactly here (measured 0.51 -> 0.95 -> 1.0; all
    // deterministic, seeded planes).
    val brute = Ann.bruteTopK(emb, probes, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    Ann.writeLshIndex(emb, "ann_gmp_idx", nBits = 16, nBands = 4, buckets = 8)
    try {
      def recallAt(np: Int): Double = {
        val got = Ann.lshTopKIndexed(spark, "ann_gmp_idx", emb, probes, 5,
          nprobe = np).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        (got & brute).size.toDouble / brute.size
      }
      val (r1, r4, r11) = (recallAt(1), recallAt(4), recallAt(11))
      info(f"gaussian multi-probe recall@5: nprobe1 $r1%.3f nprobe4 $r4%.3f nprobe11 $r11%.3f")
      assert(r4 >= r1 && r11 >= r4, "recall must be monotone in nprobe")
      assert(r4 >= 0.9, f"nprobe-4 recall $r4%.3f below the 0.9 target")
    } finally spark.sql("DROP TABLE IF EXISTS ann_gmp_idx")
  }

  test("writeIvfIndex/ivfTopKIndexed: pruned-list search with brute-force-grade recall") {
    Ann.writeIvfIndex(emb, "ann_ivf_idx", nLists = 8, iters = 3)
    try {
      // side table carries exactly the centroid matrix
      assert(spark.table("ann_ivf_idx_centroids").count() === 8)
      val indexed = Ann.ivfTopKIndexed(spark, "ann_ivf_idx", emb, probes, 5,
        nProbe = 3)
      val got = indexed.collect()
      // ranked output per probe, cosine descending, k respected
      got.groupBy(_.getLong(0)).foreach { case (_, rows) =>
        assert(rows.length <= 5)
        val byRank = rows.sortBy(_.getInt(2)).map(_.getDouble(3))
        assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
      }
      val brute = Ann.bruteTopK(emb, probes, 5).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (brute & got.map(r => (r.getLong(0), r.getLong(1))).toSet)
        .size.toDouble / brute.size
      info(f"IVF indexed recall@5 = $recall%.2f (8 lists, 3 probed)")
      assert(recall >= 0.5, f"indexed IVF recall $recall%.2f unexpectedly low")
      // the on-disk inverted-file property: the index scan carries a
      // literal partition filter on the probed list ids — the plan never
      // reads the unprobed lists' directories
      val plan = indexed.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [cid"),
        s"no partition pruning on the IVF scan:\n$plan")
      // incremental ingest: a half-corpus build + append of the other
      // half — appended vectors route through the EXISTING centroids (no
      // retrain), so membership is complete and recall stays search-grade
      Ann.writeIvfIndex(emb.filter(col("vec_id") % 2 === 0), "ann_ivf_half",
        nLists = 8, iters = 3)
      try {
        Ann.appendToIvfIndex(emb.filter(col("vec_id") % 2 === 1), "ann_ivf_half")
        assert(spark.table("ann_ivf_half").count() === emb.count())
        val appended = Ann.ivfTopKIndexed(spark, "ann_ivf_half", emb, probes, 5,
          nProbe = 3).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        // different centroids (trained on half) ⇒ different routing is
        // fine; the structural claims are full membership + recall
        val rec = (brute & appended).size.toDouble / brute.size
        info(f"IVF append recall@5 = $rec%.2f (half build + half append)")
        assert(rec >= 0.4, f"append-path recall $rec%.2f unexpectedly low")
      } finally {
        spark.sql("DROP TABLE IF EXISTS ann_ivf_half")
        spark.sql("DROP TABLE IF EXISTS ann_ivf_half_centroids")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS ann_ivf_idx")
      spark.sql("DROP TABLE IF EXISTS ann_ivf_idx_centroids")
    }
  }

  test("IVF drift trigger: skewed append flags rebuild; rebuild restores recall and clears the flag") {
    val even = emb.filter(col("vec_id") % 2 === 0)
      .select("vec_id", "embedding")
    // the drift source: the odd half SHIFTED off the training distribution
    // (routes through the old centroids into whichever lists are nearest,
    // walking those lists' means away from their stored centroids)
    val shifted = emb.filter(col("vec_id") % 2 === 1)
      .select((col("vec_id") + 100000L).as("vec_id"),
        expr("transform(embedding, x -> cast(x + 3.0 as float))").as("embedding"))
    val full = even.unionByName(shifted)
    Ann.writeIvfIndex(even, "ann_ivf_drift", nLists = 8, iters = 3)
    try {
      // a fresh build on its own data does not flag
      assert(!Ann.needsRebuild(spark, "ann_ivf_drift", even))
      Ann.appendToIvfIndex(shifted, "ann_ivf_drift")
      // past the bound: the off-distribution append must flag
      assert(Ann.needsRebuild(spark, "ann_ivf_drift", full),
        "skewed append did not trip the drift trigger")
      val probesS = shifted.limit(5)
      val brute = Ann.bruteTopK(full, probesS, 5).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def recall(t: String): Double = {
        val got = Ann.ivfTopKIndexed(spark, t, full, probesS, 5, nProbe = 3)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        (brute & got).size.toDouble / brute.size
      }
      val recDrift = recall("ann_ivf_drift")
      // rebuild = the compaction analog: retrain on what the index holds
      Ann.writeIvfIndex(full, "ann_ivf_drift", nLists = 8, iters = 3)
      assert(!Ann.needsRebuild(spark, "ann_ivf_drift", full),
        "rebuild did not clear the drift flag")
      val recRebuilt = recall("ann_ivf_drift")
      info(f"IVF recall@5 on shifted probes: drifted $recDrift%.2f -> rebuilt $recRebuilt%.2f")
      assert(recRebuilt >= 0.5, f"rebuilt recall $recRebuilt%.2f below build grade")
      assert(recRebuilt >= recDrift - 0.05,
        f"rebuild lost recall: $recDrift%.2f -> $recRebuilt%.2f")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ann_ivf_drift")
      spark.sql("DROP TABLE IF EXISTS ann_ivf_drift_centroids")
    }
  }

  test("IVF epoch stamp: a torn centroids/lists write fails loudly at read time") {
    Ann.writeIvfIndex(emb.limit(100), "ann_ivf_torn", nLists = 4, iters = 2)
    try {
      // simulate the crash window: centroids replaced (new epoch), lists
      // left from the previous build (old epoch)
      val c = spark.table("ann_ivf_torn_centroids")
      val rows = c.collect().toIndexedSeq.map(r =>
        org.apache.spark.sql.Row(r.get(0), r.get(1), "torn-epoch"))
      val schema = c.schema
      spark.sql("DROP TABLE IF EXISTS ann_ivf_torn_centroids")
      spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
        .write.format("parquet").saveAsTable("ann_ivf_torn_centroids")
      val e = intercept[IllegalStateException] {
        Ann.ivfTopKIndexed(spark, "ann_ivf_torn", emb, probes, 3)
      }
      assert(e.getMessage.contains("torn"))
      val e2 = intercept[IllegalStateException] {
        Ann.appendToIvfIndex(emb.limit(10), "ann_ivf_torn")
      }
      assert(e2.getMessage.contains("torn"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS ann_ivf_torn")
      spark.sql("DROP TABLE IF EXISTS ann_ivf_torn_centroids")
    }
  }

  test("annSearchStream: per-batch indexed search matches batch search") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    Ann.writeLshIndex(emb, "ann_stream_idx", buckets = 4)
    try {
      val probeRows = probes.select("vec_id", "embedding")
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
      val mem = MemoryStream[(Long, Seq[Float])]
      val sink = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Int, Long)]
      val q = graft.streaming.Pipelines.annSearchStream(
        mem.toDF.toDF("vec_id", "embedding"), "ann_stream_idx", emb, 5) { out =>
        val rows = out.collect().map(r => (r.getLong(0), r.getLong(1),
          r.getInt(2), math.round(r.getDouble(3) * 1e9)))
        sink.synchronized { sink ++= rows }
      }
      try {
        mem.addData(probeRows.take(5).toIndexedSeq: _*)
        q.processAllAvailable()
        mem.addData(probeRows.drop(5).toIndexedSeq: _*)
        q.processAllAvailable()
      } finally q.stop()
      val batch = Ann.lshTopKIndexed(spark, "ann_stream_idx", emb, probes, 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          math.round(r.getDouble(3) * 1e9))).toSet
      assert(sink.toSet === batch)
    } finally spark.sql("DROP TABLE IF EXISTS ann_stream_idx")
  }

  test("pqCodebook/pqEncode/pqTopK: Lloyd improves quantization error, ADC ranks sanely") {
    def mse(cb: Array[Array[Array[Double]]]): Double = {
      // mean over vectors and subspaces of the squared distance to the
      // assigned centroid — the quantity one Lloyd round must not worsen
      val codes = Ann.pqEncode(emb, cb)
      val sub = cb(0)(0).length
      val e = emb.select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("emb"))
      codes.join(e, "vec_id").collect().map { r =>
        val v = r.getSeq[Double](3)
        (0 until cb.length).map { s =>
          val c = cb(s)(r.getInt(1 + s))
          v.slice(s * sub, (s + 1) * sub).zip(c)
            .map { case (x, y) => (x - y) * (x - y) }.sum
        }.sum
      }.sum / 500
    }
    val cb0 = Ann.pqCodebook(emb, m = 2, k = 4, rounds = 0) // raw seeds
    val cb1 = Ann.pqCodebook(emb, m = 2, k = 4, rounds = 1)
    val cb3 = Ann.pqCodebook(emb, m = 2, k = 4, rounds = 3)
    val (e0, e1, e3) = (mse(cb0), mse(cb1), mse(cb3))
    info(f"PQ mse: seeds $e0%.4f -> 1 round $e1%.4f -> 3 rounds $e3%.4f")
    assert(e1 < e0, "one Lloyd round must reduce quantization error")
    assert(e3 <= e1 + 1e-9, "further rounds never worsen it")
    // codes live in [0, k)
    val codes = Ann.pqEncode(emb, cb1).collect()
    assert(codes.forall(r => Seq(1, 2).forall { i =>
      val c = r.getInt(i); c >= 0 && c < 4
    }))
    // ADC search: k rows per probe, self excluded, distances ascending
    val top = Ann.pqTopK(emb, probes, 5, cb1).collect()
    assert(top.length === 55)
    top.groupBy(_.getLong(0)).foreach { case (pid, rows) =>
      assert(rows.forall(_.getLong(1) != pid))
      val byRank = rows.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b })
    }
  }

  test("ivfPqTopK: list-pruned ADC search overlaps exact top-k, equi-join plan") {
    // m=4 × pqK=32 (32⁴ product cells over 500 vectors): the graded
    // x_emb_pq uses a tiny 2×4 book for oracle tractability, but ADC
    // RANKING needs realistic codebook resolution — under-resolved books
    // collapse candidates into shared cells and the tie-break decides,
    // which is the coarseness trade, not a bug. nProbe=3 of 8 matches
    // the indexed-IVF recall setting.
    val out = Ann.ivfPqTopK(emb, probes, 5, nProbe = 3,
      m = 4, pqK = 32, pqRounds = 2, refine = 50)
    val plan = out.queryExecution.executedPlan.toString
    // the candidate join must be the cid equi-join (broadcast routed
    // probes), never a full cross of codes × probes
    assert(plan.contains("BroadcastHashJoin"), s"expected cid BHJ:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"exhaustive scan crept in:\n$plan")
    val rows = out.collect()
    rows.groupBy(_.getLong(0)).foreach { case (pid, rs) =>
      assert(rs.length <= 5 && rs.forall(_.getLong(1) != pid))
    }
    // coarse-quantized recall vs exact L2 (ADC is an L2 machine — the
    // cosine baseline would conflate metric mismatch with quantization)
    val all = emb.select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val exact = (0L to 10L).flatMap { pid =>
      val p = all(pid)
      all.toSeq.filter(_._1 != pid)
        .map { case (id, v) =>
          id -> v.zip(p).map { case (x, y) => (x - y) * (x - y) }.sum
        }
        .sortBy { case (id, d) => (d, id) }.take(5)
        .map { case (id, _) => (pid, id) }
    }.toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    info(f"IVFPQ+refine recall@5 vs exact L2 = $recall%.2f")
    assert(recall >= 0.5, f"recall collapsed: $recall%.2f")
    // pure ADC (no refine) ranks coarsely on this data — measured, not
    // asserted: the refine stage is what production deployments run
    val raw = Ann.ivfPqTopK(emb, probes, 5, nProbe = 3,
      m = 4, pqK = 32, pqRounds = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    info(f"  pure-ADC recall@5 = ${(exact & raw).size.toDouble / exact.size}%.2f")
  }

  test("writePqIndex/pqTopKIndexed: indexed search == in-memory PQ; torn epoch throws") {
    Ann.writePqIndex(emb, "ann_pq_idx", m = 2, k = 4, rounds = 1)
    try {
      // deterministic training ⇒ the persisted codebook equals a fresh
      // one, so indexed search must reproduce the in-memory results
      val cb = Ann.pqCodebook(emb, m = 2, k = 4, rounds = 1)
      val mem = Ann.pqTopK(emb, probes, 5, cb).collect()
        .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
      val idx = Ann.pqTopKIndexed(spark, "ann_pq_idx", probes, 5).collect()
        .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
      assert(idx === mem)
      // refine path needs floats and returns exact-L2-ordered rows
      val refined = Ann.pqTopKIndexed(spark, "ann_pq_idx", probes, 5,
        refine = 20, embOpt = Some(emb)).collect()
      assert(refined.length === 55)
      // append: frozen-codebook encode, searchable immediately
      val extra = emb.select((col("vec_id") + 100000L).as("vec_id"),
        col("label"), col("embedding")).limit(50)
      Ann.appendToPqIndex(extra, "ann_pq_idx")
      val withNew = Ann.pqTopKIndexed(spark, "ann_pq_idx", probes, 500)
        .filter(col("vec_id") >= 100000L).count()
      assert(withNew > 0, "appended vectors must be searchable")
      // drift: a SHIFTED append population quantizes measurably worse
      // under the frozen codebook than the build corpus — the rebuild
      // signal, measured not asserted-by-magic-constant
      val buildErr = Ann.pqDriftStats(spark, "ann_pq_idx", emb)
      val shifted = emb.select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> x + cast(3.0 as float))").as("embedding"))
      val driftErr = Ann.pqDriftStats(spark, "ann_pq_idx", shifted)
      info(f"PQ quantization MSE: build $buildErr%.3f, shifted-population $driftErr%.3f")
      assert(driftErr > buildErr * 1.5,
        "shifted population must quantize worse under the frozen codebook")
      // the trigger uses the STORED build MSE as its reference point
      assert(!Ann.pqNeedsRebuild(spark, "ann_pq_idx", emb),
        "build population must not trip the rebuild trigger")
      assert(Ann.pqNeedsRebuild(spark, "ann_pq_idx", shifted),
        "drifted population must trip the rebuild trigger")
      // torn window: codebook replaced with a foreign epoch → loud fail
      val c = spark.table("ann_pq_idx_codebook")
      val rows = c.collect().toIndexedSeq.map(r =>
        org.apache.spark.sql.Row(r.get(0), r.get(1), r.get(2), "torn-epoch",
          r.get(4)))
      val schema = c.schema
      spark.sql("DROP TABLE IF EXISTS ann_pq_idx_codebook")
      spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
        .write.format("parquet").saveAsTable("ann_pq_idx_codebook")
      val e = intercept[IllegalStateException] {
        Ann.pqTopKIndexed(spark, "ann_pq_idx", probes, 5)
      }
      assert(e.getMessage.contains("torn"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS ann_pq_idx")
      spark.sql("DROP TABLE IF EXISTS ann_pq_idx_codebook")
    }
  }

  test("sqQuantize/sqTopK: int8 codes rank nearly as well as float32") {
    val q = Ann.sqQuantize(emb)
    // codes are genuinely int8 and the dequantized error is bounded by
    // one quantization step (scale/2 per component)
    val qRow = q.head()
    assert(qRow.getSeq[Byte](2).forall(b => b >= -127 && b <= 127))
    val brute = Ann.bruteTopK(emb, probes, 5).collect()
    val sq = Ann.sqTopK(q, probes, 5).collect()
    val bSet = brute.map(r => (r.getLong(0), r.getLong(1))).toSet
    val sSet = sq.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bSet & sSet).size.toDouble / bSet.size
    info(f"SQ-8 recall@5 vs float32 = $recall%.2f")
    assert(recall >= 0.9, f"int8 ranking drifted: recall $recall%.2f")
    // quantized cosine tracks the exact cosine closely
    val exact = brute.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val errs = sq.flatMap(r =>
      exact.get((r.getLong(0), r.getLong(1))).map(c => math.abs(c - r.getDouble(3))))
    assert(errs.nonEmpty && errs.max < 0.02, f"max cosine err ${errs.max}%.4f")
  }

  test("ivfTopK: inverted-list search returns ranked verified-exact neighbors") {
    val brute = Ann.bruteTopK(emb, probes, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Ann.ivfTopK(emb, probes, 5, nLists = 8, nProbe = 3)
    val rows = ivf.collect()
    // every probe gets results, ranked by exact cosine, k-bounded
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length <= 5)
      val byRank = rs.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
    val recall = (brute & rows.map(r => (r.getLong(0), r.getLong(1))).toSet).size
      .toDouble / brute.size
    info(f"IVF recall@5 = $recall%.2f (8 lists, 3 probed)")
    assert(recall >= 0.2) // near-orthogonal vectors: IVF partitions carry
                          // little signal; this asserts machinery, not magic
  }

  test("shingleJaccard: identity 1.0, disjoint 0.0, edit-robust middle") {
    import spark.implicits._
    import graft.functions.TextAnalysis
    val df = Seq(("abcdef", "abcdef"), ("abcdef", "uvwxyz"), ("abcdef", "abcdzf"))
      .toDF("a", "b")
      .select(round(TextAnalysis.shingleJaccard(col("a"), col("b"), 3), 4).as("j"))
    val js = df.collect().map(_.getDouble(0))
    assert(js(0) === 1.0)
    assert(js(1) === 0.0)
    assert(js(2) > 0.0 && js(2) < 1.0)
  }

  test("cosineNearDupPairs: canonical ordering, threshold respected, symmetric-free") {
    val pairs = Ann.cosineNearDupPairs(emb, 0.2).collect()
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.2)
    }
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).distinct.length === pairs.length)
  }

  test("SimHash: identical texts hash equal; one-token edit stays hamming-close") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy cat again and again"),
      (4L, "completely different words appear here nothing shared at all today"))
      .toDF("id", "text")
      .select(col("id"), SimHash.simhash64(col("text")).as("sig"))
    val sigs = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) === sigs(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(3L)) < ham(sigs(1L), sigs(4L)))
    assert(ham(sigs(1L), sigs(3L)) <= 16)
  }

  test("SimHash bands: hamming<=3 pairs share a band (pigeonhole blocking)") {
    import spark.implicits._
    val docs = T.t(spark, sf(), "documents")
      .select(col("doc_id"), SimHash.simhash64(col("text")).as("sig"))
    val withBands = docs.select(col("doc_id"), col("sig"),
      array((0 to 3).map(i => SimHash.band16(col("sig"), i)): _*).as("bands"))
    val a = withBands.select(col("doc_id").as("a_id"), col("sig").as("sa"), col("bands").as("ba"))
    val b = withBands.select(col("doc_id").as("b_id"), col("sig").as("sb"), col("bands").as("bb"))
    val closePairs = a.crossJoin(b)
      .filter(col("a_id") < col("b_id") &&
        SimHash.hamming(col("sa"), col("sb")) <= 3)
    val missed = closePairs
      .filter(size(array_intersect(col("ba"), col("bb"))) === 0).count()
    assert(missed === 0)
  }

  test("SaltedJoin equals plain join and spreads a hot key") {
    import spark.implicits._
    // skewed left: 10k rows of one key, 100 of another
    val left = ((1 to 10000).map(i => ("hot", i)) ++ (1 to 100).map(i => ("cold", i)))
      .toDF("k", "v")
    val right = Seq(("hot", 1.5), ("cold", 2.5)).toDF("k", "w")
    val plain = left.join(right, "k").agg(sum(col("v") * col("w"))).head().getDouble(0)
    val salted = SaltedJoin.join(left, right, "k", col("v"), 8)
      .agg(sum(col("v") * col("w"))).head().getDouble(0)
    assert(salted === plain)
  }

  test("SaltedJoin.saltCounts: factors are data-sized — ceil(n/target) clamped to [1, cap]") {
    import spark.implicits._
    // groups: sml×5 (fits one task → ZERO replication), med×1000,
    // big×5000 (ceil = 10, clamped to cap) — the x_dedup_jaccard policy:
    // replication derives from measured group sizes, never from
    // shuffle.partitions (a config-sized factor replicates the corpus
    // proportionally to CLUSTER size — the round-7 regression)
    val rows = (1 to 5).map(i => ("sml", i)) ++
      (1 to 1000).map(i => ("med", i)) ++ (1 to 5000).map(i => ("big", i))
    val df = rows.toDF("k", "v")
    val out = SaltedJoin.saltCounts(df, "k", target = 512L, cap = 4)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out === Map("sml" -> 1, "med" -> 2, "big" -> 4))
    // replication bound: the salted right side carries exactly
    // Σ n_k · min(cap, max(1, ceil(n_k/target))) rows — never n × cap
    val replicated = df.join(broadcast(SaltedJoin.saltCounts(df, "k", 512L, 4)), "k")
      .select(col("k"), explode(sequence(lit(0), col("_nsalts") - 1)).as("s"))
      .count()
    assert(replicated === (5L * 1 + 1000L * 2 + 5000L * 4))
  }

  test("GraftExtensions: function injected and degenerate clamp optimized away") {
    val prev = spark // keep shared session alive
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    try {
      import ext.implicits._
      // function resolves with no manual registry call
      val df = Seq(0.3, 2.0).toDF("x")
        .selectExpr("graft_clamp(x, 0.0D, 1.0D) AS c")
      assert(df.collect().map(_.getDouble(0)).toSeq === Seq(0.3, 1.0))
      // degenerate bounds (lo >= hi) are rewritten away by the injected rule
      val degen = Seq(0.3).toDF("x").selectExpr("graft_clamp(x, 5.0D, 1.0D) AS c")
      assert(!degen.queryExecution.optimizedPlan.toString.contains("graft_clamp"))
      assert(degen.head().getDouble(0) === 1.0)
      // ...but NaN must still propagate (Math.min/max semantics), so the
      // rewrite may not change results on the full input domain
      val nan = Seq(Double.NaN, 0.3).toDF("x")
        .selectExpr("graft_clamp(x, 5.0D, 1.0D) AS c").collect()
        .map(_.getDouble(0)).toSeq
      assert(nan.head.isNaN && nan(1) === 1.0)
    } finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }

  test("u_rule_rewrite: the graded plan keeps ONE live clamp; the degenerate one is gone") {
    val df = SparkEntry.queries("u_rule_rewrite")(spark, sf())
    val plan = df.queryExecution.optimizedPlan.toString
    val n = "graft_clamp".r.findAllIn(plan).size
    assert(n === 1,
      s"expected exactly the live clamp to survive SimplifyDegenerateClamp, got $n in:\n$plan")
  }

  test("x_dedup_semantic: pairs are a same-cluster subset of exhaustive cosine pairs") {
    val sem = SparkEntry.queries("x_dedup_semantic")(spark, sf())
      .collect().map(r => ((r.getLong(1), r.getLong(2)), r.getDouble(3)))
    assert(sem.nonEmpty, "clustering found no semantic near-dups — fixture vacuous")
    val exhaustive = SparkEntry.queries("x_dedup_embcos")(spark, sf())
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // every clustered pair is a true >= tau pair with the identical cosine
    sem.foreach { case (pair, cos) =>
      assert(exhaustive.contains(pair), s"semantic pair $pair not in exhaustive set")
      assert(math.abs(exhaustive(pair) - cos) < 1e-9)
    }
    // the inverted lists PRUNE: strictly fewer verified pairs than the
    // exhaustive C(n,2) scan admits (recall < 1 is the designed trade)
    assert(sem.length < exhaustive.size)
  }
}
