package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{SimHash, TextAnalysis}
import graft.operators.{Ann, Pipeline, Volume}
import graft.sources.BinaryMedia
import graft.streaming.Pipelines

/** Usage example for the library surface (the API a pipeline author
  * composes): text profiling, multimodal binary columns, and the
  * batch/stream-portable event transforms, over the bundled fixtures.
  * `runMain graft.tools.Demo [sfDir]`
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println("== TextAnalysis over documents ==")
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang").as("true_lang"),
        TextAnalysis.languageId(col("text")).as("lang_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tok"),
        TextAnalysis.subwordCount(col("text")).as("n_sub"),
        TextAnalysis.qualityScore(col("text")).as("quality"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id").show(5, truncate = false)

    println("== BinaryMedia: payload -> frames -> (stub) features ==")
    val media = BinaryMedia.fromDocuments(spark, sfDir)
    BinaryMedia.frameSample(media, 4)
      .groupBy("media_id").agg(count(lit(1)).as("frames"),
        sum(length(col("frame"))).as("bytes"))
      .orderBy("media_id").show(3)
    BinaryMedia.extractFeatures(media, 8)
      .select(col("media_id"), col("dim"), slice(col("features"), 1, 3).as("head3"))
      .orderBy("media_id").show(3, truncate = false)

    println("== ANN: brute-force vs LSH-bucketed top-3 (probe vec_id=0) ==")
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val probe = embs.filter(col("vec_id") === 0)
    Ann.bruteTopK(embs, probe, 3).orderBy("rn").show(3)
    Ann.lshTopK(embs, probe, 3).orderBy("rn").show(3)
    Ann.ivfTopK(embs, probe, 3, nLists = 8, nProbe = 3).orderBy("rn").show(3)

    println("== shingleJaccard: doc 0 vs doc 1 (char 5-grams) ==")
    val d01 = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") <= 1).select("doc_id", "text")
    val t0 = d01.filter(col("doc_id") === 0).select(col("text").as("ta"))
    d01.filter(col("doc_id") === 1).crossJoin(t0)
      .select(round(TextAnalysis.shingleJaccard(col("text"), col("ta"), 5), 4)
        .as("jacc_5gram")).show()

    println("== SimHash signatures + hamming to doc 0 ==")
    val sh = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), SimHash.simhash64(col("text")).as("sig"))
    val s0 = sh.filter(col("doc_id") === 0).select(col("sig").as("sig0"))
    sh.crossJoin(s0).select(col("doc_id"), col("sig"),
        SimHash.hamming(col("sig"), col("sig0")).as("ham_to_doc0"))
      .orderBy("ham_to_doc0", "doc_id").show(5)

    println("== Volume pipeline: flexcalc R4->R26 analogs on a slab frame ==")
    val vol = Volume.fromArray(spark, "demo",
      Array.tabulate(8, 8, 8)((z, y, x) =>
        if (math.abs(z - 4) + math.abs(y - 4) + math.abs(x - 4) <= 2) 9f else 1f))
    val thr = Volume.otsuThreshold(vol, 0, 10, 16)
    println(s"otsu threshold = $thr; centre of mass = ${Volume.centreOfMass(vol)}")
    println(s"bbox above thr = ${Volume.boundingBox(vol, thr)}")
    Volume.histogram(vol, 0, 10, 5).show()
    Volume.binPool(vol, 2).orderBy("z", "y").show(3)

    println("== Pipeline facade (flexcalc scheduler analog) ==")
    val pipe = Pipeline.fromDataFrame(vol)
      .crop(2, 7, 2, 7, 2, 7).hardThreshold(thr).binPool(2)
    println(pipe.describe)
    pipe.run().orderBy("z", "y").show(3)

    println("== Stateful.runningUserStats (flatMapGroupsWithState, batch mode) ==")
    graft.streaming.Stateful.runningUserStats(graft.ops.T.t(spark, sfDir, "events"))
      .orderBy("user_id").show(5)

    println("== Pipelines.tumblingAgg on the events table (batch mode) ==")
    val events = graft.ops.T.t(spark, sfDir, "events")
    Pipelines.tumblingAgg(events, "6 hours").orderBy("user_id", "win_start").show(5)
    println("== Pipelines.sessionAgg (30 min gap) ==")
    Pipelines.sessionAgg(events, "30 minutes").orderBy("user_id", "sess_start").show(5)

    println("== Pipelines.attributionJoin: purchases <- views within 1h (batch mode) ==")
    Pipelines.attributionJoin(events, events)
      .orderBy("user_id", "l_ts", "r_ts").show(5)

    println("== Curation: sampleHash (1/8) + mixBalance per source ==")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"corpus=${docs.count()} sampled=${graft.operators.Curation.sampleHash(docs, 8).count()}")
    graft.operators.Curation.mixBalance(docs)
      .groupBy("source").count().orderBy("source").show(5)
    spark.stop()
  }
}
