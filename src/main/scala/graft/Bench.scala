package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // fresh warehouse per run (same rationale as Verify: saveAsTable
      // queries vs a durable dir under an in-memory catalog)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: WindowExec/package warnings would land in the
    // captured output right next to the final JSON line (the r1-r4
    // parsed:null root cause, with sbt's log decoration as the other half).
    spark.sparkContext.setLogLevel("ERROR")
    // Warm the JVM (codegen, parquet reader, shuffle paths) so the first
    // timed query doesn't absorb ~10s of JIT cost. Warmup failure must not
    // kill the run — the per-query loop reports real failures itself.
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    catch { case e: Throwable =>
      System.err.println(s"[bench] warmup skipped: ${e.getMessage}")
    }
    // A failed query reports -1 (not its time-to-throw) so a regression
    // can never masquerade as a speedup in the totals.
    // releaseCaches(blocking = true): each query's cache cleanup is billed
    // to ITSELF — async unpersist lands in the next query's timed window
    // (the round-5 x_dedup_exact +2 s phantom).
    def runOne(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Long) = {
      val t0 = System.nanoTime()
      // toRdd.count(), not count(): DataFrame.count() re-plans as an
      // empty aggregate and Catalyst PRUNES every unused projection —
      // map-only queries would be billed for reading, not computing
      // (the trap that hid topNgramFraction's O(n²) fold: 0.16 s
      // "benched", minutes when actually evaluated). toRdd executes
      // the query's own optimized plan, every output column computed.
      // The returned row count is kept (BENCH_DETAIL.json "rows") so a
      // timing outlier can be attributed to output VOLUME vs plan cost
      // (x_dedup_jaccard emits ~1.8M pairs on the template-heavy
      // fixture — 10× the next key — which driver-side contention
      // amplifies; the count makes that visible without a rerun).
      val rows = try { fn(spark, sfDir).queryExecution.toRdd.count() } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          -1L
      } finally graft.ops.T.releaseCaches(blocking = true)
      (if (rows >= 0) (System.nanoTime() - t0) / 1e9 else -1.0, rows)
    }
    // PER-KEY BACK-TO-BACK passes (A,A,B,B…), per-query MINIMUM — not
    // two full alphabetical sweeps. Two sweeps alias PERIODIC host load
    // onto the same alphabetical family block in both passes (the
    // round-15 artifact showed x_dedup_* 3–13× on untouched code while
    // an immediate rerun read true values), so best-of-2 couldn't
    // rescue a region. Back-to-back runs put a key's two samples
    // seconds apart: a short burst now hits at most one sample of a few
    // keys and the min discards it; only a burst spanning BOTH adjacent
    // runs of one key can pollute that key's graded number. A failure
    // in either pass still reports -1.
    // Optional args = key names/prefixes to run (local iteration only —
    // the driver invokes with no args and always gets the full sweep).
    val wanted = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      args.isEmpty || args.exists(a => n == a || n.startsWith(a))
    }
    val triples = wanted.map { case (name, fn) =>
      val (t1, rows1) = runOne(name, fn)
      val (t2, _) = runOne(name, fn)
      (name, t1, t2, rows1)
    }
    val pass1 = triples.map(r => r._1 -> r._2)
    val pass2 = triples.map(r => r._1 -> r._3)
    val pass1full = triples.map(r => (r._1, r._2, r._4))
    val results = pass1.zip(pass2).map { case ((name, a), (_, b)) =>
      name -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    val rowCounts = pass1full.map(r => r._1 -> r._3)
    // The harness capturing stdout keeps only a bounded 2000-char TAIL.
    // 92 per-query entries push a single all-queries line past that
    // budget, truncating the opening '{' and breaking json.loads (rounds
    // 1-3 all lost their perf grade to exactly this). So: the ONLY stdout
    // line is a compact, complete JSON object well under the tail budget
    // (headline total LAST); the full per-query map goes to stderr and to
    // BENCH_DETAIL.json in the working directory for archival.
    def f(v: Double, d: Int) = s"%.${d}f".formatLocal(java.util.Locale.ROOT, v)
    def qmap(rs: Seq[(String, Double)], d: Int) =
      rs.map { case (k, v) => s"\"" + k + "\":" + f(v, d) }.mkString("{", ",", "}")
    // Any failure poisons the total: a broken query must never produce a
    // better-looking benchmark number than a green run.
    val failed = results.count(_._2 < 0)
    val total = if (failed > 0) -1.0 else results.map(_._2).sum
    val sfName = new java.io.File(sfDir).getName
    // CONTAINER-LOAD CANARY: f_cast_try is a fixed narrow scan whose
    // code never changes round to round, yet its wall time swings with
    // host load (observed 1.78 ↔ 4.45 s on identical code). Publishing
    // its two raw passes + spread IN the artifact lets a consumer
    // attribute a cross-round swing on any key to the box, not the
    // code, without cross-referencing builder notes.
    val canaryKey = "f_cast_try"
    val c1 = pass1.toMap.getOrElse(canaryKey, -1.0)
    val c2 = pass2.toMap.getOrElse(canaryKey, -1.0)
    // With back-to-back runs the two canary samples sit in ONE ~1 s
    // window early in the sweep; a third sample at the very END
    // restores the sweep-spanning load signal the two-full-sweeps
    // layout used to give (spread reads over all three).
    val c3 = SparkEntry.queries.get(canaryKey)
      .filter(_ => wanted.exists(_._1 == canaryKey))
      .map(fn => runOne(canaryKey, fn)._1).getOrElse(-1.0)
    val cs = Seq(c1, c2, c3).filter(_ > 0)
    val cSpread = if (cs.size >= 2) cs.max / cs.min else -1.0
    val canary =
      s"""{"key":"$canaryKey","pass1":${f(c1, 3)},"pass2":${f(c2, 3)},"pass3":${f(c3, 3)},"spread":${f(cSpread, 2)}}"""
    // NOT printed: sbt re-tags the forked JVM's stderr onto its own
    // stdout ("[error] <line>"), which would put the >2000-char detail
    // line right back into the captured tail. File only.
    // timing provenance in BOTH outputs: these are per-query minima of
    // two same-JVM passes (warm JIT/page cache on pass 2), not cold
    // single-pass numbers — and the detail file carries both raw passes
    // so a consumer can reconstruct either view.
    val rmap = rowCounts
      .map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    // A FILTERED local run must never clobber the driver's graded
    // full-sweep artifact: key args route the detail to a sibling
    // .partial file and stamp the filter INTO the JSON, so a partial
    // sweep is distinguishable even if a file gets copied around.
    val filterTag =
      if (args.isEmpty) ""
      else s""""filter":${args.map(a => "\"" + a + "\"").mkString("[", ",", "]")},"""
    val detail =
      s"""{$filterTag"queries":${qmap(results, 3)},"pass1":${qmap(pass1, 3)},"pass2":${qmap(pass2, 3)},"rows":$rmap,"canary":$canary,"timing":"best_of_2_back_to_back","sf":"$sfName","n":${results.size},"failed":$failed,"metric":"total","unit":"sec","value":${f(total, 3)}}"""
    val detailFile =
      if (args.isEmpty) "BENCH_DETAIL.json" else "BENCH_DETAIL.partial.json"
    try {
      val w = new java.io.PrintWriter(new java.io.File(detailFile), "UTF-8")
      try w.println(detail) finally w.close()
    } catch { case scala.util.control.NonFatal(_) => () } // archival only
    // "queries" here carries the 12 slowest (full map is in the detail
    // line/file) so the stdout line keeps the documented shape while
    // staying far inside the 2000-char capture window.
    val slowest = results.sortBy(-_._2).take(12)
    println(s"""{"metric":"total","unit":"sec","sf":"$sfName","n":${results.size},"failed":$failed,"timing":"best_of_2_back_to_back","canary":$canary,"queries":${qmap(slowest, 2)},"value":${f(total, 3)}}""")
    spark.stop()
  }
}
