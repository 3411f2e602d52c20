package graft

import org.apache.spark.sql.functions._

import graft.sources.Snapshot

/** Round-15 lifecycle additions: time-based retention (RETAIN HOURS),
  * the commit auto-retry driver, the `_summary` version-allocation
  * checkpoint (stale-low reconciliation pins), and file/byte admission
  * control on the version-log stream.
  */
class LifecycleOpsSpec extends SparkSpec {

  private def scratch(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def docsDF = {
    import spark.implicits._
    Seq(
      (1L, "alpha", "en", 110), (2L, "bravo", "en", 90),
      (3L, "charlie", "de", 200), (4L, "delta", "de", 50),
      (5L, "echo", "fr", 300), (6L, "foxtrot", "fr", 70)
    ).toDF("doc_id", "text", "lang", "n_chars")
  }

  test("time-based retention: young commits survive RETAIN, zero hours falls to the keep floor") {
    val dir = scratch("lc_retain")
    Snapshot.publish(spark, dir, docsDF, "lang", "text")
    Snapshot.append(spark, dir,
      docsDF.filter(col("lang") === "en").withColumn("doc_id", col("doc_id") + 100),
      "lang", "text")
    Snapshot.append(spark, dir,
      docsDF.filter(col("lang") === "de").withColumn("doc_id", col("doc_id") + 200),
      "lang", "text")
    assert(Snapshot.history(spark, dir).count() === 3L)
    // everything committed milliseconds ago: a generous window keeps all
    assert(Snapshot.vacuumRetain(spark, dir, retainHours = 1000.0) === 0)
    assert(Snapshot.history(spark, dir).count() === 3L)
    // dry run of the zero-hour policy = what the real one then removes
    val dry = Snapshot.vacuumRetainDryRun(spark, dir, 0.0, keepVersions = 1)
      .collect().count(_.getString(1) == "data")
    assert(Snapshot.vacuumRetain(spark, dir, 0.0, keepVersions = 1) === dry)
    assert(Snapshot.history(spark, dir).count() === 1L)
    // content intact through it all
    assert(Snapshot.read(spark, dir).count() === 6L + 2L + 2L)
  }

  test("RETAIN HOURS reaches SQL (VACUUM … RETAIN … HOURS [DRY RUN])") {
    val dir = scratch("lc_retain_sql")
    val s = org.apache.spark.sql.GraftBridge.sessionWithExtensions(
      spark, new graft.plans.GraftExtensions)
    Snapshot.publish(s, dir, docsDF, "lang", "text")
    Snapshot.append(s, dir,
      docsDF.filter(col("lang") === "fr").withColumn("doc_id", col("doc_id") + 10),
      "lang", "text")
    assert(s.sql(s"GRAFT SNAPSHOT VACUUM '$dir' RETAIN 1000 HOURS DRY RUN")
      .collect().count(_.getString(1) == "data") === 0)
    val removed = s.sql(s"GRAFT SNAPSHOT VACUUM '$dir' KEEP 1 RETAIN 0 HOURS")
      .head().getInt(2) // (op, root, version=count)
    assert(removed >= 0)
    assert(Snapshot.history(s, dir).count() === 1L)
  }

  test("commitWithRetry: two concurrent disjoint-partition writers both land") {
    val dir = scratch("lc_retry")
    Snapshot.publish(spark, dir, docsDF, "lang", "text")
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def writer(lang: String, off: Long): Thread = new Thread(() => {
      try {
        Snapshot.commitWithRetry(spark, dir) { _ =>
          Snapshot.stageAppend(spark, dir,
            docsDF.filter(col("lang") === lang)
              .withColumn("doc_id", col("doc_id") + off),
            "lang", "text")
        }
        ()
      } catch { case t: Throwable => errs.add(t); () }
    })
    val ts = Seq(writer("en", 1000L), writer("de", 2000L))
    ts.foreach(_.start()); ts.foreach(_.join(120000))
    assert(errs.isEmpty, s"writer failed: ${Option(errs.peek()).map(_.getMessage)}")
    // BOTH appends landed — no lost update, no caller re-drive
    val ids = Snapshot.read(spark, dir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(Set(1001L, 1002L, 2003L, 2004L).subsetOf(ids))
    assert(ids.size === 10)
  }

  test("summary checkpoint: records max allocation; stale-low summaries reconcile, never re-offer") {
    val dir = scratch("lc_summary")
    Snapshot.publish(spark, dir, docsDF, "lang", "text")
    Snapshot.append(spark, dir,
      docsDF.filter(col("lang") === "en").withColumn("doc_id", col("doc_id") + 10),
      "lang", "text")
    val cur = Snapshot.currentVersion(spark, dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def summary: String = {
      val in = fs.open(new org.apache.hadoop.fs.Path(dir, "_summary"))
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    assert(summary.contains(s""""max_alloc":$cur"""))
    // stale-LOW summary + vacuumed stage markers (the dangerous pair):
    // the next claim must NOT re-offer a committed number
    val out = fs.create(new org.apache.hadoop.fs.Path(dir, "_summary"), true)
    out.write("""{"max_alloc":1}""".getBytes("UTF-8")); out.close()
    fs.delete(new org.apache.hadoop.fs.Path(dir, s"_stage.v$cur"), false)
    fs.delete(new org.apache.hadoop.fs.Path(dir, "_stage.v1"), false)
    val before = Snapshot.read(spark, dir).count()
    val n = Snapshot.append(spark, dir,
      docsDF.filter(col("lang") === "de").withColumn("doc_id", col("doc_id") + 20),
      "lang", "text")
    assert(n > cur, s"stale summary re-offered a committed number: $n <= $cur")
    assert(Snapshot.read(spark, dir).count() === before + 2)
    // and a MISSING summary falls back to the listing
    fs.delete(new org.apache.hadoop.fs.Path(dir, "_summary"), false)
    val n2 = Snapshot.append(spark, dir,
      docsDF.filter(col("lang") === "fr").withColumn("doc_id", col("doc_id") + 30),
      "lang", "text")
    assert(n2 > n)
    assert(summary.contains(s""""max_alloc":$n2"""))
  }

  test("a stale-low summary past the VACUUM horizon never rewinds the pointer") {
    // three FULL publishes: v1/v2 become wholly unreferenced, so
    // vacuum(keep 1) removes their manifests, dirs AND stage markers —
    // the dangerous state where nothing but the pointer itself proves
    // those numbers were ever allocated (review finding)
    val dir = scratch("lc_rewind")
    Snapshot.publish(spark, dir, docsDF, "lang", "text")
    Snapshot.publish(spark, dir, docsDF.filter(col("lang") =!= "fr"),
      "lang", "text")
    Snapshot.publish(spark, dir, docsDF.filter(col("lang") === "en"),
      "lang", "text")
    Snapshot.vacuum(spark, dir, keepVersions = 1)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(dir, "_summary"), true)
    out.write("""{"max_alloc":1}""".getBytes("UTF-8")); out.close()
    val cur = Snapshot.currentVersion(spark, dir)
    val n = Snapshot.append(spark, dir,
      docsDF.filter(col("lang") === "de").withColumn("doc_id", col("doc_id") + 40),
      "lang", "text")
    assert(n > cur, s"claim re-offered a spent number: $n <= $cur")
    assert(Snapshot.currentVersion(spark, dir) === n)
    assert(Snapshot.read(spark, dir).count() === 2L + 2L)
  }

  test("multi-column stats: predicate delete prunes on a SECOND column after ANALYZE") {
    import spark.implicits._
    val dir = scratch("lc_multistats")
    // cluster on doc_id (legacy stats), many files; n_chars is the
    // SECOND column — unprunable until recorded
    val df = (1 to 400).map(i =>
      (i.toLong, s"text $i", if (i % 2 == 0) "en" else "de", i * 3))
      .toDF("doc_id", "text", "lang", "n_chars")
    Snapshot.publishClustered(spark, dir, df, "lang", "doc_id", "text", 8)
    val nFiles = Snapshot.dataFileCount(spark, dir)
    val s = org.apache.spark.sql.GraftBridge.sessionWithExtensions(
      spark, new graft.plans.GraftExtensions)
    s.sql(s"GRAFT SNAPSHOT ANALYZE '$dir' COLUMNS n_chars, text")
    // a delete on n_chars (NOT the cluster column) must rewrite only
    // the covering files: count fresh files of the staged version
    val before = Snapshot.currentVersion(s, dir)
    Snapshot.deleteWhere(s, dir, "n_chars BETWEEN 3 AND 60", "lang", "text")
    val after = Snapshot.currentVersion(s, dir)
    assert(after > before)
    // survivors correct
    assert(Snapshot.read(s, dir).count() === 400L - 20L)
    // pruning happened: only the files whose recorded n_chars range
    // covers [3, 60] were rewritten — the fresh version dir holds a
    // strict minority of the table's files
    def parquetsUnder(f: java.io.File): Int =
      Option(f.listFiles).toSeq.flatten.map {
        case d if d.isDirectory => parquetsUnder(d)
        case x if x.getName.endsWith(".parquet") => 1
        case _ => 0
      }.sum
    val rewritten = parquetsUnder(new java.io.File(s"$dir/v$after"))
    assert(rewritten > 0 && rewritten < nFiles / 2,
      s"expected a pruned rewrite, got $rewritten of $nFiles files")
    // string stats prune equality on a recorded string column: a
    // never-present value stages nothing (version unchanged). The first
    // delete's rewritten files LOST their stats (conservative by
    // design) — re-ANALYZE records fresh ranges for every live file
    s.sql(s"GRAFT SNAPSHOT ANALYZE '$dir' COLUMNS n_chars, text")
    val cur = Snapshot.currentVersion(s, dir)
    assert(Snapshot.deleteWhere(s, dir, "text = 'zzz absent'", "lang",
      "text") === cur)
    // readWhereStats serves the generalized range read on ANY column
    assert(Snapshot.readWhereStats(s, dir, "n_chars", 900.0, 903.0)
      .filter(col("n_chars").between(900, 903)).count() === 2L)
  }

  test("null-count stats: IS NULL / IS NOT NULL decide exactly after ANALYZE") {
    import spark.implicits._
    val dir = scratch("lc_nullstats")
    // nulls concentrate in the low doc_id range -> under the doc_id
    // clustering they live in a strict minority of files
    val df = (1 to 400).map { i =>
      (i.toLong, s"text $i", if (i % 2 == 0) "en" else "de",
        if (i <= 50) None else Some(i * 1.0))
    }.toDF("doc_id", "text", "lang", "score")
    Snapshot.publishClustered(spark, dir, df, "lang", "doc_id", "text", 8)
    val nFiles = Snapshot.dataFileCount(spark, dir)
    val s = org.apache.spark.sql.GraftBridge.sessionWithExtensions(
      spark, new graft.plans.GraftExtensions)
    s.sql(s"GRAFT SNAPSHOT ANALYZE '$dir' COLUMNS score")
    val before = Snapshot.currentVersion(s, dir)
    Snapshot.deleteWhere(s, dir, "score IS NULL", "lang", "text")
    val after = Snapshot.currentVersion(s, dir)
    assert(after > before)
    assert(Snapshot.read(s, dir).count() === 350L)
    def parquetsUnder(f: java.io.File): Int =
      Option(f.listFiles).toSeq.flatten.map {
        case d if d.isDirectory => parquetsUnder(d)
        case x if x.getName.endsWith(".parquet") => 1
        case _ => 0
      }.sum
    val rewritten = parquetsUnder(new java.io.File(s"$dir/v$after"))
    assert(rewritten > 0 && rewritten < nFiles / 2,
      s"IS NULL must rewrite only null-bearing files, got $rewritten of $nFiles")
    // re-ANALYZE: zero nulls remain anywhere, so the same delete is now
    // a METADATA NO-OP (nulls == 0 decides the atom exactly)
    s.sql(s"GRAFT SNAPSHOT ANALYZE '$dir' COLUMNS score")
    val cur = Snapshot.currentVersion(s, dir)
    assert(Snapshot.deleteWhere(s, dir, "score IS NULL", "lang", "text") === cur)
    // without a recorded count the atom stays conservative: text has no
    // stats -> IS NULL on it must stage a rewrite (sound over-keep)
    assert(Snapshot.read(s, dir).count() === 350L)
  }

  test("null-count stats: IS NOT NULL skips an all-null file") {
    import spark.implicits._
    val dir = scratch("lc_nullstats2")
    // per-partition determinism: every en row has NULL score, every de
    // row non-null — so en files are all-null regardless of how the
    // range sampler splits doc_ids
    val df = (1 to 100).map { i =>
      val lang = if (i % 2 == 0) "en" else "de"
      (i.toLong, s"t $i", lang, if (lang == "en") None else Some(i * 1.0))
    }.toDF("doc_id", "text", "lang", "score")
    Snapshot.publishClustered(spark, dir, df, "lang", "doc_id", "text", 2)
    val s = org.apache.spark.sql.GraftBridge.sessionWithExtensions(
      spark, new graft.plans.GraftExtensions)
    s.sql(s"GRAFT SNAPSHOT ANALYZE '$dir' COLUMNS score")
    Snapshot.deleteWhere(s, dir, "score IS NOT NULL", "lang", "text")
    val v = Snapshot.currentVersion(s, dir)
    // the all-null file carries BY REFERENCE (nulls == n_rows decides
    // IS NOT NULL exactly); the non-null file empties
    val paths = spark.read.json(s"$dir/_manifest.v$v").select("path")
      .collect().map(_.getString(0))
    assert(paths.nonEmpty && paths.forall(p =>
      p.startsWith("v1/") && p.contains("_p=en")),
      s"all-null en file(s) must carry untouched, got ${paths.toSeq}")
    assert(Snapshot.read(s, dir).count() === 50L)
    assert(Snapshot.read(s, dir).where(col("score").isNotNull).count() === 0L)
  }

  test("key blooms: point purge on an un-clustered key rewrites only truly-hit files") {
    import spark.implicits._
    val dir = scratch("lc_keybloom")
    def slice(lo: Int, hi: Int) = (lo to hi).map(i =>
      (i.toLong, s"text $i", if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "text", "lang")
    // four append generations: every file's doc_id range is disjoint
    // BY ACCIDENT of construction, but no stats are recorded at all
    // (statsCol None), so range pruning cannot help — only the blooms
    Snapshot.publish(spark, dir, slice(1, 100), "lang", "text")
    Seq((101, 200), (201, 300), (301, 400)).foreach { case (lo, hi) =>
      val n = Snapshot.stageAppend(spark, dir, slice(lo, hi), "lang", "text")
      Snapshot.commit(spark, dir, n)
    }
    val nFiles = Snapshot.dataFileCount(spark, dir)
    assert(nFiles >= 8)
    val s = org.apache.spark.sql.GraftBridge.sessionWithExtensions(
      spark, new graft.plans.GraftExtensions)
    s.sql(s"GRAFT SNAPSHOT ANALYZE '$dir' BLOOM doc_id")
    // absent key: every bloomed file prunes -> metadata no-op
    val cur = Snapshot.currentVersion(s, dir)
    assert(Snapshot.purgeKeys(s, dir, Seq(999999L), "doc_id", "lang",
      "text") === cur)
    // predicate IN atoms consult the blooms too: absent values no-op
    assert(Snapshot.deleteWhere(s, dir, "doc_id IN (888888, 777777)",
      "lang", "text") === cur)
    // present keys: only their files rewrite; no false negatives
    Snapshot.purgeKeys(s, dir, Seq(250L, 251L), "doc_id", "lang", "text")
    val after = Snapshot.currentVersion(s, dir)
    assert(Snapshot.read(s, dir).count() === 398L)
    assert(Snapshot.read(s, dir)
      .where(col("doc_id").isin(250L, 251L)).count() === 0L)
    def parquetsUnder(f: java.io.File): Int =
      Option(f.listFiles).toSeq.flatten.map {
        case d if d.isDirectory => parquetsUnder(d)
        case x if x.getName.endsWith(".parquet") => 1
        case _ => 0
      }.sum
    val rewritten = parquetsUnder(new java.io.File(s"$dir/v$after"))
    assert(rewritten <= 2 && rewritten < nFiles.toInt / 2,
      s"bloom purge must rewrite only hit files, got $rewritten of $nFiles")
    // a file REWRITTEN since the bloom commit has a new path with no
    // bloom -> conservatively hit again (sound), never a wrong skip
    val cur2 = Snapshot.currentVersion(s, dir)
    val v2 = Snapshot.purgeKeys(s, dir, Seq(999998L), "doc_id", "lang", "text")
    assert(v2 > cur2, "bloomless fresh files must stay conservative")
    assert(Snapshot.read(s, dir).count() === 398L)
  }

  test("partition evolution: metadata-only switch, per-generation pruning, exact rows") {
    import spark.implicits._
    val dir = scratch("lc_partevo")
    // engineered value COLLISION between the two specs: lang values and
    // source values overlap ('a'), so a cross-spec byte comparison
    // would wrongly prune — the hazard the per-file spec resolution
    // exists to kill
    val df = (1 to 80).map { i =>
      val lang = if (i % 2 == 0) "a" else "b"
      val source = if (i % 4 < 2) "a" else "c"
      (i.toLong, s"t $i", lang, source)
    }.toDF("doc_id", "text", "lang", "source")
    Snapshot.publish(spark, dir, df, "lang", "text")
    val v1Files = Snapshot.dataFileCount(spark, dir)
    // metadata-only evolution: one commit, zero data files written
    Snapshot.evolvePartitionSpec(spark, dir, "source")
    assert(Snapshot.currentVersion(spark, dir) === 2)
    assert(!new java.io.File(s"$dir/v2").exists)
    assert(Snapshot.dataFileCount(spark, dir) === v1Files)
    // appends must carry the ACTIVE spec
    val eApp = intercept[Exception] {
      Snapshot.append(spark, dir,
        Seq((100L, "x", "a", "c")).toDF("doc_id", "text", "lang", "source"),
        "lang", "text")
    }
    assert(eApp.getMessage.contains("partitioned by 'source'"))
    Snapshot.append(spark, dir,
      Seq((101L, "new c", "b", "c"), (102L, "new a", "a", "a"))
        .toDF("doc_id", "text", "lang", "source"), "source", "text")
    // generation-exact NO-OP: each atom decides its own generation
    val cur = Snapshot.currentVersion(spark, dir)
    assert(Snapshot.deleteWhere(spark, dir,
      "lang = 'zz' AND source = 'zz'", "source", "text") === cur)
    // the WRONG-PRUNE hazard: delete source='c' — the old-generation
    // files are partitioned by LANG with values {a,b}; comparing 'c'
    // against them byte-wise would prune files that DO hold source='c'
    // rows. Per-file spec resolution keeps them conservatively and the
    // rows actually delete.
    Snapshot.deleteWhere(spark, dir, "source = 'c'", "source", "text")
    val left = Snapshot.read(spark, dir)
    assert(left.where(col("source") === "c").count() === 0L)
    assert(left.count() === 40L + 1L) // 40 source-a originals + doc 102
    // and the reverse: a lang atom prunes OLD files exactly while new
    // files stay conservative — rows correct either way
    Snapshot.deleteWhere(spark, dir, "lang = 'b'", "source", "text")
    val after = Snapshot.read(spark, dir)
    assert(after.where(col("lang") === "b").count() === 0L)
    assert(after.count() === 21L) // 20 lang-a source-a originals + doc 102
  }

  test("partition evolution: mixed-table guards, migration, reads") {
    import spark.implicits._
    val dir = scratch("lc_partevo2")
    val df = (1 to 60).map { i =>
      (i.toLong, s"t $i", if (i % 2 == 0) "en" else "de",
        s"src${i % 3}")
    }.toDF("doc_id", "text", "lang", "source")
    Snapshot.publish(spark, dir, df, "lang", "text")
    Snapshot.evolvePartitionSpec(spark, dir, "source")
    Snapshot.append(spark, dir,
      Seq((200L, "fresh", "en", "src0"))
        .toDF("doc_id", "text", "lang", "source"), "source", "text")
    // per-partition replacement has no honest meaning across specs
    val eRep = intercept[Exception] {
      Snapshot.stageReplacePartitions(spark, dir,
        Seq((300L, "r", "en", "src1")).toDF("doc_id", "text", "lang", "source"),
        "source", "text")
    }
    assert(eRep.getMessage.contains("older partition spec"))
    // readWhere stays EXACT on a mixed table (conservative files + row
    // filter): src0 = 20 originals + the fresh append
    assert(Snapshot.readWhere(spark, dir, Seq("src0")).count() === 21L)
    // the SQL parts door cannot row-filter raw files: refuse
    val ePart = intercept[Exception] {
      spark.read.format("graft-snapshot").option("path", dir)
        .option("parts", "src0").load()
    }
    assert(ePart.getMessage.contains("older partition spec"))
    // upsert MIGRATES old-generation files as it rewrites (key-correct
    // across specs: doc 7's old row must not survive next to the update)
    Snapshot.upsert(spark, dir,
      Seq((7L, "updated", "de", "src1")).toDF("doc_id", "text", "lang", "source"),
      "doc_id", "source", "text")
    val u = Snapshot.read(spark, dir)
    assert(u.where(col("doc_id") === 7L).count() === 1L)
    assert(u.where(col("doc_id") === 7L).head.getAs[String]("text") === "updated")
    assert(u.count() === 61L)
    // after the upsert-migration the table is uniform again: the parts
    // door serves, replacePartitions works
    assert(spark.read.format("graft-snapshot").option("path", dir)
      .option("parts", "src1").load().count() ===
      u.where(col("source") === "src1").count())
    // explicit migration is a no-op on a uniform table
    val cur = Snapshot.currentVersion(spark, dir)
    assert(Snapshot.migratePartitionSpec(spark, dir, "text") === cur)
  }

  test("partition evolution: migratePartitionSpec rewrites exactly the old generation") {
    import spark.implicits._
    val dir = scratch("lc_partevo3")
    val df = (1 to 40).map { i =>
      (i.toLong, s"t $i", if (i % 2 == 0) "en" else "de", s"src${i % 2}")
    }.toDF("doc_id", "text", "lang", "source")
    Snapshot.publish(spark, dir, df, "lang", "text")
    Snapshot.evolvePartitionSpec(spark, dir, "source")
    Snapshot.append(spark, dir,
      Seq((100L, "n", "en", "src0")).toDF("doc_id", "text", "lang", "source"),
      "source", "text")
    val vApp = Snapshot.currentVersion(spark, dir)
    Snapshot.migratePartitionSpec(spark, dir, "text")
    val v = Snapshot.currentVersion(spark, dir)
    assert(v > vApp)
    // content identical, every file now under the active spec (v1 files
    // gone from the manifest; the appended new-spec file CARRIED)
    assert(Snapshot.read(spark, dir).count() === 41L)
    val paths = spark.read.json(s"$dir/_manifest.v$v").select("path")
      .collect().map(_.getString(0))
    assert(!paths.exists(_.startsWith("v1/")), s"old-gen files must be gone: ${paths.toSeq}")
    assert(paths.exists(_.startsWith(s"v$vApp/")), "new-spec append must carry")
    // compaction works again post-migration
    Snapshot.compactPartitions(spark, dir, "source", "text", maxFiles = 1)
    assert(Snapshot.read(spark, dir).count() === 41L)
  }

  test("composite partition spec: evolution, per-component pruning, cross-generation delete") {
    import spark.implicits._
    val dir = scratch("lc_composite")
    val df = (1 to 40).map { i =>
      (i.toLong, s"txt $i", Seq("en", "de", "fr")(i % 3), s"src${i % 2}", 50 + i)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    Snapshot.publish(spark, dir, df, "lang", "text") // 3 old-gen files
    // evolve lang -> (lang, source): one metadata commit
    val v2 = Snapshot.evolvePartitionSpec(spark, dir, "lang,source")
    assert(v2 === 2)
    assert(Snapshot.layoutOf(spark, dir).get.partCol === "lang,source")
    // new-generation append partitions by the COMPOSITE rendering
    Snapshot.append(spark, dir,
      Seq((100L, "new en0", "en", "src0", 90), (101L, "new en1", "en", "src1", 91),
        (102L, "new de0", "de", "src0", 92))
        .toDF("doc_id", "text", "lang", "source", "n_chars"),
      "lang,source", "text")
    val v3 = Snapshot.currentVersion(spark, dir)
    val v3paths = spark.read.json(s"$dir/_manifest.v$v3").select("path")
      .collect().map(_.getString(0)).toSeq
    assert(v3paths.count(_.startsWith(s"v$v3/")) === 3,
      s"composite append must land one file per (lang, source), got $v3paths")
    // CROSS-GENERATION partition-pruned delete: the lang atom prunes
    // old-generation files under THEIR spec; the source atom prunes
    // new-generation files per COMPONENT
    Snapshot.deleteWhere(spark, dir, "lang = 'en' AND source = 'src1'",
      "lang,source", "text")
    val v4 = Snapshot.currentVersion(spark, dir)
    val v4paths = spark.read.json(s"$dir/_manifest.v$v4").select("path")
      .collect().map(_.getString(0)).toSeq
    // old de/fr files carried (lang atom, their own generation)
    assert(v4paths.count(_.startsWith("v1/")) === 2,
      s"old de/fr files must carry by reference, got $v4paths")
    // new-gen (en,src0) and (de,src0) carried — only (en,src1) rewritten
    assert(v4paths.count(_.startsWith(s"v$v3/")) === 2,
      s"component pruning must keep (en,src0)/(de,src0) carried, got $v4paths")
    // content parity with the logical expectation
    val expect = df.unionByName(
      Seq((100L, "new en0", "en", "src0", 90), (101L, "new en1", "en", "src1", 91),
        (102L, "new de0", "de", "src0", 92))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
      .filter(!(col("lang") === "en" && col("source") === "src1"))
    val got = Snapshot.read(spark, dir)
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
    // a second delete on a component-only atom still prunes new-gen
    // files exactly and keeps the conservative old-gen rewrite honest
    Snapshot.deleteWhere(spark, dir, "source = 'src0' AND n_chars >= 92",
      "lang,source", "text")
    val expect2 = expect.filter(!(col("source") === "src0" && col("n_chars") >= 92))
    val got2 = Snapshot.read(spark, dir)
    assert(got2.exceptAll(expect2).isEmpty && expect2.exceptAll(got2).isEmpty)
    // stage verbs refuse the WRONG spec name
    val e = intercept[Exception] {
      Snapshot.append(spark, dir,
        Seq((200L, "x", "en", "src0", 1)).toDF("doc_id", "text", "lang", "source", "n_chars"),
        "lang", "text")
    }
    assert(e.getMessage.contains("evolvePartitionSpec"))
  }

  test("CDF split of a dv-only MERGE commit: per-file delete units, law per sub-batch") {
    import spark.implicits._
    val root = scratch("lc_cdfdvsplit")
    val dir = s"$root/docs"
    val df = Seq(
      (1L, "alpha alpha", "en", 110), (2L, "bravo text", "en", 90),
      (3L, "charlie words", "de", 200), (4L, "delta zeilen", "de", 50),
      (5L, "echo texte", "fr", 300), (6L, "foxtrot mots", "fr", 70)
    ).toDF("doc_id", "text", "lang", "n_chars")
    Snapshot.publish(spark, dir, df, "lang", "text")
    Snapshot.setDmlMode(spark, dir, "mor")
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.lcsp", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.lcsp.root", root)
    // one MERGE commit touching all three partitions: update doc 1
    // (DV + re-insert), delete docs 4 and 6, insert doc 9 — the source
    // view must register in the CATALOG session, not the parent
    locally {
      import s.implicits._
      Seq(
        (1L, "alpha v2", "en", 500),
        (4L, "gone", "de", 1),
        (6L, "gone", "fr", 1),
        (9L, "golf new", "de", 250)
      ).toDF("doc_id", "text", "lang", "n_chars")
        .createOrReplaceTempView("lcsp_src")
    }
    s.sql("MERGE INTO lcsp.docs t USING lcsp_src s ON t.doc_id = s.doc_id " +
      "WHEN MATCHED AND s.n_chars > t.n_chars THEN UPDATE SET " +
      "text = s.text, n_chars = s.n_chars " +
      "WHEN MATCHED THEN DELETE " +
      "WHEN NOT MATCHED THEN INSERT *")
    // the step reduces to UNITS: ≥1 insert file and EXACTLY the three
    // dvp-referenced files as delete units
    val units = Snapshot.cdfSplitUnits(spark, dir, 1, 2).getOrElse(
      fail("a dv-only MERGE commit must be splittable"))
    assert(units.count(_._2) === 3,
      s"expected one delete unit per dvp-referenced file, got $units")
    assert(units.exists(!_._2), "the MERGE's inserts must appear as units")
    // sliced replay ≡ whole-step replay ≡ readChanges (multiset)
    val whole = Snapshot.cdfSplitRows(spark, dir, 1, 2, units)
    val sliced = Snapshot.cdfSplitRows(spark, dir, 1, 2, units.take(2))
      .unionByName(Snapshot.cdfSplitRows(spark, dir, 1, 2, units.drop(2)))
    assert(whole.exceptAll(sliced).isEmpty && sliced.exceptAll(whole).isEmpty,
      "unit slices must reassemble the exact step")
    val viaChanges = Snapshot.readChanges(spark, dir, 1, 2)
    assert(whole.exceptAll(viaChanges).isEmpty &&
      viaChanges.exceptAll(whole).isEmpty,
      "split units must equal readChanges row for row")
    // the deletes carry the PRE-image rows
    val dels = whole.where(col("_change_type") === "delete")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(dels === Set((1L, 110), (4L, 50), (6L, 70)))
    // INITIAL LOAD of the dvp-pending table splits too (round-17
    // residual closed): per-file insert units, each read under v2's
    // position mask — sliced reassembly equals readVersion as inserts
    val initUnits = Snapshot.cdfSplitUnits(spark, dir, 0, 2).getOrElse(
      fail("the initial load of a dvp-pending table must be splittable"))
    assert(initUnits.forall(!_._2) && initUnits.size >= 3)
    val initRows = Snapshot.cdfSplitRows(spark, dir, 0, 2, initUnits.take(1))
      .unionByName(Snapshot.cdfSplitRows(spark, dir, 0, 2, initUnits.drop(1)))
    val expectInit = Snapshot.readVersion(spark, dir, 2)
      .withColumn("_change_type", lit("insert"))
      .select(initRows.columns.map(col).toIndexedSeq: _*)
    assert(initRows.exceptAll(expectInit).isEmpty &&
      expectInit.exceptAll(initRows).isEmpty,
      "split initial load must equal readVersion under the position mask")
  }

  test("compaction auto-heals old-generation files in bounded batches") {
    import spark.implicits._
    val dir = scratch("lc_heal")
    // three old-generation files (one per lang), then evolve to source
    val df = (1 to 30).map { i =>
      (i.toLong, s"t $i", Seq("en", "de", "fr")(i % 3), s"src${i % 2}")
    }.toDF("doc_id", "text", "lang", "source")
    Snapshot.publish(spark, dir, df, "lang", "text")
    Snapshot.evolvePartitionSpec(spark, dir, "source")
    def oldGenCount: Int = {
      val v = Snapshot.currentVersion(spark, dir)
      spark.read.json(s"$dir/_manifest.v$v").select("path")
        .collect().map(_.getString(0)).count(_.startsWith("v1/"))
    }
    assert(oldGenCount === 3)
    // each routine compaction heals at most healMaxFiles old-gen files;
    // content is row-identical throughout and the count is MONOTONE
    Snapshot.compactPartitions(spark, dir, "source", "text",
      maxFiles = 100, healMaxFiles = 1)
    assert(oldGenCount === 2)
    assert(Snapshot.read(spark, dir).count() === 30L)
    Snapshot.compactPartitions(spark, dir, "source", "text",
      maxFiles = 100, healMaxFiles = 2)
    assert(oldGenCount === 0)
    assert(Snapshot.read(spark, dir).count() === 30L)
    // fully healed: the raw parts door serves again
    assert(spark.read.format("graft-snapshot").option("path", dir)
      .option("parts", "src1").load().count() ===
      Snapshot.read(spark, dir).where(col("source") === "src1").count())
    // and a healed table's compaction takes the ordinary path (no-op
    // here: nothing fragmented beyond maxFiles)
    val cur = Snapshot.currentVersion(spark, dir)
    assert(Snapshot.compactPartitions(spark, dir, "source", "text",
      maxFiles = 100) === cur)
  }

  test("clone transplants the spec history and key blooms") {
    import spark.implicits._
    val root = scratch("lc_clonesidecars")
    val src = s"$root/src"
    val df = (1 to 100).map(i =>
      (i.toLong, s"t $i", if (i % 2 == 0) "en" else "de", s"s${i % 3}"))
      .toDF("doc_id", "text", "lang", "source")
    Snapshot.publish(spark, src, df, "lang", "text")
    Snapshot.evolvePartitionSpec(spark, src, "source")
    Snapshot.append(spark, src,
      Seq((200L, "n", "en", "s0")).toDF("doc_id", "text", "lang", "source"),
      "source", "text")
    Snapshot.recordFileBlooms(spark, src, "doc_id")
    val dst = s"$root/dst"
    Snapshot.cloneTable(spark, src, dst)
    // blooms survive the clone (remapped to absolutized paths): a purge
    // of an absent key is a metadata NO-OP on the clone
    val cur = Snapshot.currentVersion(spark, dst)
    assert(Snapshot.purgeKeys(spark, dst, Seq(999999L), "doc_id",
      "source", "text") === cur)
    // the spec history survives too: old-generation pruning on the
    // clone decides per file — absent values in BOTH specs no-op
    assert(Snapshot.deleteWhere(spark, dst,
      "lang = 'zz' AND source = 'zz'", "source", "text") === cur)
    // and the active-spec guard holds on the clone
    val e = intercept[Exception] {
      Snapshot.append(spark, dst,
        Seq((300L, "x", "en", "s1")).toDF("doc_id", "text", "lang", "source"),
        "lang", "text")
    }
    assert(e.getMessage.contains("partitioned by 'source'"))
  }

  test("z-ordered snapshot: either dimension prunes the rewrite set") {
    import spark.implicits._
    val dir = scratch("lc_zsnap")
    // score and weight are independent permutations of the id space, so
    // a 1-D cluster on either would leave the other unprunable; the
    // z-order bounds BOTH per file
    // WIDE value ranges (≫ 2^16) on both dimensions: the interleave
    // normalizes to the observed range, so no 16-bit aliasing — a raw
    // low-bit mask would scatter these across every file (review
    // finding); the minority-rewrite asserts below pin the normalization
    val df = (0 until 1024).map { i =>
      (i.toLong, s"t $i", if (i % 2 == 0) "en" else "de",
        i.toLong * 1000003L, ((i * 37) % 1024).toLong * 999983L)
    }.toDF("doc_id", "text", "lang", "score", "weight")
    Snapshot.publishZOrdered(spark, dir, df, "lang", "score", "weight",
      "text", nFiles = 16)
    val nFiles = Snapshot.dataFileCount(spark, dir)
    def rewritten(v: Int): Int = {
      def parquets(f: java.io.File): Int =
        Option(f.listFiles).toSeq.flatten.map {
          case d0 if d0.isDirectory => parquets(d0)
          case x if x.getName.endsWith(".parquet") => 1
          case _ => 0
        }.sum
      parquets(new java.io.File(s"$dir/v$v"))
    }
    // dimension A
    Snapshot.deleteWhere(spark, dir, "score BETWEEN 0 AND 80000240", "lang", "text")
    val vA = Snapshot.currentVersion(spark, dir)
    assert(rewritten(vA) > 0 && rewritten(vA) < nFiles / 2,
      s"score delete rewrote ${rewritten(vA)} of $nFiles")
    // dimension B — the axis a 1-D cluster could NOT have pruned
    Snapshot.deleteWhere(spark, dir, "weight BETWEEN 0 AND 79998640", "lang", "text")
    val vB = Snapshot.currentVersion(spark, dir)
    assert(rewritten(vB) > 0 && rewritten(vB) < nFiles / 2,
      s"weight delete rewrote ${rewritten(vB)} of $nFiles")
    // survivors exact
    assert(Snapshot.read(spark, dir).count() ===
      df.filter(!col("score").between(0, 80000240L) && !col("weight").between(0, 79998640L))
        .count())
    // and the generalized stats read prunes on either column
    assert(Snapshot.readWhereStats(spark, dir, "weight", 900.0 * 999983, 920.0 * 999983)
      .filter(col("weight").between(900L * 999983, 920L * 999983)).count() ===
      df.filter(!col("score").between(0, 80000240L) &&
          col("weight").between(900L * 999983, 920L * 999983)).count())
  }

  test("sub-version offsets: a mid-step restart resumes exactly, ranges re-read identically") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import org.apache.spark.sql.execution.streaming.SerializedOffset
    val root = scratch("lc_subver")
    val table = s"$root/table"
    Snapshot.publish(spark, table, docsDF, "lang", "text") // 3 files
    Snapshot.append(spark, table,
      docsDF.withColumn("doc_id", col("doc_id") + 50), "lang", "text") // +3
    val pinned = Snapshot.read(spark, table).schema
    // executing a getBatch frame outside the engine needs the same
    // switch MicroBatchExecution's batch-run session flips
    spark.conf.set("spark.sql.streaming.unsupportedOperationCheck", "false")
    def newSrc() = new graft.streaming.SnapshotVersionSource(
      spark, table, pinned, maxVersions = 10, startingVersion = Some(0),
      changes = false, evolve = false, maxFiles = Some(1), maxBytes = None)
    var src = newSrc()
    var prev: Option[String] = None
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    var batches = 0
    var firstRange: Option[(Option[String], String, Seq[Long])] = None
    var continue = true
    while (continue && batches < 20) {
      val next = src.latestOffset(
        prev.map(SerializedOffset(_)).orNull, ReadLimit.allAvailable())
      if (next == null) continue = false
      else {
        val df = src.getBatch(prev.map(SerializedOffset(_)),
          SerializedOffset(next.json))
        val ids = df.select("doc_id").collect().map(_.getLong(0)).toSeq
        assert(ids.size <= 2, s"one file per batch, got ${ids.size} rows")
        if (firstRange.isEmpty) firstRange = Some((prev, next.json, ids))
        seen ++= ids
        batches += 1
        prev = Some(next.json)
        // RESTART mid-step: a fresh source (new pin, same table) must
        // resume from the checkpointed sub-version offset exactly
        if (batches == 2) src = newSrc()
      }
    }
    assert(batches === 6, s"6 files -> 6 single-file batches, got $batches")
    assert(seen.sorted === Snapshot.read(spark, table)
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted)
    // range determinism: re-reading the FIRST consumed range (on yet
    // another fresh source) returns byte-identical rows
    val (s0, e0, ids0) = firstRange.get
    val again = newSrc()
      .getBatch(s0.map(SerializedOffset(_)), SerializedOffset(e0))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(again === ids0)
    spark.conf.unset("spark.sql.streaming.unsupportedOperationCheck")
  }

  test("CDF split admission: initial load and pure-append steps split per file, delete commits stay atomic") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import org.apache.spark.sql.execution.streaming.SerializedOffset
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val root = scratch("lc_cdfsplit")
    val table = s"$root/table"
    Snapshot.publish(spark, table, docsDF, "lang", "text") // v1: 3 files
    Snapshot.append(spark, table,
      docsDF.withColumn("doc_id", col("doc_id") + 50), "lang", "text") // v2: +3
    Snapshot.deleteWhere(spark, table, "doc_id = 51", "lang", "text") // v3: delete
    Snapshot.append(spark, table,
      docsDF.withColumn("doc_id", col("doc_id") + 100), "lang", "text") // v4: +3
    spark.conf.set("spark.sql.streaming.unsupportedOperationCheck", "false")
    val pinned = StructType(
      StructField("_change_type", StringType, nullable = false) +:
        Snapshot.read(spark, table).schema.fields)
    def newSrc() = new graft.streaming.SnapshotVersionSource(
      spark, table, pinned, maxVersions = 10, startingVersion = Some(0),
      changes = true, evolve = false, maxFiles = Some(1), maxBytes = None)
    var src = newSrc()
    var prev: Option[String] = None
    val deltas = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    var batches = 0
    var deleteBatches = 0
    var continue = true
    while (continue && batches < 30) {
      val next = src.latestOffset(
        prev.map(SerializedOffset(_)).orNull, ReadLimit.allAvailable())
      if (next == null) continue = false
      else {
        val rows = src.getBatch(prev.map(SerializedOffset(_)),
          SerializedOffset(next.json))
          .select("_change_type", "doc_id").collect()
          .map(r => (r.getString(0), r.getLong(1)))
        if (rows.exists(_._1 == "delete")) {
          deleteBatches += 1
        } else {
          // split batches are single-file slices: at most 2 rows here
          assert(rows.length <= 2,
            s"insert batch exceeds one file: ${rows.toSeq}")
        }
        deltas ++= rows
        batches += 1
        prev = Some(next.json)
        // RESTART mid-initial-load: the sub-version offset must resume
        // the SAME deterministic slice on a fresh source
        if (batches == 2) src = newSrc()
      }
    }
    // 3 + 3 + 1 (atomic delete commit) + 3 batches
    assert(batches === 10, s"expected 10 batches, got $batches")
    assert(deleteBatches === 1,
      s"the delete-bearing commit must arrive as ONE batch, got $deleteBatches")
    // the CDF law holds across the split: signed per-key net equals the
    // final committed content
    val net = deltas.groupBy(_._2).view.mapValues(_.map {
      case ("insert", _) => 1; case _ => -1
    }.sum).toMap
    val want = Snapshot.read(spark, table).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(net.filter(_._2 > 0).keySet === want)
    assert(net.forall { case (_, n) => n == 0 || n == 1 })
    spark.conf.unset("spark.sql.streaming.unsupportedOperationCheck")
  }

  test("a mid-step checkpoint resumed WITHOUT the caps finishes its split step, loses nothing") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import org.apache.spark.sql.execution.streaming.SerializedOffset
    val root = scratch("lc_subver_nocap")
    val table = s"$root/table"
    Snapshot.publish(spark, table, docsDF, "lang", "text") // 3 files / 6 rows
    Snapshot.append(spark, table,
      docsDF.withColumn("doc_id", col("doc_id") + 50), "lang", "text")
    spark.conf.set("spark.sql.streaming.unsupportedOperationCheck", "false")
    val pinned = Snapshot.read(spark, table).schema
    def src(cap: Option[Int]) = new graft.streaming.SnapshotVersionSource(
      spark, table, pinned, maxVersions = 10, startingVersion = Some(0),
      changes = false, evolve = false, maxFiles = cap, maxBytes = None)
    // consume ONE file of the initial-load step under the cap
    val capped = src(Some(1))
    val first = capped.latestOffset(null, ReadLimit.allAvailable())
    assert(first.json.contains("#"), s"expected a mid-step offset, got $first")
    val ids1 = capped.getBatch(None, SerializedOffset(first.json))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    // resume WITHOUT the cap: the split step must FINISH first (its
    // remaining files, never skipped), then normal whole-step batches
    val plain = src(None)
    val fin = plain.latestOffset(SerializedOffset(first.json),
      ReadLimit.allAvailable())
    assert(fin.json === "1", s"must finish the split step, got $fin")
    val ids2 = plain.getBatch(Some(SerializedOffset(first.json)),
      SerializedOffset(fin.json))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val rest = plain.latestOffset(SerializedOffset(fin.json),
      ReadLimit.allAvailable())
    val ids3 = plain.getBatch(Some(SerializedOffset(fin.json)),
      SerializedOffset(rest.json))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert((ids1 ++ ids2 ++ ids3).sorted === Snapshot.read(spark, table)
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted,
      "the capless resume must serve every row exactly once")
    spark.conf.unset("spark.sql.streaming.unsupportedOperationCheck")
  }

  test("stream admission control: maxFilesPerTrigger splits a big commit at file boundaries, content exact") {
    val root = scratch("lc_admission")
    val table = s"$root/table"
    // one commit, many files: publish across 3 partitions (3+ files)
    Snapshot.publish(spark, table, docsDF, "lang", "text")
    Snapshot.append(spark, table,
      docsDF.withColumn("doc_id", col("doc_id") + 50), "lang", "text")
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("graft-snapshot-stream")
      .option("path", table)
      .option("startingVersion", "0")
      .option("maxFilesPerTrigger", "1")
      .load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        batches.add(b.count())
        graft.streaming.IdempotentSink.landBatch(b, s"$root/out", id)
      }
      .option("checkpointLocation", s"$root/chk")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // every file is its own batch: #batches = #data files, and the
    // union equals the table exactly (no file lost or doubled)
    val nFiles = Snapshot.dataFileCount(spark, table)
    assert(batches.size.toLong === nFiles,
      s"expected $nFiles single-file batches, got ${batches.size}")
    val landed = graft.streaming.IdempotentSink.readLanded(spark, s"$root/out")
    assert(landed.count() === 12L)
    assert(landed.select("doc_id").distinct().count() === 12L)
    // CDF mode accepts the cap since round 16 (initial load and
    // pure-append steps split; delete commits stay atomic — the
    // dedicated CDF-split test pins the semantics); schema-tracking
    // mode still refuses it (version-atomic fill groups)
    val e = intercept[Exception] {
      spark.readStream.format("graft-snapshot-stream")
        .option("path", table).option("evolveSchema", "true")
        .option("maxFilesPerTrigger", "2").load()
        .writeStream.format("noop")
        .option("checkpointLocation", s"$root/chk2")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    }
    assert(e.getMessage.contains("maxFilesPerTrigger") ||
      Option(e.getCause).exists(_.getMessage.contains("maxFilesPerTrigger")))
  }
}
