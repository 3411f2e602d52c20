package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins — pay the shuffle ONCE at write time instead
  * of on every join. Both sides written with `bucketBy(n, key)` hash-
  * partition their files identically, so the planner proves both join
  * children already satisfy the required clustered distribution and the
  * SortMergeJoin runs with ZERO Exchange (BucketingSpec asserts this on
  * the executed plan). At 100 TB this is the difference between a
  * pipeline re-shuffling the fact table on every query and one that
  * reads co-located buckets; the bucket count is the write-time knob
  * that fixes downstream join parallelism, so size it to the target
  * cluster (buckets ≈ executors × a small factor), not the current one.
  *
  * Uses the session catalog's managed parquet tables (no Hive needed);
  * bucket metadata lives in the catalog, which is exactly why plain
  * `parquet(path)` round-trips cannot express this.
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed (and sorted) by
    * `key`. Overwrites any existing table of the same name.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    writeBucketed(df, table, Seq(key), buckets)

  /** Multi-column form: bucket by a composite key. The planner only
    * reuses a child's partitioning for a join when it covers ALL the
    * join keys (spark.sql.requireAllClusterKeysForCoPartition, default
    * true) — so bucket by the join's exact key set, not a subset, or the
    * bucketed side gets re-shuffled and the scan's bucketing disabled.
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String], buckets: Int): Unit = {
    val spark = df.sparkSession
    // A managed-table LOCATION can outlive its catalog entry (the
    // default session catalog is in-memory: a previous JVM's table dies
    // with the JVM, its warehouse directory does not), and saveAsTable
    // refuses to create over an orphaned location
    // (LOCATION_ALREADY_EXISTS). mode(overwrite) only covers tables the
    // CURRENT catalog knows — so drop, then clear any orphaned path.
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(ident))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*).sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Append rows to an existing bucketed table, re-declaring the
    * catalog's own bucket spec (an append must match it exactly or the
    * analyzer rejects it — and a silently unbucketed append would poison
    * every downstream zero-Exchange plan). Each append adds one file per
    * bucket per writer task; compact on your own cadence.
    */
  def appendBucketed(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table))
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"$table has no bucket spec — appendBucketed is for bucketed tables"))
    val bk = spec.bucketColumnNames
    val sk = if (spec.sortColumnNames.nonEmpty) spec.sortColumnNames else bk
    df.write.mode("append").format("parquet")
      .bucketBy(spec.numBuckets, bk.head, bk.tail: _*)
      .sortBy(sk.head, sk.tail: _*)
      .saveAsTable(table)
  }

  /** Equi-join two bucketed tables on their shared bucket key. With equal
    * bucket counts this plans with no Exchange on either side.
    */
  def bucketJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}
