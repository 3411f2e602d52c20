package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §2b (the graded inventory).
  * Each operator group lives in graft.ops.*; this object only concatenates
  * their query/oracle maps.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("a_group_sum_q1")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2b. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ScanProject.queries ++ Joins.queries ++ Aggregates.queries ++
      Windows.queries ++ SetSort.queries ++ Functions.queries ++
      EventTime.queries ++ Similarity.queries ++ FlexAnalogs.queries ++
      Custom.queries ++ Stats.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ScanProject.oracleSql ++ Joins.oracleSql ++ Aggregates.oracleSql ++
      Windows.oracleSql ++ SetSort.oracleSql ++ Functions.oracleSql ++
      EventTime.oracleSql ++ Similarity.oracleSql ++ FlexAnalogs.oracleSql ++
      Custom.oracleSql ++ Stats.oracleSql
}
