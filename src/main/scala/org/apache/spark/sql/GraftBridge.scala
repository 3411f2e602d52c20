package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Constructs a DataFrame from a hand-built logical plan.
  * `Dataset.ofRows` is `private[sql]`, so the one call graft's custom
  * operators need lives in this bridge file inside the sql package — the
  * standard pattern for libraries that add their own LogicalPlan nodes.
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Force-register the StateStoreCoordinator RPC endpoint (idempotent —
    * `StreamingQueryManager.stateStoreCoordinator` is a lazily-created
    * driver endpoint, but `private[sql]`). Needed before BATCH
    * `transformWithState`: RocksDB's snapshot-upload report calls the
    * coordinator, which otherwise only a started streaming query would
    * have registered, and a fresh batch session fails the store load
    * with RpcEndpointNotFound.
    */
  def ensureStateStoreCoordinator(spark: SparkSession): Unit =
    spark.asInstanceOf[classic.SparkSession].streams.stateStoreCoordinator

  /** Column over a hand-built Expression (`Column(expr)` is package-
    * private) — lets operator code use graft's codegen'd expressions
    * (ArrayDotProduct, ArrayL2Sq) without registry round-trips.
    */
  def columnOf(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** The Catalyst Expression behind a Column (`Column.expr` left the
    * public API when Column became a ColumnNode wrapper in Spark 4).
    */
  def exprOf(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
