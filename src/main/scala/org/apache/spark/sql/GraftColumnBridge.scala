package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the Column <-> Expression converters, which are
  * private[sql] in Spark 4 (Column wraps a ColumnNode, not an
  * Expression). Lives in org.apache.spark.sql purely for access; the
  * engine's own code stays in graft.*. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Drop every loaded state-store provider (a stopped streaming
    * query's keyed state otherwise stays resident until the async
    * maintenance task unloads it). Safe between queries: providers
    * reload lazily from the checkpoint on next use. */
  def unloadStateStores(): Unit =
    execution.streaming.state.StateStore.unloadAll()

  /** Build a DataFrame from a (resolved) logical plan — the Dataset
    * constructor is private[sql]. Used by the native operator surface
    * (graft.plans.AsOfNative) to hand custom LogicalPlans to the
    * session. */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** True when the shared cache manager holds no cached plans — the
    * bench harness asserts this between queries so leaked cache entries
    * surface as a counted artifact instead of ambient slowdown. */
  def cacheIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty
}
