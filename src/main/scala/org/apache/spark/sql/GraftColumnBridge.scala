package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the Column <-> Expression converters, which are
  * private[sql] in Spark 4 (Column wraps a ColumnNode, not an
  * Expression). Lives in org.apache.spark.sql purely for access; the
  * engine's own code stays in graft.*. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
