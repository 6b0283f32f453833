package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the sql-private Column⇄Expression converters, for exposing
  * custom Catalyst expressions (graft.functions) as user-facing Columns.
  * Lives in org.apache.spark.sql because ExpressionUtils is private[sql] —
  * the standard technique for Spark extension libraries. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
