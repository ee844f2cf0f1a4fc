package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Tiny bridge into Spark's `private[sql]` Column↔Expression
  * conversions, so graft's custom Catalyst expressions can expose a
  * public Column API without going through the function registry.
  * (The standard extension-library pattern; nothing else from the
  * internal API is touched.)
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
