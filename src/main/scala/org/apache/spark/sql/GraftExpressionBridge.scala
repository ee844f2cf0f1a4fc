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

  /** DataFrame from a raw LogicalPlan (for graft's custom logical
    * operators, e.g. the AsOfJoin node). */
  def dataFrame(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame. */
  def logicalPlan(df: Dataset[_]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Column → catalyst Expression, eagerly converted (the lazy
    * `expression` wrapper stays a ColumnNodeExpression until the
    * Dataset API converts it; plan-building code needs the real
    * expression tree up front). */
  def expressionEager(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
