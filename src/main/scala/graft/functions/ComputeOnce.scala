package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Optimizer barrier: evaluates exactly like its child but reports
  * `deterministic = false`, which stops Catalyst from pushing filters
  * below the projection that computes it (`PushPredicateThroughNonJoin`
  * requires every project expression to be deterministic) and from
  * inlining its subtree into consumers (`CollapseProject` likewise).
  *
  * Used where one projection's result feeds BOTH sides of a split —
  * Enforce.split's `error` column: without the barrier, predicate
  * pushdown rewrites each side's filter by substituting the whole
  * expression tree below the project, so an expensive derivation (JSON
  * parse, timestamp parse/format) runs 2-3× per row — once inside the
  * pushed-down filter over ALL rows and again in each projection above.
  * With it, the derivation is evaluated exactly once per row and the
  * filters test the materialized attribute.
  *
  * Codegen-transparent (delegates to the child's generated code), so
  * whole-stage codegen spans are unaffected.
  *
  * Scale trade-off to be aware of: `PushPredicateThroughNonJoin`
  * checks the WHOLE project list, so the barrier blocks pushdown of
  * EVERY downstream predicate through the annotated projection — also
  * plain source-column filters composed above the split, which would
  * otherwise reach the parquet scan. Filters that should prune the
  * scan must therefore be applied BELOW the barrier (e.g. filter the
  * input before Enforce.split, which is where scan-pruning predicates
  * belong anyway). The predicates the barrier exists for (the split's
  * own error tests) were never scan-pushable — they are derived-
  * expression predicates, not source-column comparisons.
  */
object ComputeOnce {
  /** Column-API entry point: wrap an expression in the barrier. */
  def once(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      ComputeOnce(org.apache.spark.sql.GraftExpressionBridge.expressionEager(c)))
}

case class ComputeOnce(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = child.dataType
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code = childGen.code, isNull = childGen.isNull, value = childGen.value)
  }
  override protected def withNewChildInternal(newChild: Expression): ComputeOnce =
    copy(child = newChild)
}
