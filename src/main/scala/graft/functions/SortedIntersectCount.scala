package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** |A ∩ B| of two SORTED DISTINCT long arrays by a single merge scan —
  * the native kernel for exact Jaccard verification over hashed
  * shingle sets.
  *
  * Equals `size(array_intersect(a, b))` when both inputs are sorted
  * and duplicate-free (the contract of
  * `array_sort(array_distinct(...))` — property-tested in
  * PolyHashSpec). Why a custom Expression: `ArrayIntersect` builds a
  * hash set and materializes the common-element array PER PAIR
  * evaluated; verification evaluates millions of candidate pairs, and
  * this kernel is an allocation-free O(|A|+|B|) walk inside
  * whole-stage codegen. The preparation cost (sort + distinct) is paid
  * once per DOCUMENT, not per pair.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with CostlyKernel {

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count requires two ARRAY<BIGINT>, got ${left.dataType} / ${right.dataType}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SortedIntersectCount.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {

  /** Merge scan; null elements (sorted first by array_sort) are never
    * counted as common — matching array_intersect's null handling is
    * irrelevant here because hashed-shingle sets contain no nulls. */
  def count(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      if (a.isNullAt(i)) { i += 1 }
      else if (b.isNullAt(j)) { j += 1 }
      else {
        val x = a.getLong(i)
        val y = b.getLong(j)
        if (x < y) i += 1
        else if (x > y) j += 1
        else { c += 1; i += 1; j += 1 }
      }
    }
    c
  }

  def sortedIntersectCount(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      SortedIntersectCount(
        org.apache.spark.sql.GraftExpressionBridge.expression(a),
        org.apache.spark.sql.GraftExpressionBridge.expression(b)))
}
