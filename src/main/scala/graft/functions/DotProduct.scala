package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd sequential-fold dot product of two numeric arrays — the
  * native kernel for `graft.operators.Similarity.dot`.
  *
  * Produces EXACTLY the value of the HOF form
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0.0,
  * (acc,x) -> acc + x)` (property-tested in PolyHashSpec): products
  * and additions run left-to-right in double precision, so float-sum
  * order sensitivity is pinned and results stay bit-identical to the
  * DuckDB oracle's `list_reduce` formulation. Null semantics follow
  * the fold too: a null array, a null element, or unequal lengths
  * (zip_with pads with null → `acc + null` = null) all yield null.
  *
  * Why a custom Expression: the HOF form is interpreted (no
  * whole-stage codegen, per-element Catalyst eval + a materialized
  * product array per row-pair); this kernel is one fused loop. On the
  * knn/near-dup benches the dot product is the innermost operation of
  * an O(|Q|·|N|·d) scan, so the constant factor is the entire cost.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression with CostlyKernel {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"dot_product requires two array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  private lazy val leftIsFloat = elemType(left) == FloatType
  private lazy val rightIsFloat = elemType(right) == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftIsFloat, rightIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("dot")
      s"""
         |java.lang.Double $boxed =
         |  graft.functions.DotProduct.dot($a, $b, $leftIsFloat, $rightIsFloat);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {

  /** Shared JVM kernel (interpreted eval + generated code). Returns
    * null (boxed) under exactly the conditions the HOF fold yields
    * null: length mismatch or any null element. */
  def dot(a: ArrayData, b: ArrayData,
      aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  /** Column-API entry point. */
  def dotNative(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      DotProduct(
        org.apache.spark.sql.GraftExpressionBridge.expression(a),
        org.apache.spark.sql.GraftExpressionBridge.expression(b)))
}
