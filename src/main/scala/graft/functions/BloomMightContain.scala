package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom.mightContainLong(x)` as a codegen'd expression over a
  * driver-built `util.sketch.BloomFilter` (the sketch Spark's own
  * `df.stat.bloomFilter` produces; it ships to executors by Java
  * serialization inside the expression, i.e. with the task binary —
  * the same mechanism as a broadcast-hash-join build side).
  *
  * This is the manual form of the runtime-filter optimization
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled` injects the same
  * shape automatically under AQE): probe-side rows that cannot have a
  * join partner are dropped AT THE SCAN, before paying the shuffle.
  * False positives only cost work — the join after the filter keeps
  * results exact.
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression with CostlyKernel {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires BIGINT, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  def mightContain(bloom: BloomFilter, c: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      BloomMightContain(
        org.apache.spark.sql.GraftExpressionBridge.expression(c), bloom))
}
