package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd polynomial rolling hash — the native kernel for
  * `graft.operators.TextHash.polyHash`.
  *
  * Computes fold(acc*31 + codepoint) mod 1e9+7 over the string's
  * Unicode code points: EXACTLY the value of the HOF expression
  * `aggregate(sequence(1, length(s)), 0L, (acc,i) -> (acc*31 +
  * ascii(substring(s,i,1))) % P)` and of the DuckDB oracle emitted by
  * `TextHash.polyHashSql` (both index by code point and `ascii`
  * returns the code point). Equality is property-tested in
  * PolyHashSpec.
  *
  * Why a custom Expression: the HOF form is interpreted
  * (CodegenFallback) and allocates a sequence array + per-char
  * UTF8String slices; this kernel participates in whole-stage codegen
  * and walks the string once. Same operator shape, ~an order of
  * magnitude less per-row cost in the dedup/fingerprint hot paths.
  */
case class PolyHash(child: Expression, base: Long = 31L) extends UnaryExpression with CostlyKernel {
  require(base >= 2 && base < PolyHash.P, s"base must be in [2, P), got $base")

  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"poly_hash requires STRING, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String].toString, base)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.hash($c.toString(), ${base}L)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)

  override def prettyName: String = "poly_hash"
}

object PolyHash {
  final val P = 1000000007L

  /** Shared JVM kernel (used by interpreted eval and generated code).
    * `base` selects the family member (31 = the default family used
    * everywhere; 131 = the independent second family backing the d45
    * pluggable-hash minhash path). */
  def hash(s: String, base: Long = 31L): Long = {
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      acc = (acc * base + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  /** Column-API entry point. */
  def polyHashNative(c: Column, base: Long = 31L): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      PolyHash(org.apache.spark.sql.GraftExpressionBridge.expression(c), base))
}
