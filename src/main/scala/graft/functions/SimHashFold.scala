package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 32-bit SimHash bit-majority fold over a token-hash array in ONE
  * native pass: bit b of the result is set iff
  * `Σ_h (bit b of h ? +1 : −1) > 0` — exactly the value of the nested
  * HOF formulation (Dedup.SimHashFoldSql) and its DuckDB list_reduce
  * twin, which walk the array 32 times, interpreted (no codegen, no
  * CSE). One doc's fold drops from 32·|tokens| interpreted lambda
  * frames to a single |tokens|·32-bit-counter loop inside whole-stage
  * codegen — this fold dominated the d43/d52 fingerprint pipelines.
  *
  * Null handling matches the SQL fold exactly: a NULL element
  * contributes −1 to every bit (`CASE WHEN (null>>b)&1 = 1` takes the
  * ELSE branch); a NULL or empty array folds to ties on every bit and
  * ties are "not > 0", so the fingerprint is 0 — NOT null. Charikar,
  * "Similarity estimation techniques from rounding algorithms" (2002).
  */
case class SimHashFold(child: Expression) extends UnaryExpression with CostlyKernel {

  override def dataType: DataType = LongType

  // the SQL twin yields 0 (not null) for a null list — match it
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_fold requires ARRAY<BIGINT>, got $t")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else SimHashFold.fold(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      long ${ev.value} = 0L;
      if (!${c.isNull}) {
        ${ev.value} = graft.functions.SimHashFold.fold(${c.value});
      }""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashFold =
    copy(child = newChild)

  override def prettyName: String = "simhash_fold"
}

object SimHashFold {

  /** One pass: 32 signed counters, then the sign vector re-packed. */
  def fold(hs: ArrayData): Long = {
    val n = hs.numElements()
    val counts = new Array[Int](32)
    var j = 0
    while (j < n) {
      if (hs.isNullAt(j)) {
        // SQL twin: null element → CASE else-branch → −1 on every bit
        var b = 0
        while (b < 32) { counts(b) -= 1; b += 1 }
      } else {
        val h = hs.getLong(j)
        var b = 0
        while (b < 32) {
          if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var acc = 0L
    var b = 0
    while (b < 32) {
      if (counts(b) > 0) acc |= (1L << b)
      b += 1
    }
    acc
  }

  def simhashFold(c: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      SimHashFold(org.apache.spark.sql.GraftExpressionBridge.expression(c)))
}
