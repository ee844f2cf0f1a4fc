package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.operators.TextHash.{A, B, P}

/** MinHash signature of a hashed-shingle array in ONE native pass:
  * element i is `min over h of (A(i)·h + B(i)) mod P` — exactly the
  * value of the array-fold form
  * `array_min(transform(h, x -> (a_i*x + b_i) % P))` and of the DuckDB
  * oracle's `list_min(list_transform(...))` (property-tested in
  * PolyHashSpec). An EMPTY input (doc shorter than the shingle width)
  * yields [null × k], matching array_min([]) = null; null elements are
  * skipped like `Least`/list_min skip nulls.
  *
  * This is the scan-shaped sibling of the row-shaped MinHashAgg
  * aggregate: use this when shingle hashes are already an array column
  * (one doc per row); use MinHashAgg when they arrive exploded as
  * rows. The k affine minima are computed in a single pass over the
  * array inside whole-stage codegen — the HOF form re-walks the array
  * k times, interpreted.
  */
case class MinHashSig(child: Expression, k: Int = 8) extends UnaryExpression with CostlyKernel {
  require(k >= 1 && k <= A.length, s"k must be in [1, ${A.length}]")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires ARRAY<BIGINT>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSig.sig(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.sig($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  private val AArr: Array[Long] = A.toArray
  private val BArr: Array[Long] = B.toArray

  def sig(h: ArrayData, k: Int): ArrayData = {
    val n = h.numElements()
    val mins = new Array[Any](k)
    var seen = false
    var j = 0
    while (j < n) {
      if (!h.isNullAt(j)) {
        val x = h.getLong(j)
        var i = 0
        if (!seen) {
          while (i < k) { mins(i) = (AArr(i) * x + BArr(i)) % P; i += 1 }
          seen = true
        } else {
          while (i < k) {
            val m = (AArr(i) * x + BArr(i)) % P
            if (m < mins(i).asInstanceOf[Long]) mins(i) = m
            i += 1
          }
        }
      }
      j += 1
    }
    new GenericArrayData(mins) // all-null when no non-null input
  }

  def minhashSig(c: Column, k: Int = 8): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      MinHashSig(org.apache.spark.sql.GraftExpressionBridge.expression(c), k))
}
