package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All n-gram window hashes of a string in ONE pass (Rabin–Karp
  * rolling hash): element i is exactly
  * `PolyHash(substring(s, i+1, n))`, i.e. the same values the HOF form
  * `transform(sequence(1, len-n+1), i -> poly_hash(substr(s, i, n)))`
  * produces (property-tested in PolyHashSpec), but computed in O(len)
  * total instead of O(len·n), with no per-window substring
  * allocation.
  *
  * Windows are in Unicode code points (matching substring/length
  * semantics in both Spark and the DuckDB oracle).
  */
case class PolyHashShingles(child: Expression, n: Int) extends UnaryExpression with CostlyKernel {
  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"poly_hash_shingles requires STRING, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    PolyHashShingles.hashes(input.asInstanceOf[UTF8String].toString, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PolyHashShingles.hashes($c.toString(), $n)")

  override protected def withNewChildInternal(newChild: Expression): PolyHashShingles =
    copy(child = newChild)

  override def prettyName: String = "poly_hash_shingles"
}

object PolyHashShingles {
  private final val P = PolyHash.P

  /** Rolling window hashes over code points. */
  def hashes(s: String, n: Int): ArrayData = {
    // decode once: code points
    val cps = new Array[Int](s.length)
    var m = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      cps(m) = cp
      m += 1
      i += Character.charCount(cp)
    }
    if (m < n) return new GenericArrayData(Array.empty[Long])
    // pow = 31^(n-1) mod P
    var pow = 1L
    var j = 1
    while (j < n) { pow = pow * 31 % P; j += 1 }
    val out = new Array[Long](m - n + 1)
    // first window
    var h = 0L
    j = 0
    while (j < n) { h = (h * 31 + cps(j)) % P; j += 1 }
    out(0) = h
    // roll
    var w = 1
    while (w <= m - n) {
      h = Math.floorMod((h - cps(w - 1) * pow % P) * 31 + cps(w + n - 1), P)
      out(w) = h
      w += 1
    }
    new GenericArrayData(out)
  }

  def polyHashShingles(c: Column, n: Int): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      PolyHashShingles(org.apache.spark.sql.GraftExpressionBridge.expression(c), n))
}
