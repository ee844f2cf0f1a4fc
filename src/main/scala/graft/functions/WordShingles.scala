package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All word-n-gram shingle STRINGS of a (pre-lowercased) string in one
  * native pass: element w is `concat_ws(" ", tokens[w..w+n-1])` with
  * `tokens = filter(split(s, " "), t -> t <> "")` — the string-typed
  * sibling of TokenShingleHashes, for pipelines that hash shingles
  * with a pluggable kernel (e.g. the xxhash64 production variant)
  * rather than the portable poly_hash. Duplicates are not removed.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression with CostlyKernel {
  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires STRING, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    WordShingles.shingles(input.asInstanceOf[UTF8String].toString, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordShingles.shingles($c.toString(), $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

object WordShingles {

  def shingles(s: String, n: Int): ArrayData = {
    val b = TokenBounds.scan(s) // shared tokenizer — see TokenBounds
    val nTok = b.n
    val starts = b.starts
    val ends = b.ends
    if (nTok < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nTok - n + 1)
    val sb = new java.lang.StringBuilder
    var w = 0
    while (w <= nTok - n) {
      sb.setLength(0)
      var t = w
      while (t < w + n) {
        if (t > w) sb.append(' ')
        sb.append(s, starts(t), ends(t))
        t += 1
      }
      out(w) = UTF8String.fromString(sb.toString)
      w += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry over the ASCII-case-folded input (see
    * TextHash.asciiLower — cross-engine-stable folding). */
  def wordShingles(c: Column, n: Int): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      WordShingles(org.apache.spark.sql.GraftExpressionBridge.expression(
        graft.operators.TextHash.asciiLower(c)), n))
}
