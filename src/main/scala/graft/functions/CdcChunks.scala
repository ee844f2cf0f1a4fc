package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking in ONE native string walk — the
  * Rabin/FastCDC-style boundary rule that makes chunk-level dedup
  * insertion-stable: a chunk ends at every position whose rolling
  * `w`-char window hash has its low log2(mask) bits zero (expected
  * chunk length ≈ mask chars), so editing one region shifts only that
  * region's boundaries while every other chunk keeps its identity —
  * the property fixed-size chunking (Multimodal.chunkPages) lacks and
  * the reason production payload dedup is content-defined.
  *
  * Portability contract: the window hash at (1-based) position p is
  * EXACTLY `poly_hash(substring(s, p-w+1, w))` and each chunk's
  * identity hash is EXACTLY `poly_hash(substring(s, start, len))` —
  * the kernel maintains both incrementally (rolling removal via
  * 31^w mod P; P prime, arithmetic exact), so a relational twin that
  * recomputes per-position substring hashes reproduces it
  * bit-for-bit (property-tested; the DuckDB oracle is that twin).
  * Positions count Unicode code points, like substring in both
  * engines.
  *
  * Output: array<struct<start, len, chash>> with 1-based `start`;
  * chunks tile the string exactly (Σ len = length, no gaps). Empty
  * input → empty array.
  */
case class CdcChunks(child: Expression, w: Int, mask: Long) extends UnaryExpression with CostlyKernel {
  require(w >= 1, s"window width must be >= 1, got $w")
  require(mask >= 1 && (mask & (mask - 1)) == 0,
    s"mask must be a power of two, got $mask")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("start", LongType, nullable = false),
    StructField("len", LongType, nullable = false),
    StructField("chash", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks requires STRING, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    CdcChunks.chunks(input.asInstanceOf[UTF8String].toString, w, mask)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CdcChunks.chunks($c.toString(), $w, ${mask}L)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)

  override def prettyName: String = "cdc_chunks"
}

object CdcChunks {
  private final val P = PolyHash.P

  def chunks(s: String, w: Int, mask: Long): ArrayData = {
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    var pow = 1L
    var k = 0
    while (k < w) { pow = pow * 31 % P; k += 1 }
    val m = mask - 1
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var winH = 0L
    var chunkH = 0L
    var chunkStart = 0
    var i = 0
    while (i < n) {
      val c = cps(i)
      winH = (winH * 31 + c) % P
      // drop the code point that left the window (window = last w cps)
      if (i >= w) winH = ((winH - cps(i - w) % P * pow) % P + P) % P
      chunkH = (chunkH * 31 + c) % P
      if ((i >= w - 1 && (winH & m) == 0L) || i == n - 1) {
        out += new GenericInternalRow(Array[Any](
          (chunkStart + 1).toLong, (i - chunkStart + 1).toLong, chunkH))
        chunkStart = i + 1
        chunkH = 0L
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column-API entry point. */
  def cdcChunks(c: Column, w: Int = 8, mask: Long = 64L): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      CdcChunks(org.apache.spark.sql.GraftExpressionBridge.expression(c), w, mask))
}
