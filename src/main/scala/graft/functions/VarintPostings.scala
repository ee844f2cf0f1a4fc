package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Delta + ULEB128-varint codec for sorted posting lists — the
  * storage layout inverted indexes actually ship at scale (winnow
  * index, phrase postings, d55's dedup index): consecutive doc-id gaps
  * are small, so a 5000-doc posting list packs into ~1–2 bytes per
  * entry instead of 8. Both directions are one-walk codegen'd kernels
  * (the DotProduct pattern: static JVM kernel + one generated call).
  *
  * Encoding: first element verbatim, then gaps; each value ULEB128
  * (7 bits per byte, high bit = continuation). Input must be sorted
  * ascending and non-negative — violations yield NULL (the fold null
  * convention), never a silently corrupt blob; decode returns NULL on
  * truncated input. `decode(encode(x)) == x` is property-tested.
  */
case class DeltaVarintEncode(child: Expression) extends UnaryExpression with CostlyKernel {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "delta_varint_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"delta_varint_encode requires array<bigint>, got $other")
  }

  override def nullSafeEval(a: Any): Any =
    VarintPostings.encode(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("packed")
      s"""
         |byte[] $out = graft.functions.VarintPostings.encode($a);
         |if ($out == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $out; }
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): DeltaVarintEncode =
    copy(child = c)
}

case class DeltaVarintDecode(child: Expression) extends UnaryExpression with CostlyKernel {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "delta_varint_decode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"delta_varint_decode requires binary, got $other")
  }

  override def nullSafeEval(a: Any): Any =
    VarintPostings.decode(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("decoded")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $out =
         |  graft.functions.VarintPostings.decode($a);
         |if ($out == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $out; }
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): DeltaVarintDecode =
    copy(child = c)
}

object VarintPostings {

  /** Null (rejected) when any element is null, negative, or the array
    * is not sorted ascending (equal neighbors allowed — a gap of 0 is
    * a legal varint). */
  def encode(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val buf = new java.io.ByteArrayOutputStream(n * 2 + 8)
    var prev = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val v = a.getLong(i)
      if (v < 0 || (i > 0 && v < prev)) return null
      var d = if (i == 0) v else v - prev
      prev = v
      while ((d & ~0x7fL) != 0L) {
        buf.write(((d & 0x7f) | 0x80).toInt)
        d >>>= 7
      }
      buf.write(d.toInt)
      i += 1
    }
    buf.toByteArray
  }

  /** Null on malformed input: a dangling continuation bit or a varint
    * wider than 64 bits. */
  def decode(b: Array[Byte]): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var acc = 0L
    var shift = 0
    var prev = 0L
    var first = true
    var i = 0
    while (i < b.length) {
      val byte = b(i) & 0xff
      if (shift > 63) return null
      acc |= (byte & 0x7fL) << shift
      if ((byte & 0x80) == 0) {
        val v = if (first) acc else prev + acc
        // a negative term (bit 63 set in the varint) or an additive
        // wrap past Long.MaxValue is structurally valid bytes but not
        // a sorted non-negative posting list — NULL, matching the
        // encode-side rejection convention (a wrap would otherwise
        // return a garbage non-sorted array)
        if (acc < 0L || v < prev) return null
        out += v
        prev = v
        first = false
        acc = 0L
        shift = 0
      } else {
        shift += 7
      }
      i += 1
    }
    if (shift != 0) return null // truncated mid-varint
    new GenericArrayData(out.toArray)
  }

  def encodeNative(a: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      DeltaVarintEncode(org.apache.spark.sql.GraftExpressionBridge.expression(a)))

  def decodeNative(a: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      DeltaVarintDecode(org.apache.spark.sql.GraftExpressionBridge.expression(a)))
}
