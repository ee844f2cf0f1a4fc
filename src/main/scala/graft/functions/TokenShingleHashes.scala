package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All word-n-gram shingle hashes of a (pre-lowercased) string in ONE
  * native pass — the fused kernel for the dedup signature chain
  * `tokens → shingles → poly_hash(shingle)`.
  *
  * Element w is exactly `poly_hash(concat_ws(" ", tokens[w..w+n-1]))`
  * where `tokens = filter(split(s, " "), t -> t <> "")` — i.e. the
  * same values the staged HOF chain in `graft.operators.TextHash` /
  * `Dedup.shingleFrame` produces (property-tested in PolyHashSpec),
  * and the same values the DuckDB oracle computes from its
  * toks/sh/hs CTEs. Duplicates are NOT removed (callers that need set
  * semantics apply array_distinct; min-based signatures don't care).
  *
  * Why: the HOF chain is interpreted — per-token Catalyst eval, a
  * materialized token array, a shingle-string array, and per-window
  * UTF8String concatenations. This expression walks the string once
  * per window position inside whole-stage codegen with zero
  * intermediate arrays. It replaced a ~10s/query interpreted path on
  * the sf0.1 bench.
  */
case class TokenShingleHashes(child: Expression, n: Int, base: Long = 31L)
    extends UnaryExpression with CostlyKernel {
  require(n >= 1, "shingle width must be >= 1")
  require(base >= 2 && base < PolyHash.P, s"base must be in [2, P), got $base")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_shingle_hashes requires STRING, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    TokenShingleHashes.hashes(input.asInstanceOf[UTF8String].toString, n, base)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenShingleHashes.hashes($c.toString(), $n, ${base}L)")

  override protected def withNewChildInternal(newChild: Expression): TokenShingleHashes =
    copy(child = newChild)

  override def prettyName: String = "token_shingle_hashes"
}

/** Shared whitespace tokenizer for the shingle kernels: token
  * boundaries as (startChar, endChar) index pairs — split on U+0020,
  * empties dropped, identical to `filter(split(s, " "), t -> t <> "")`.
  * ONE implementation so the tokenization contract cannot diverge
  * between the hash and string kernels. */
private[functions] object TokenBounds {
  final class Bounds(var starts: Array[Int], var ends: Array[Int], var n: Int)

  def scan(s: String): Bounds = {
    var nTok = 0
    var starts = new Array[Int](8)
    var ends = new Array[Int](8)
    val len = s.length
    var i = 0
    while (i < len) {
      while (i < len && s.charAt(i) == ' ') i += 1
      if (i < len) {
        val st = i
        while (i < len && s.charAt(i) != ' ') i += 1
        if (nTok == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nTok * 2)
          ends = java.util.Arrays.copyOf(ends, nTok * 2)
        }
        starts(nTok) = st
        ends(nTok) = i
        nTok += 1
      }
    }
    new Bounds(starts, ends, nTok)
  }
}

object TokenShingleHashes {
  private final val P = PolyHash.P

  /** One hash per n-token window; empty when the string has fewer than
    * n tokens. `base` selects the polynomial family member (see
    * PolyHash.hash). */
  def hashes(s: String, n: Int, base: Long = 31L): ArrayData = {
    val b = TokenBounds.scan(s)
    val nTok = b.n
    val starts = b.starts
    val ends = b.ends
    if (nTok < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](nTok - n + 1)
    var w = 0
    while (w <= nTok - n) {
      var acc = 0L
      var t = w
      while (t < w + n) {
        if (t > w) acc = (acc * base + 32) % P // ' ' separator
        var c = starts(t)
        val e = ends(t)
        while (c < e) {
          val cp = s.codePointAt(c)
          acc = (acc * base + cp) % P
          c += Character.charCount(cp)
        }
        t += 1
      }
      out(w) = acc
      w += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry: window hashes of the ASCII-case-folded input —
    * folding stays a codegen'd built-in (translate) outside the kernel
    * and is cross-engine stable (see TextHash.asciiLower). */
  def tokenShingleHashes(c: Column, n: Int, base: Long = 31L): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      TokenShingleHashes(org.apache.spark.sql.GraftExpressionBridge.expression(
        graft.operators.TextHash.asciiLower(c)), n, base))
}
