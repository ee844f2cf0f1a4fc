package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken 2003,
  * "Winnowing: local algorithms for document fingerprinting" — the
  * MOSS algorithm): over an array of k-gram window hashes, every
  * sliding window of `w` consecutive hashes selects its minimum, ties
  * broken by the RIGHTMOST position; the selected positions (1-based,
  * distinct, ascending) are the document's fingerprint positions.
  * Guarantee: any shared substring of at least w+k−1 characters
  * between two documents yields at least one shared fingerprint —
  * local similarity detection with a sampling density of ~2/(w+1).
  *
  * One O(n) pass with a monotonic deque, inside whole-stage codegen —
  * the relational formulation (positions × windows join + a
  * row_number per window) is the DuckDB oracle twin, selecting by
  * `ORDER BY hash ASC, pos DESC` per window; this kernel's pop-equal
  * rule reproduces that tie order exactly (property-tested against a
  * brute-force per-window scan in PolyHashSpec).
  *
  * Short inputs: 0 < n < w folds to ONE window spanning the whole
  * array (every non-empty document fingerprints at least once);
  * n == 0 yields an empty array. A NULL element sorts last
  * (Long.MaxValue), matching SQL ascending NULLS LAST — the
  * PolyHashShingles producer never emits nulls, this is defensive.
  */
case class WinnowPositions(child: Expression, w: Int) extends UnaryExpression with CostlyKernel {
  require(w >= 1, "winnow window must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_positions requires ARRAY<BIGINT>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    WinnowPositions.winnow(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowPositions.winnow($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowPositions =
    copy(child = newChild)

  override def prettyName: String = "winnow_positions"
}

object WinnowPositions {

  /** Sliding-window minimum positions, rightmost on ties, deduplicated
    * across consecutive windows. Selected positions are strictly
    * increasing by construction (the monotonic-deque front can only
    * move right), so the output is distinct AND sorted. */
  def winnow(hs: ArrayData, w: Int): ArrayData = {
    val n = hs.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    def hv(i: Int): Long = if (hs.isNullAt(i)) Long.MaxValue else hs.getLong(i)
    // deque of candidate indices; values strictly increase front→back,
    // each the rightmost occurrence of its value in the live suffix
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0
    val out = new java.util.ArrayList[Long]()
    var last = -1
    var i = 0
    while (i < n) {
      // pop-equal (>=): an equal newer value replaces the older, so the
      // front is the RIGHTMOST minimum — the oracle's (hash ASC, pos
      // DESC) rank-1 row
      while (tail > head && hv(dq(tail - 1)) >= hv(i)) tail -= 1
      dq(tail) = i
      tail += 1
      if (i >= w - 1 || i == n - 1) {
        // window [max(i-w+1, 0), i] is complete (the i == n-1 arm is
        // the single whole-array window of a short input)
        val lo = math.max(i - w + 1, 0)
        while (dq(head) < lo) head += 1
        val sel = dq(head)
        if (sel != last) {
          out.add((sel + 1).toLong)
          last = sel
        }
      }
      i += 1
    }
    val arr = new Array[Long](out.size())
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    new GenericArrayData(arr)
  }

  def winnowPositions(c: Column, w: Int): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      WinnowPositions(org.apache.spark.sql.GraftExpressionBridge.expression(c), w))
}
