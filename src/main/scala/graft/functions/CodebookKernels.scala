package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused native kernels for the FRAME-codebook hot path (large-nlist
  * ANN family): centroid argmax assignment and PQ subspace encoding.
  *
  * Why they exist (optimization guide §"expressions and codegen"):
  * the frame codebook's argmax was spelled
  * `array_max(transform(cents, c -> struct(dot(emb, c.ce), -cid, cid)))`
  * and PQ encoding as m× that shape over `slice`d subranges. Catalyst
  * higher-order functions are INTERPRETED — no whole-stage codegen,
  * a per-element lambda-variable rebind, a materialized k-entry
  * struct array per row, and (for PQ) two fresh `slice` array copies
  * per (row, centroid, subspace). On a corpus-scale assignment that
  * put an O(rows·k·dim) interpreted loop with per-element allocation
  * in the scan stage — measured on s76's layout build as a
  * multi-second silent gap inside the write task (sf0.1: 2000 rows ×
  * 256 cents × 4 subspaces ≈ 2M slice+dot lambda evals). These
  * kernels run the same argmax as one fused, allocation-free loop
  * over the codebook array, with offset-based sub-range dots instead
  * of materialized slices, and full codegen via a static helper (the
  * [[DotProduct]] pattern).
  *
  * BIT-IDENTITY CONTRACT (pinned by CodebookKernelSpec): every score
  * is [[DotProduct.dot]]'s left-to-right double fold over exactly the
  * elements the HOF form saw (including `slice`'s clamp-at-bounds
  * semantics for the PQ sub-ranges, and dot's null-on-length-mismatch
  * / null-element rules); the argmax implements array_max's struct
  * ordering — score compared with Spark's double ordering (NaN
  * greatest, -0.0 == 0.0), null scores FIRST, ties broken by the
  * greater `-cid` (i.e. the SMALLER centroid id), full equality keeps
  * the earlier element. PQ's per-subspace score is
  * `dot(x_j, c_j) − dot(c_j, c_j)/2` with the norm folded over the
  * same sub-range. */
object CodebookKernels {

  private[functions] val ArgmaxStruct = StructType(Seq(
    StructField("score", DoubleType, nullable = true),
    StructField("neg_cid", LongType, nullable = true),
    StructField("cid", LongType, nullable = true)))

  /** Spark's SQLOrderingUtil.compareDoubles semantics: -0.0 == 0.0,
    * NaN greatest, NaN == NaN. */
  private def cmpScore(a: java.lang.Double, b: java.lang.Double): Int =
    if (a == null && b == null) 0
    else if (a == null) -1
    else if (b == null) 1
    else if (a.doubleValue() == b.doubleValue()) 0
    else java.lang.Double.compare(a.doubleValue(), b.doubleValue())

  private def cmpLong(a: java.lang.Long, b: java.lang.Long): Int =
    if (a == null && b == null) 0
    else if (a == null) -1
    else if (b == null) 1
    else java.lang.Long.compare(a.longValue(), b.longValue())

  /** dot over 1-based `slice(a, start0+1, len)` twins — replicates
    * `DotProduct.dot(slice(a,…), slice(b,…))` including slice's
    * clamp-at-array-end (an out-of-range start yields an EMPTY slice,
    * and dot of two empty arrays is 0.0, not null). Null when the
    * clamped lengths differ or any touched element is null. */
  private def dotRange(a: ArrayData, aFloat: Boolean, b: ArrayData,
      bFloat: Boolean, start: Int, len: Int): java.lang.Double = {
    val la = math.max(0, math.min(len, a.numElements() - start))
    val lb = math.max(0, math.min(len, b.numElements() - start))
    if (la != lb) return null
    var acc = 0.0d
    var i = 0
    while (i < la) {
      val j = start + i
      if (a.isNullAt(j) || b.isNullAt(j)) return null
      val x = if (aFloat) a.getFloat(j).toDouble else a.getDouble(j)
      val y = if (bFloat) b.getFloat(j).toDouble else b.getDouble(j)
      acc += x * y
      i += 1
    }
    acc
  }

  /** ‖c_j‖² folded left-to-right over the same 1-based slice range —
    * `DotProduct.dot(cj, cj)`'s value on `slice(ce, start0+1, len)`. */
  private def normRange(ce: ArrayData, ceFloat: Boolean, start: Int,
      len: Int): java.lang.Double = {
    val l = math.max(0, math.min(len, ce.numElements() - start))
    var acc = 0.0d
    var i = 0
    while (i < l) {
      val j = start + i
      if (ce.isNullAt(j)) return null
      val x = if (ceFloat) ce.getFloat(j).toDouble else ce.getDouble(j)
      acc += x * x
      i += 1
    }
    acc
  }

  /** Shared argmax core: fold the codebook array keeping the greatest
    * (score, neg_cid, cid) triple under the struct ordering above.
    * `score(i)` computes element i's score (null allowed). Returns
    * null for an EMPTY codebook (array_max of an empty array). */
  private def argmaxCore(cents: ArrayData,
      score: (Long, ArrayData) => java.lang.Double,
      cidNullable: Boolean): GenericInternalRow = {
    val k = cents.numElements()
    if (k == 0) return null
    var bestScore: java.lang.Double = null
    var bestNeg: java.lang.Long = null
    var bestCid: java.lang.Long = null
    var has = false
    var i = 0
    while (i < k) {
      val c = cents.getStruct(i, 2)
      val (cid, neg): (java.lang.Long, java.lang.Long) =
        if (cidNullable && c.isNullAt(0)) (null, null)
        else { val v = c.getLong(0); (java.lang.Long.valueOf(v), java.lang.Long.valueOf(-v)) }
      val ce = if (c.isNullAt(1)) null else c.getArray(1)
      val s = score(if (cid == null) 0L else cid.longValue(), ce)
      val better = {
        if (!has) true
        else {
          val cs = cmpScore(s, bestScore)
          if (cs != 0) cs > 0
          else {
            val cn = cmpLong(neg, bestNeg)
            if (cn != 0) cn > 0
            else cmpLong(cid, bestCid) > 0
          }
        }
      }
      if (better) { bestScore = s; bestNeg = neg; bestCid = cid; has = true }
      i += 1
    }
    new GenericInternalRow(Array[Any](bestScore, bestNeg, bestCid))
  }

  /** JVM kernel for [[CodebookArgmax]]: the full-vector assignment
    * argmax. `emb` may be null (every score is then null and the
    * smallest centroid id wins — the HOF form's exact behavior). Null
    * result ⟺ cents null or empty. */
  def argmax(emb: ArrayData, cents: ArrayData, embFloat: Boolean,
      ceFloat: Boolean, cidNullable: Boolean): GenericInternalRow = {
    if (cents == null) return null
    argmaxCore(cents, (_, ce) =>
      if (emb == null || ce == null) null
      else DotProduct.dot(emb, ce, embFloat, ceFloat),
      cidNullable)
  }

  /** JVM kernel for [[CodebookPqCodes]]: m per-subspace argmax codes,
    * score(j) = ⟨x_j, c_j⟩ − ‖c_j‖²/2 over the j-th `sub`-wide
    * sub-range. Null array ⟺ never (the HOF form's CreateArray is
    * non-null; a null cents yields m null codes). */
  def pqCodes(emb: ArrayData, cents: ArrayData, m: Int, sub: Int,
      embFloat: Boolean, ceFloat: Boolean,
      cidNullable: Boolean): GenericArrayData = {
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      val start = j * sub
      val best =
        if (cents == null) null
        else argmaxCore(cents, (_, ce) => {
          if (emb == null || ce == null) null
          else {
            val d = dotRange(emb, embFloat, ce, ceFloat, start, sub)
            val n = normRange(ce, ceFloat, start, sub)
            if (d == null || n == null) null
            else java.lang.Double.valueOf(d.doubleValue() - n.doubleValue() / 2)
          }
        }, cidNullable)
      out(j) = if (best == null) null else best.values(2)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column entry: argmax struct(score, neg_cid, cid) of `emb` against
    * the attached codebook array column. */
  def codebookArgmax(emb: Column, cents: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      CodebookArgmax(
        org.apache.spark.sql.GraftExpressionBridge.expression(emb),
        org.apache.spark.sql.GraftExpressionBridge.expression(cents)))

  /** Column entry: the m-long PQ code array of `emb` against the
    * attached codebook array column. */
  def codebookPqCodes(emb: Column, cents: Column, m: Int, sub: Int): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      CodebookPqCodes(
        org.apache.spark.sql.GraftExpressionBridge.expression(emb),
        org.apache.spark.sql.GraftExpressionBridge.expression(cents), m, sub))

  private[functions] def checkTypes(fn: String, emb: Expression,
      cents: Expression): TypeCheckResult = {
    val embOk = emb.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val centsOk = cents.dataType match {
      case ArrayType(StructType(Array(
        StructField(_, LongType, _, _),
        StructField(_, ArrayType(FloatType | DoubleType, _), _, _))), _) => true
      case _ => false
    }
    if (embOk && centsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fn requires (array<float|double>, array<struct<long, array<float|double>>>), " +
      s"got ${emb.dataType} / ${cents.dataType}")
  }

  private[functions] def embIsFloat(emb: Expression): Boolean =
    emb.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private[functions] def ceInfo(cents: Expression): (Boolean, Boolean) = {
    val st = cents.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    val ceFloat = st.fields(1).dataType
      .asInstanceOf[ArrayType].elementType == FloatType
    (ceFloat, st.fields(0).nullable)
  }
}

/** `array_max(transform(cents, c -> struct(dot(emb, c.ce) score,
  * -c.cid neg_cid, c.cid cid)))` as one fused, codegen'd kernel —
  * see [[CodebookKernels]] for the exact-identity contract. */
case class CodebookArgmax(left: Expression, right: Expression)
    extends BinaryExpression with CostlyKernel {

  override def dataType: DataType = CodebookKernels.ArgmaxStruct
  override def nullable: Boolean = true
  override def prettyName: String = "codebook_argmax"

  override def checkInputDataTypes(): TypeCheckResult =
    CodebookKernels.checkTypes(prettyName, left, right)

  private lazy val embFloat = CodebookKernels.embIsFloat(left)
  private lazy val (ceFloat, cidNullable) = CodebookKernels.ceInfo(right)

  // custom eval, not nullSafeEval: a NULL emb still yields a struct
  // (all-null scores, smallest cid wins) exactly like the HOF form
  override def eval(input: InternalRow): Any = {
    val cents = right.eval(input)
    if (cents == null) null
    else {
      val emb = left.eval(input)
      CodebookKernels.argmax(emb.asInstanceOf[ArrayData],
        cents.asInstanceOf[ArrayData], embFloat, ceFloat, cidNullable)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val flags: String = s"$embFloat, $ceFloat, $cidNullable"
    ev.copy(code = code"""
      ${l.code}
      ${r.code}
      boolean ${ev.isNull} = true;
      InternalRow ${ev.value} = null;
      if (!${r.isNull}) {
        ${ev.value} = graft.functions.CodebookKernels.argmax(
          ${l.isNull} ? null : ${l.value}, ${r.value}, $flags);
        ${ev.isNull} = ${ev.value} == null;
      }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CodebookArgmax =
    copy(left = newLeft, right = newRight)
}

/** The m-subspace PQ encode chain
  * `array_max(transform(cents, c -> struct(dot(x_j, c_j) − ‖c_j‖²/2,
  * -cid, cid))).cid for j < m` as one fused, codegen'd kernel over
  * offset ranges (no materialized slices) — see [[CodebookKernels]]. */
case class CodebookPqCodes(left: Expression, right: Expression, m: Int,
    sub: Int) extends BinaryExpression with CostlyKernel {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "codebook_pq_codes"

  override def checkInputDataTypes(): TypeCheckResult =
    CodebookKernels.checkTypes(prettyName, left, right)

  private lazy val embFloat = CodebookKernels.embIsFloat(left)
  private lazy val (ceFloat, cidNullable) = CodebookKernels.ceInfo(right)

  // custom eval: null emb OR null cents still yield an m-long array
  // (of possibly-null codes) exactly like the HOF form's CreateArray
  override def eval(input: InternalRow): Any = {
    val cents = right.eval(input)
    val emb = left.eval(input)
    CodebookKernels.pqCodes(
      if (emb == null) null else emb.asInstanceOf[ArrayData],
      if (cents == null) null else cents.asInstanceOf[ArrayData],
      m, sub, embFloat, ceFloat, cidNullable)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val flags: String = s"$m, $sub, $embFloat, $ceFloat, $cidNullable"
    ev.copy(code = code"""
      ${l.code}
      ${r.code}
      ArrayData ${ev.value} = graft.functions.CodebookKernels.pqCodes(
        ${l.isNull} ? null : ${l.value},
        ${r.isNull} ? null : ${r.value}, $flags);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CodebookPqCodes =
    copy(left = newLeft, right = newRight)
}
