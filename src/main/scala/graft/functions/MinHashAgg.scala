package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types._

import graft.operators.TextHash.{A, B, P}

/** MinHash signature as a custom Catalyst aggregate: over a group of
  * (already-hashed) shingle values, keep min((a_i·h + b_i) mod P) for
  * each of the k affine functions.
  *
  * Built as a `DeclarativeAggregate` — the buffer is k long columns
  * and update/merge are pure expressions (`least`), so the whole
  * aggregation participates in whole-stage codegen with map-side
  * partial aggregation for free. This is the aggregation-shaped
  * alternative to the array-fold form in `Dedup.minhashSignatures`
  * (same values, property-checked by the d48 oracle): use it when
  * shingles arrive as ROWS (e.g. from an exploded inverted index or a
  * streaming source) rather than as per-doc arrays.
  *
  * Scale: a shuffle carries k longs per group (the partial minima),
  * never the shingle sets.
  */
case class MinHashAgg(child: Expression, k: Int = 8)
    extends DeclarativeAggregate
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression]
    with CostlyKernel {
  require(k >= 1 && k <= A.length,
    s"k must be in [1, ${A.length}] (the affine-mixer family size), got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_agg"

  // Nullable minima initialized to null: a group with no non-null input
  // (a doc shorter than the shingle width explode_outer'd to one null
  // row) evaluates to [null, ...] — exactly what the array-fold form
  // (array_min over an empty array) and the DuckDB oracle's
  // list_min([]) produce. `Least` skips nulls, so the first non-null
  // input replaces the null minimum and merging partial states is
  // null-safe for free.
  private lazy val mins: Seq[AttributeReference] =
    (0 until k).map(i => AttributeReference(s"min$i", LongType, nullable = true)())

  override lazy val aggBufferAttributes: Seq[AttributeReference] = mins

  override lazy val initialValues: Seq[Expression] =
    Seq.fill(k)(Literal(null, LongType))

  override lazy val updateExpressions: Seq[Expression] =
    (0 until k).map { i =>
      val mixed = Remainder(
        Add(Multiply(Literal(A(i), LongType), child), Literal(B(i), LongType)),
        Literal(P, LongType))
      If(IsNull(child), mins(i), Least(Seq(mins(i), mixed)))
    }

  override lazy val mergeExpressions: Seq[Expression] =
    (0 until k).map(i => Least(Seq(mins(i).left, mins(i).right)))

  override lazy val evaluateExpression: Expression =
    CreateArray(mins)

  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}

object MinHashAgg {
  /** Column-API entry: aggregate a long-typed hashed-shingle column
    * into the k-element MinHash signature. */
  def minhashAgg(c: Column, k: Int = 8): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      MinHashAgg(org.apache.spark.sql.GraftExpressionBridge.expression(c), k)
        .toAggregateExpression())
}
