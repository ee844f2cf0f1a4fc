package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k as a typed `Aggregator` — the scalable form of
  * per-group top-k. The window formulation (q10:
  * `row_number().over(partitionBy(g).orderBy(v desc)) <= k`) shuffles
  * and SORTS every row of every group; this aggregator keeps only k
  * (value, id) pairs per group in the aggregation buffer, so the
  * map-side partial pass reduces each partition's contribution to ≤ k
  * rows per group BEFORE the shuffle — at 100 TB the exchange carries
  * O(groups · k), not O(rows).
  *
  * Determinism: ordering is (value desc, id asc) — ties on value are
  * broken by the smaller id, a pure function of the data.
  */
final class TopKByValue(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k >= 1)

  private def ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (v, id) => (-v, id) }

  override def zero: Seq[(Double, Long)] = Nil

  override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
    ((a +: b).sorted(ord)).take(k)

  override def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (x ++ y).sorted(ord).take(k)

  override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b.sorted(ord)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKAgg {
  /** Column API: `topK(3)(valueCol, idCol)` → array<struct<_1,_2>> of
    * the group's top-k (value, id) pairs, greatest value first. */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKByValue(k), Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
    (v, id) => fn(v, id)
  }
}
