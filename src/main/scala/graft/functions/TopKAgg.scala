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

  // (value desc, id asc); a val — reduce() runs once per input row and
  // must not allocate an Ordering each call
  private val ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (v, id) => (-v, id) }

  override def zero: Seq[(Double, Long)] = Nil

  // invariant: buffers are always sorted by `ord` — reduce is a single
  // ordered insertion (drop the overflow), merge is a linear merge;
  // finish has nothing left to do. No per-row sort on the map side.
  override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] = {
    if (b.size == k && ord.lteq(b.last, a)) b
    else {
      val (before, after) = b.span(ord.lteq(_, a))
      (before ++ (a +: after)).take(k)
    }
  }

  override def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer[(Double, Long)]()
    var (i, j) = (0, 0)
    while (out.size < k && (i < x.size || j < y.size)) {
      if (j >= y.size || (i < x.size && ord.lteq(x(i), y(j)))) { out += x(i); i += 1 }
      else { out += y(j); j += 1 }
    }
    out.toSeq
  }

  override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b

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
