package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries frequent-items summary as a typed `Aggregator` — the
  * bounded-memory candidate generator of heavy-hitter detection. The
  * buffer holds at most `k` (item, weight) entries; overflow decrements
  * every weight (dropping zeros), and merging sums then re-truncates
  * by subtracting the (k+1)-th largest weight — the standard
  * mergeable-summaries formulation (Agarwal et al., TODS'13), so
  * map-side partials combine like any aggregate and the exchange
  * carries ≤ k entries per group per partition.
  *
  * Guarantee (what makes the two-pass pattern exact): true count −
  * summary weight ≤ n/(k+1), so every item with true frequency above
  * n/(k+1) SURVIVES in the summary. The summary's weights and exact
  * membership are merge-order-dependent — never expose them as
  * results; expose the candidate SET, re-count candidates exactly, and
  * threshold (t76). With threshold fraction f and k ≥ 1/f the final
  * output is exactly the true heavy-hitter set — deterministic even
  * though the sketch isn't.
  */
final class MisraGries(k: Int)
    extends Aggregator[String, mutable.Map[String, Long], Seq[String]] {
  require(k >= 1, s"capacity must be positive, got $k")

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(b: mutable.Map[String, Long], a: String): mutable.Map[String, Long] = {
    if (b.contains(a) || b.size < k) b.updateWith(a) { v => Some(v.getOrElse(0L) + 1L) }
    else {
      // decrement-all: pays one count from every tracked item instead
      // of tracking the newcomer — the MG overflow step
      val dead = b.iterator.collect { case (key, 1L) => key }.toList
      b.mapValuesInPlace((_, v) => v - 1L)
      dead.foreach(b.remove)
    }
    b
  }

  override def merge(x: mutable.Map[String, Long], y: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    y.foreach { case (key, w) => x.updateWith(key)(v => Some(v.getOrElse(0L) + w)) }
    if (x.size > k) {
      // subtract the (k+1)-th largest weight from everything; ≤ k
      // strictly-positive entries remain (mergeable-summaries merge)
      val cut = x.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = x.iterator.collect { case (key, w) if w <= cut => key }.toList
      x.mapValuesInPlace((_, v) => v - cut)
      dead.foreach(x.remove)
    }
    x
  }

  // candidate set only — weights are merge-order-dependent; sorted so
  // the OUTPUT of this aggregator is still deterministic given the set
  override def finish(b: mutable.Map[String, Long]): Seq[String] =
    b.keysIterator.toSeq.sorted

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[mutable.Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

/** WEIGHTED Misra-Gries: each input row carries an item plus a
  * pre-aggregated occurrence count, and contributes its full weight
  * in one update — the form that lets a codegen'd hash aggregate
  * collapse raw occurrences to `(item, cnt)` FIRST, so the (slower,
  * object-buffer) sketch aggregate sees vocabulary-sized input
  * instead of one row per occurrence. Every update is the mergeable-
  * summaries step itself (add weight, then subtract the (k+1)-th
  * largest from all if over capacity), so the undercount bound is
  * unchanged: each truncation removes its cut from ≥ k+1 entries,
  * cuts sum to ≤ n/(k+1) of total weight n — every item above
  * n/(k+1) still survives, and the two-pass exactness argument of
  * [[MisraGries]] carries over verbatim. */
final class MisraGriesWeighted(k: Int)
    extends Aggregator[(String, Long), mutable.Map[String, Long], Seq[String]] {
  require(k >= 1, s"capacity must be positive, got $k")

  private def truncate(b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    if (b.size > k) {
      val cut = b.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = b.iterator.collect { case (key, w) if w <= cut => key }.toList
      b.mapValuesInPlace((_, v) => v - cut)
      dead.foreach(b.remove)
    }
    b
  }

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(b: mutable.Map[String, Long],
      a: (String, Long)): mutable.Map[String, Long] = {
    if (a._2 > 0L) {
      b.updateWith(a._1)(v => Some(v.getOrElse(0L) + a._2))
      truncate(b)
    } else b
  }

  override def merge(x: mutable.Map[String, Long],
      y: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    y.foreach { case (key, w) => x.updateWith(key)(v => Some(v.getOrElse(0L) + w)) }
    truncate(x)
  }

  override def finish(b: mutable.Map[String, Long]): Seq[String] =
    b.keysIterator.toSeq.sorted

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[mutable.Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

object FreqSketchAgg {
  /** Column API: `misraGries(64)(tokenCol)` → array<string> of heavy-
    * hitter CANDIDATES (superset of all items above n/(k+1)). */
  def misraGries(k: Int): Column => Column = {
    val fn = udaf(new MisraGries(k))
    c => fn(c)
  }

  /** Column API: `misraGriesWeighted(64)(itemCol, weightCol)` —
    * same candidate guarantee over pre-aggregated (item, count)
    * rows. */
  def misraGriesWeighted(k: Int): (Column, Column) => Column = {
    val fn = udaf(new MisraGriesWeighted(k))
    (item, w) => fn(item, w)
  }
}
