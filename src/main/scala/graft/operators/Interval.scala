package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join — pairs of rows sharing a key whose
  * timestamps fall within a bounded window of each other. Spark has no
  * native range join; the naive formulation
  * `l.join(r, key && r.ts between l.ts - w and l.ts)` degenerates to a
  * per-key cross product filtered late (O(|L_k|·|R_k|) pairs SHUFFLED
  * per key k).
  *
  * Scale design: both sides are bucketized by `floor(epoch / w)`; a
  * right row can only match left rows in its own or the next bucket,
  * so the left side is expanded 2× onto (key, bucket) and the join
  * shuffles on (key, bucket) — the pair enumeration is bucket-local,
  * the classic time-bucketed interval-join layout (what Flink's
  * interval join and KDB's window join do physically). With skewed
  * keys the bucket id rides in the shuffle key, so a hot user's events
  * spread over time buckets instead of one reducer.
  */
object Interval {

  /** One-sided lookback join: left rows paired with right rows of the
    * same `key` with `lt - w <= rt <= lt`. `leftTime`/`rightTime` are
    * timestamp columns; `w` in seconds (matching at full microsecond
    * precision). Output: iv_key ++ leftCols ++ rightCols + `lag_us`
    * (lt − rt in microseconds, BIGINT). */
  def joinLookback(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      leftCols: Seq[String], rightCols: Seq[String],
      w: Long): DataFrame = {
    // w = 0 would make `div 0` null on both sides → silently empty
    // result instead of the rt == lt rows the caller meant
    require(w > 0, s"window must be positive seconds, got $w")
    // bare-name payload selection below — misuse must error at
    // construction, not as a runtime AMBIGUOUS_REFERENCE (the AsOf rule)
    val overlap = leftCols.intersect(rightCols)
    require(overlap.isEmpty,
      s"left and right payload column names must be disjoint; shared: ${overlap.mkString(",")}")
    val reserved = (leftCols ++ rightCols).filter(_.startsWith("iv_"))
    require(reserved.isEmpty,
      s"payload columns must not use the reserved iv_ prefix: ${reserved.mkString(",")}")
    val wUs = w * 1000000L
    // left probes its own bucket and the previous one (a right row at
    // most w seconds earlier lives in floor(lt/w) or floor(lt/w)-1);
    // a right row has exactly one bucket, so no pair is emitted twice
    // integer `div`, not floor(double /): epoch-micros near 2^53 would
    // round in double division and misassign boundary buckets
    val l = left.select(leftKey.as("iv_key") +: unix_micros(leftTime).as("iv_lt") +:
        leftCols.map(col): _*)
      .withColumn("iv_bucket",
        explode(array(expr(s"iv_lt div $wUs"), expr(s"iv_lt div $wUs") - 1)))
    val r = right.select(rightKey.as("iv_rkey") +: unix_micros(rightTime).as("iv_rt") +:
        rightCols.map(col): _*)
      .withColumn("iv_bucket", expr(s"iv_rt div $wUs"))
    l.join(r,
        col("iv_key") === col("iv_rkey") && l("iv_bucket") === r("iv_bucket") &&
          col("iv_rt") >= col("iv_lt") - wUs && col("iv_rt") <= col("iv_lt"))
      .select(col("iv_key") +: (leftCols.map(col) ++ rightCols.map(col)) :+
        (col("iv_lt") - col("iv_rt")).as("lag_us"): _*)
  }
}
