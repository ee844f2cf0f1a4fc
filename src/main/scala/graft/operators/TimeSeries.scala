package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series shaping: downsampling to DENSE fixed-width buckets with
  * gap fill — the feature-engineering step between raw event streams
  * and per-entity model inputs (a gap is information; a missing row is
  * a bug).
  */
object TimeSeries {

  /** Resample per-key events into dense `bucketSec`-wide buckets:
    * every key covers its own [min, max] bucket range with NO holes —
    * absent buckets emit (n_events = 0, sum_cents = null) and
    * `filled_cents` carries the last seen sum forward (q53's
    * IGNORE-NULLS running window).
    *
    * The dense spine is generated PER KEY from its own min/max bucket
    * index (`sequence` + explode — an agg plus a generator, never a
    * cross join against a global calendar), so spine size is
    * Σ_key(span_k) and the shuffles stay keyed. Bucket identity is the
    * integer epoch-microsecond index div bucket width — exact integer
    * arithmetic on both engines; values route through exact integer
    * CENTS (`CAST(round(value·100) AS BIGINT)`) before ANY
    * accumulation — summation, gap fill and the output all operate on
    * and STAY in BIGINT. The output is the cents themselves: DECIMAL
    * never appears in the schema, because DECIMAL representation is
    * hash-visible across oracle-engine builds even when every cell is
    * equal (the round-8 portability finding — compared outputs are
    * BIGINT, DOUBLE-from-exact-integer, or VARCHAR, never DECIMAL).
    * Callers wanting currency units apply the ×0.01 render downstream.
    *
    * Output: (key, idx, n_events, sum_cents, filled_cents).
    *
    * Bucket indexing uses FLOOR division on epoch micros —
    * `(us − pmod(us, d)) div d`, exact for all signs — so pre-epoch
    * timestamps bucket identically to SQL `//` (which floors, where
    * Spark's bare `div` truncates toward zero). */
  def resample(df: DataFrame, key: Column, ts: Column, value: Column,
      bucketSec: Long): DataFrame = {
    require(bucketSec > 0, s"bucketSec must be positive, got $bucketSec")
    val bucketUs = bucketSec * 1000000L
    val base = df
      .select(key.as("key"), unix_micros(ts).as("graft_us"),
        round(value.cast("double") * lit(100)).cast("long").as("cents"))
      .select(col("key"),
        expr(s"(graft_us - pmod(graft_us, ${bucketUs}L)) div ${bucketUs}L")
          .as("idx"),
        col("cents"))
    val agg = base.groupBy(col("key"), col("idx"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
    val spine = base.groupBy(col("key"))
      .agg(min(col("idx")).as("mn"), max(col("idx")).as("mx"))
      .select(col("key"), explode(sequence(col("mn"), col("mx"))).as("idx"))
    val w = Window.partitionBy(col("key")).orderBy(col("idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(agg, Seq("key", "idx"), "left")
      .select(col("key"), col("idx"),
        coalesce(col("n_events"), lit(0L)).as("n_events"), col("sum_cents"))
      .withColumn("filled_cents",
        last(col("sum_cents"), ignoreNulls = true).over(w))
  }
}
