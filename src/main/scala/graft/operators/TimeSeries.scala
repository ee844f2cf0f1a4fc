package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-series shaping: downsampling to DENSE fixed-width buckets with
  * gap fill — the feature-engineering step between raw event streams
  * and per-entity model inputs (a gap is information; a missing row is
  * a bug).
  */
object TimeSeries {

  /** Resample per-key events into dense `bucketSec`-wide buckets:
    * every key covers its own [min, max] bucket range with NO holes —
    * absent buckets emit (n_events = 0, sum_value = null) and `filled`
    * carries the last seen sum forward (q53's IGNORE-NULLS running
    * window).
    *
    * The dense spine is generated PER KEY from its own min/max bucket
    * index (`sequence` + explode — an agg plus a generator, never a
    * cross join against a global calendar), so spine size is
    * Σ_key(span_k) and the shuffles stay keyed. Bucket identity is the
    * integer epoch-microsecond index div bucket width — exact integer
    * arithmetic on both engines; values route through exact integer
    * CENTS (`CAST(round(value·100) AS BIGINT)`) before ANY
    * accumulation — summation, gap fill and the final render all
    * operate on BIGINT, and the DECIMAL(18,2) output is produced by
    * one exact decimal multiply (cents · 0.01) at the very end. No
    * float and no engine-version-sensitive construct (DOUBLE→DECIMAL
    * cast rounding, IGNORE-NULLS window frames) ever touches
    * accumulated state — the t80/t85 rule, which cross-engine
    * differential testing showed q72's earlier DECIMAL-sum +
    * IGNORE-NULLS formulation violating under oracle-engine version
    * drift.
    *
    * Output: (key, idx, n_events, sum_value, filled).
    *
    * Bucket indexing uses TRUNCATING division on epoch micros, which
    * agrees with floor only at or after 1970-01-01 — pre-epoch
    * timestamps would bucket differently across engines (Spark `div`
    * truncates toward zero, SQL `//` floors); guard upstream if your
    * data predates the epoch. */
  def resample(df: DataFrame, key: Column, ts: Column, value: Column,
      bucketSec: Long): DataFrame = {
    require(bucketSec > 0, s"bucketSec must be positive, got $bucketSec")
    val bucketUs = bucketSec * 1000000L
    val base = df
      .select(key.as("key"), unix_micros(ts).as("graft_us"),
        round(value.cast("double") * lit(100)).cast("long").as("cents"))
      .select(col("key"),
        expr(s"graft_us div CAST($bucketUs AS BIGINT)").as("idx"),
        col("cents"))
    val agg = base.groupBy(col("key"), col("idx"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
    val spine = base.groupBy(col("key"))
      .agg(min(col("idx")).as("mn"), max(col("idx")).as("mx"))
      .select(col("key"), explode(sequence(col("mn"), col("mx"))).as("idx"))
    val w = Window.partitionBy(col("key")).orderBy(col("idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // cents · 0.01 as DECIMAL(3,2) is an EXACT decimal multiply (never
    // a float op, never a DOUBLE→DECIMAL cast) — the render step.
    def asDecimal(c: Column): Column =
      (c * lit(BigDecimal("0.01"))).cast(DecimalType(18, 2))
    spine.join(agg, Seq("key", "idx"), "left")
      .select(col("key"), col("idx"),
        coalesce(col("n_events"), lit(0L)).as("n_events"), col("sum_cents"))
      .withColumn("fill_cents",
        last(col("sum_cents"), ignoreNulls = true).over(w))
      .select(col("key"), col("idx"), col("n_events"),
        asDecimal(col("sum_cents")).as("sum_value"),
        asDecimal(col("fill_cents")).as("filled"))
  }
}
