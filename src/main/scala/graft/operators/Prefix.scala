package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global prefix sums — the building block for
  * "take documents in quality order until the token budget is spent"
  * selection (and any global running total / global rank at scale).
  *
  * The naive formulation `sum(x) OVER (ORDER BY ...)` with no
  * PARTITION BY plans a SINGLE-task window — the whole corpus sorts on
  * one core, which is exactly what cannot happen at 100 TB. This
  * operator computes the same values distributed, in two passes:
  *
  *  1. `repartitionByRange` on the order key: partition p holds a
  *     contiguous key range, all of partition p's keys precede
  *     partition p+1's (the layout a global sort would produce);
  *     within each partition an ordinary partitioned window computes
  *     the LOCAL running sum in parallel.
  *  2. per-partition totals (one row per partition — bounded by the
  *     partition count, NOT the data size) are collected, scanned into
  *     starting offsets on the driver, and broadcast-joined back.
  *
  * local running sum + partition offset = the exact global prefix sum.
  * The only driver-side data is `numPartitions` longs — the standard
  * two-pass scan/prefix decomposition.
  *
  * `order` must be a TOTAL order (include a unique tiebreaker): range
  * boundaries may split equal keys across partitions, and only a total
  * order makes "everything in earlier partitions precedes me" exact.
  * `value` must be integral (summed as BIGINT, exact — no float
  * reassociation concerns across the two passes).
  *
  * The ranged frame is persisted because both passes scan it; callers
  * running one-shot selections can unpersist via the catalog after the
  * action (same contract as Dedup.nearDuplicates' shingle cache).
  * Note that CONSTRUCTING the result runs pass 1 as a Spark job (the
  * same eager planning-time work a RangePartitioner's sampling job
  * does) — building the DataFrame is not free even before an action.
  */
object Prefix {

  /** Input + `cum` (BIGINT): the inclusive global running total of
    * `value` under `order`. */
  def runningTotal(df: DataFrame, order: Seq[Column], value: Column,
      partitions: Int = 0): DataFrame = {
    // withColumn would silently REPLACE caller columns with these
    // names (and "cum" is a plausible caller name for running totals)
    Seq("cum", "graft_pid", "graft_off").foreach { c =>
      require(!df.columns.contains(c), s"input already has a column named $c")
    }
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(n, order: _*)
      .withColumn("graft_pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pass 1: one total per partition; tiny by construction
    val totals = ranged.groupBy(col("graft_pid"))
      .agg(sum(value.cast("long")).as("t"))
      // a partition whose values are ALL null sums to null — treat as
      // 0, matching the window pass (sum-over skips nulls)
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1)))
      .toMap
    val offsets = (0 until n).scanLeft(0L) { (acc, p) =>
      acc + totals.getOrElse(p, 0L)
    }.take(n).zipWithIndex.map { case (off, p) => (p, off) }
    import spark.implicits._
    val offDf = offsets.toDF("graft_pid", "graft_off")
    // pass 2: local window + broadcast offset; frame pinned to ROWS
    // (RANGE would merge peers — harmless under a total order but the
    // explicit frame keeps the plan self-documenting)
    val w = Window.partitionBy(col("graft_pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .join(broadcast(offDf), Seq("graft_pid"))
      // coalesce: a window sum over only-null-so-far rows is NULL, not
      // 0 — without it, rows preceding the first non-null value lose
      // their partition offset (pass 1 already treats null as 0)
      .withColumn("cum",
        coalesce(sum(value.cast("long")).over(w), lit(0L)) + col("graft_off"))
      .drop("graft_pid", "graft_off")
  }

  /** Budgeted prefix selection: rows with running total ≤ `budget`
    * under `order` — "spend the token budget on the best documents
    * first". */
  def takeBudget(df: DataFrame, order: Seq[Column], value: Column,
      budget: Long): DataFrame =
    runningTotal(df, order, value).filter(col("cum") <= budget)
}
