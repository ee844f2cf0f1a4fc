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
  *     partition count, NOT the data size) are prefix-summed into
  *     starting offsets by a triangular broadcast join over those few
  *     rows, and broadcast-joined back.
  *
  * local running sum + partition offset = the exact global prefix sum —
  * the standard two-pass scan/prefix decomposition. The ranged frame
  * appears in the plan on both the totals side and the main side, and
  * both passes MUST see the same sampled range boundaries, so it is
  * `localCheckpoint`ed: the range exchange executes exactly once and
  * both consumers read the materialized partitions. Boundary
  * consistency is STRUCTURAL. (Note: under AQE, building the
  * checkpointed RDD runs the upstream stages at CONSTRUCTION time —
  * callers see the cost when they build the frame, not at first
  * action. Bench timings here measure construction + action together
  * for exactly this reason.)
  *
  * (The operator previously leaned on `ReusedExchange` to pin one
  * boundary set. That works for simple inputs, but the offsets join is
  * a self-join over the ranged frame, and self-join deduplication
  * re-ids one side's attributes — over a cached/joined input the
  * canonical forms then differ, reuse silently does NOT fire, each
  * exchange re-samples its own boundaries from nondeterministically
  * ordered shuffle output, and the offsets describe a different
  * partitioning than the rows they join to. Found as a t77-at-sf0.1
  * differential failure — interleaved cum runs; round-6 NOTES.)
  *
  * The offsets side stays fully partitioned: off(p) = Σ_{q<p} total(q)
  * is a broadcast non-equi self-join over `numPartitions` rows — never
  * a single-partition window, never a driver scan. (O(n²) pairs in the
  * partition COUNT, a constant; data size never enters.) The
  * checkpoint's materialization cost is one write/read of the frame —
  * the same class as the sort a global window would need, minus the
  * single-task bottleneck.
  *
  * `order` must be a TOTAL order (include a unique tiebreaker): range
  * boundaries may split equal keys across partitions, and only a total
  * order makes "everything in earlier partitions precedes me" exact.
  * `value` must be integral (summed as BIGINT, exact — no float
  * reassociation concerns across the two passes).
  */
object Prefix {

  /** Input + `cum` (BIGINT): the inclusive global running total of
    * `value` under `order`. */
  def runningTotal(df: DataFrame, order: Seq[Column], value: Column,
      partitions: Int = 0): DataFrame = {
    // withColumn would silently REPLACE caller columns with these
    // names (and "cum" is a plausible caller name for running totals)
    Seq("cum", "graft_pid", "graft_off", "graft_t").foreach { c =>
      require(!df.columns.contains(c), s"input already has a column named $c")
    }
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    // localCheckpoint (lazy): correctness invariant, not an
    // optimization — the totals pass and the window pass below both
    // consume this frame, and they must see the SAME sampled range
    // boundaries and pid assignment. Materializing once makes that
    // structural; without it each pass plans its own range exchange
    // (self-join dedup defeats ReusedExchange on non-trivial inputs)
    // and re-samples boundaries from nondeterministically ordered
    // upstream output — silently wrong sums.
    val ranged = graft.Caches.checkpoint(
      df.repartitionByRange(n, order: _*)
        .withColumn("graft_pid", spark_partition_id()),
      eager = false)._1
    // pass 1: one total per partition; tiny by construction. A
    // partition whose values are ALL null sums to null — the offset
    // coalesce treats it as 0, matching the window pass (sum-over
    // skips nulls).
    val totals = ranged.groupBy(col("graft_pid"))
      .agg(sum(value.cast("long")).as("graft_t"))
    val offDf = totals.as("x")
      .join(broadcast(totals.as("y")),
        col("x.graft_pid") > col("y.graft_pid"), "left")
      .groupBy(col("x.graft_pid").as("graft_pid"))
      .agg(coalesce(sum(col("y.graft_t")), lit(0L)).as("graft_off"))
    // pass 2: local window + broadcast offset; frame pinned to ROWS
    // (RANGE would merge peers — harmless under a total order but the
    // explicit frame keeps the plan self-documenting)
    val w = Window.partitionBy(col("graft_pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .join(broadcast(offDf), Seq("graft_pid"))
      // coalesce: a window sum over only-null-so-far rows is NULL, not
      // 0 — without it, rows preceding the first non-null value lose
      // their partition offset (the offset side already treats an
      // all-null partition total as 0)
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
