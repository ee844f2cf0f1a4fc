package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact grouped quantiles at scale for DISCRETE values — the cutoff
  * computation behind "keep each language's top X% by quality score".
  *
  * Spark's exact `percentile` buffers every value of a group in one
  * aggregation buffer and `percentile_approx` is inexact; a per-group
  * sort window walks all raw rows through one task per group. None of
  * those is the 100 TB shape. For discrete scores (token counts,
  * integer quality buckets) the exact quantile only needs the VALUE
  * DISTRIBUTION: collapse rows to (group, value) counts — one shuffle
  * with map-side combine, output bounded by distinct values per group,
  * not row count — then cumulate over that tiny frame. The windows
  * here run over the distribution, so "one task per group" holds
  * |distinct values| rows, never the corpus.
  *
  * The percentile is an INTEGER percent and the rank compare is
  * integer-exact (`cum·100 ≥ total·pct` — no float quantile position),
  * so engines can't disagree on boundary rows.
  *
  * Null contract (explicit, r15 advice): null VALUES are ignored
  * per SQL percentile semantics, and a group whose values are ALL
  * null is DROPPED from the output — where SQL `GROUP BY` +
  * `percentile` would emit `(group, NULL)`. The drop is deliberate:
  * a null threshold is unusable by every downstream consumer here
  * (cutoff joins treat it as "no cutoff" anyway), and re-attaching
  * all-null groups would cost a second distinct-groups pass + left
  * join per call. Oracles for these operators must filter null
  * values BEFORE grouping (`WHERE v IS NOT NULL`) to match.
  */
object Quantiles {

  /** Per-group discrete lower percentile: the smallest value whose
    * cumulative count reaches `pct`% of the group — `percentile_disc`
    * semantics, spelled in exact integer arithmetic. Output: group
    * columns + `threshold` (the value column's type). */
  def discretePercentile(df: DataFrame, group: Seq[String], value: Column,
      pct: Int): DataFrame = {
    require(pct >= 1 && pct <= 100, s"pct must be in [1, 100], got $pct")
    Seq("graft_v", "graft_c", "graft_cum", "graft_tot").foreach { c =>
      require(!df.columns.contains(c), s"input already has a column named $c")
    }
    // nulls are IGNORED (SQL percentile semantics, same as the
    // continuous variant): unfiltered they sort first and inflate the
    // cumulative ranks, shifting every threshold
    val counts = df.filter(value.isNotNull)
      .groupBy(group.map(col) :+ value.as("graft_v"): _*)
      .agg(count(lit(1)).as("graft_c"))
    // both windows share one (group)-partitioned exchange; ROWS frame
    // is exact because (group, value) rows are distinct post-groupBy
    val wCum = Window.partitionBy(group.map(col): _*).orderBy(col("graft_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(group.map(col): _*)
    counts
      .withColumn("graft_cum", sum(col("graft_c")).over(wCum))
      .withColumn("graft_tot", sum(col("graft_c")).over(wTot))
      .filter(col("graft_cum") * 100 >= col("graft_tot") * pct)
      .groupBy(group.map(col): _*)
      .agg(min(col("graft_v")).as("threshold"))
  }

  /** Per-group discrete quantile CUT SET: the k/q lower quantiles for
    * every k in 1..q−1, from ONE value-distribution pass (the
    * `discretePercentile` shape with an exact RATIONAL rank compare —
    * `cum·q ≥ tot·k` — so q need not divide 100). The distribution
    * explodes by the constant q−1, never the corpus. Output: group
    * columns + (k, cut); the cut set is the input to equi-depth
    * bucketing (q73): bucket of v = |{cuts < v}|, which keeps tied
    * values together (value-based assignment — the deterministic
    * cross-engine alternative to ntile's arbitrary row splits). */
  def discreteQuantileCuts(df: DataFrame, group: Seq[String], value: Column,
      q: Int): DataFrame = {
    require(q >= 2, s"q must be at least 2, got $q")
    Seq("graft_v", "graft_c", "graft_cum", "graft_tot", "graft_k").foreach { c =>
      require(!df.columns.contains(c), s"input already has a column named $c")
    }
    // nulls ignored — the discretePercentile rule
    val counts = df.filter(value.isNotNull)
      .groupBy(group.map(col) :+ value.as("graft_v"): _*)
      .agg(count(lit(1)).as("graft_c"))
    val wCum = Window.partitionBy(group.map(col): _*).orderBy(col("graft_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(group.map(col): _*)
    counts
      .withColumn("graft_cum", sum(col("graft_c")).over(wCum))
      .withColumn("graft_tot", sum(col("graft_c")).over(wTot))
      .select(group.map(col) :+ col("graft_v") :+ col("graft_cum") :+ col("graft_tot") :+
        explode(array((1 until q).map(k => lit(k.toLong)): _*)).as("graft_k"): _*)
      .filter(col("graft_cum") * q >= col("graft_tot") * col("graft_k"))
      .groupBy(group.map(col) :+ col("graft_k").as("k"): _*)
      .agg(min(col("graft_v")).as("cut"))
  }

  /** Per-group exact lower percentile for CONTINUOUS (or otherwise
    * high-cardinality) numeric domains — the case [[discretePercentile]]
    * documents as out of contract: there the per-group window walks the
    * VALUE DISTRIBUTION, which for a near-continuous column is the
    * corpus itself funneled into |groups| tasks. This form is the
    * classic two-pass histogram refinement instead:
    *
    *  1. one aggregate for per-group (min, max, count), broadcast;
    *  2. a histogram pass — every row maps to one of `buckets`
    *     fixed-width cells (pure per-row arithmetic, map-side combined
    *     into ≤ buckets rows per group), the target cell is the first
    *     whose cumulative count reaches the integer rank
    *     (`cum·100 ≥ tot·pct`, the house rule);
    *  3. an exact pass over ONLY the target cell's rows
    *     (≈ corpus/buckets of them), ranked with the rank mass below
    *     the cell carried in.
    *
    * Every shuffle is map-side-combinable, the windows run over
    * ≤ buckets rows (pass 2) and one cell's distinct values (pass 3),
    * and the answer is percentile_disc-EXACT — float bucket boundaries
    * only route the search, they never pick the value (histogram and
    * refinement use the same assignment, so boundary rows cannot fall
    * between passes). Nulls are ignored (SQL percentile semantics);
    * `value` must be numeric. Output: group columns + `threshold`. */
  def continuousPercentileDisc(df: DataFrame, group: Seq[String],
      value: Column, pct: Int, buckets: Int = 1024): DataFrame = {
    require(pct >= 1 && pct <= 100, s"pct must be in [1, 100], got $pct")
    require(buckets >= 2, s"buckets must be at least 2, got $buckets")
    Seq("graft_v", "graft_b", "graft_c", "graft_cum", "graft_mn", "graft_mx",
        "graft_tot", "graft_tb", "graft_below").foreach { c =>
      require(!df.columns.contains(c), s"input already has a column named $c")
    }
    // no pin: both passes re-read the (pruned, 2-column) source scan —
    // cheaper than materializing the corpus projection
    val v = df.select(group.map(col) :+ value.cast("double").as("graft_v"): _*)
      .filter(col("graft_v").isNotNull)
    val stats = v.groupBy(group.map(col): _*)
      .agg(min(col("graft_v")).as("graft_mn"), max(col("graft_v")).as("graft_mx"),
        count(lit(1)).as("graft_tot"))
    val bucketOf =
      when(col("graft_mx") === col("graft_mn"), lit(0))
        .otherwise(least(lit(buckets - 1),
          floor((col("graft_v") - col("graft_mn"))
            / (col("graft_mx") - col("graft_mn")) * buckets).cast("int")))
    val hist = v.join(broadcast(stats), group)
      .withColumn("graft_b", bucketOf)
      .groupBy(group.map(col) :+ col("graft_b"): _*)
      .agg(count(lit(1)).as("graft_c"), max(col("graft_tot")).as("graft_tot"))
    val wCum = Window.partitionBy(group.map(col): _*).orderBy(col("graft_b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("graft_cum", sum(col("graft_c")).over(wCum))
    // ONE aggregation yields both the target cell (first reaching the
    // rank) and the exact rank mass strictly below it
    val target = cum.groupBy(group.map(col): _*)
      .agg(
        min(when(col("graft_cum") * 100 >= col("graft_tot") * pct,
          col("graft_b"))).as("graft_tb"),
        coalesce(max(when(col("graft_cum") * 100 < col("graft_tot") * pct,
          col("graft_cum"))), lit(0L)).as("graft_below"))
    val inCell = v
      .join(broadcast(stats.join(target, group)), group)
      .withColumn("graft_b", bucketOf)
      .filter(col("graft_b") === col("graft_tb"))
      .groupBy(group.map(col) :+ col("graft_v") :+ col("graft_tot")
        :+ col("graft_below"): _*)
      .agg(count(lit(1)).as("graft_c"))
    val w2 = Window.partitionBy(group.map(col): _*).orderBy(col("graft_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    inCell
      .withColumn("graft_cum", sum(col("graft_c")).over(w2))
      .filter((col("graft_below") + col("graft_cum")) * 100
        >= col("graft_tot") * pct)
      .groupBy(group.map(col): _*)
      .agg(min(col("graft_v")).as("threshold"))
  }

  /** Quantile-threshold filter: rows at or above their group's
    * `pct`-percentile value. The threshold table is group-cardinality
    * sized, so the application join broadcasts — the corpus scan
    * never shuffles. */
  def keepAboveGroupPercentile(df: DataFrame, group: Seq[String],
      value: Column, pct: Int): DataFrame = {
    // this wrapper adds its own temp column and joins the threshold
    // frame, so its reserved names need the same collision guard as
    // discretePercentile's internals
    Seq("graft_v0", "threshold").foreach { c =>
      require(!df.columns.contains(c), s"input already has a column named $c")
    }
    val thr = discretePercentile(df, group, value, pct)
    df.withColumn("graft_v0", value)
      .join(broadcast(thr), group)
      .filter(col("graft_v0") >= col("threshold"))
      .drop("graft_v0", "threshold")
  }

  /** Grouped exact WEIGHTED median: the smallest value whose
    * cumulative weight reaches half the group's total (the lower
    * weighted median — `2·cumw ≥ W`, pure integer comparisons, no
    * interpolation). Weights and values must be integral (the cents
    * rule); the heavy lifting is one (group, value) pre-aggregation
    * — identical values collapse BEFORE any window, so the cumulative
    * pass runs over distinct values per group, not rows (the q73
    * shape; a row-level running sum would resurrect the q60 ntile
    * trap of splitting ties).
    *
    * Weight totals accumulate as BIGINT: safe while a group's total
    * weight stays under 2⁶³ (row counts and quantity-like weights are
    * corpus-bounded ≲10¹⁵ at 100 TB); callers with genuinely
    * unbounded weights should pre-scale them (r14 overflow sweep).
    *
    * Output: (group…, wmedian, total_weight). */
  def weightedMedian(df: DataFrame, group: Seq[String], value: Column,
      weight: Column): DataFrame = {
    val keys = group.map(col)
    // null values ignored (the discretePercentile rule); a null weight
    // is no evidence — the row carries nothing into the distribution
    val agg = df.filter(value.isNotNull && weight.isNotNull)
      .groupBy(keys :+ value.as("graft_v"): _*)
      .agg(sum(weight.cast("long")).as("graft_w"))
    val wCum = Window.partitionBy(keys: _*).orderBy(col("graft_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(keys: _*)
    agg
      .withColumn("graft_cumw", sum(col("graft_w")).over(wCum))
      .withColumn("graft_tot", sum(col("graft_w")).over(wTot))
      .filter(col("graft_cumw") * 2 >= col("graft_tot"))
      .groupBy(keys: _*)
      .agg(min(col("graft_v")).as("wmedian"),
        max(col("graft_tot")).as("total_weight"))
  }
}
