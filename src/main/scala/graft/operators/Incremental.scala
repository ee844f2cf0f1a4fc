package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental (delta-based) maintenance of grouped aggregates — the
  * materialized-view algebra that lets a 100 TB pipeline refresh a
  * stored rollup from a day's delta instead of rescanning the corpus.
  *
  * The maintained aggregate is the pair (count, integer-cents sum): a
  * commutative group, so inserts apply with weight +1 and deletes
  * (retractions) with weight −1, and the merged state is exactly the
  * from-scratch aggregate over (base ∖ deletes) ∪ inserts — which is
  * what the q77 oracle recomputes. Values route through exact integer
  * cents before ANY accumulation (the t80/t85 rule: no float and no
  * version-sensitive cast ever touches accumulated state), so the
  * incremental and recomputed legs agree bit-for-bit on every engine.
  *
  * Scale shape: `aggregateState` is the stored view (at production
  * scale it is written bucketed by the group keys); `maintain` scans
  * ONLY the delta, pre-aggregates it map-side (one skinny shuffle of
  * |distinct keys in delta| rows), and merges with a keyed full-outer
  * join that co-partitions with the stored bucketing. Nothing rereads
  * the base fact table.
  */
object Incremental {

  /** The stored view: per-key row count and exact cents sum.
    * `cents` must already be integral (BIGINT) — see
    * [[graft.operators.TimeSeries.resample]] for the rounding rule. */
  def aggregateState(rows: DataFrame, keyNames: Seq[String], cents: Column): DataFrame =
    rows.groupBy(keyNames.map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        sum(coalesce(cents, lit(0L))).as("c"))

  /** Apply a signed delta to a stored aggregate state.
    *
    * `delta` carries `op` = +1 (insert) / −1 (delete, which must
    * retract a row present in the base — the caller's contract; a
    * group driven to zero rows is dropped, and the algebra cannot go
    * negative when the contract holds). The merge joins null-SAFELY
    * on the keys (`<=>`), so a null key value is one group on both
    * legs — exactly how GROUP BY treats it in the from-scratch
    * recompute — and presence on each side is inferred from the
    * aggregate columns being null, never from key nullity (the Diff
    * null-key lesson).
    *
    * Output: keys, `n_events` (BIGINT), `c` (BIGINT cents) — render
    * with one exact decimal multiply at the edge. */
  def maintain(state: DataFrame, delta: DataFrame, keyNames: Seq[String],
      op: Column, cents: Column): DataFrame = {
    val d = delta.groupBy(keyNames.map(col): _*)
      .agg(sum(op.cast("long")).as("d_n"),
        sum(op.cast("long") * coalesce(cents, lit(0L))).as("d_c"))
      .select(keyNames.map(k => col(k).as(s"d_$k")) ++ Seq(col("d_n"), col("d_c")): _*)
    val cond = keyNames.map(k => col(k) <=> col(s"d_$k")).reduce(_ && _)
    state.join(d, cond, "full_outer")
      .select(keyNames.map(k => coalesce(col(k), col(s"d_$k")).as(k)) ++ Seq(
        (coalesce(col("n_events"), lit(0L)) + coalesce(col("d_n"), lit(0L))).as("n_events"),
        (coalesce(col("c"), lit(0L)) + coalesce(col("d_c"), lit(0L))).as("c")): _*)
      .filter(col("n_events") > 0)
  }

  /** Maintain a NON-invertible aggregate (MIN) under inserts and
    * row-id deletes — the case the signed-sum algebra cannot cover:
    * a delete that removes the current minimum forces a rescan, but
    * only of ITS group.
    *
    * The split is the point of the operator. Deleted rows are a
    * subset of the base, so their per-group min `dmin` is ≥ the
    * stored min `m`; when `dmin > m` the deletes provably didn't
    * touch the minimum and the group merges algebraically
    * (`least(m, insert-min)`, counts add). Only groups with
    * `dmin = m` — in practice a sliver of the keyspace — take the
    * recompute path: live rows (base ∖ deletes ∪ inserts) are
    * SEMI-JOINED down to those groups before the rescan aggregate,
    * so at 100 TB the rescan reads one group's slice, not the fact
    * table. Groups whose rows all vanish drop from the view.
    *
    * `deleteIds` is an id-list frame (`idName` column); `inserts`
    * carries keys + `idName` + `cents`. Output: keys, `n_events`,
    * `min_cents` (both BIGINT). */
  def maintainMin(base: DataFrame, inserts: DataFrame, deleteIds: DataFrame,
      keyNames: Seq[String], idName: String, cents: Column): DataFrame = {
    val keys = keyNames.map(col)
    val state = base.groupBy(keys: _*)
      .agg(min(cents).as("m"), count(lit(1)).as("n"))
    // DISTINCT ids: delete feeds are at-least-once in practice (the
    // q87/dedupStream delivery model), and a replayed id would inflate
    // `dn` below — the live-rows anti-join is duplicate-immune, so the
    // algebraic and recompute legs would silently disagree on n_events
    val delIds = deleteIds.select(col(idName)).distinct()
    val dels = base.join(delIds, idName)
    val delAgg = dels.groupBy(keys: _*)
      .agg(min(cents).as("dmin"), count(lit(1)).as("dn"))
      .select(keyNames.map(k => col(k).as(s"del_$k")) :+ col("dmin") :+ col("dn"): _*)
    val insAgg = inserts.groupBy(keys: _*)
      .agg(min(cents).as("imin"), count(lit(1)).as("inn"))
      .select(keyNames.map(k => col(k).as(s"ins_$k")) :+ col("imin") :+ col("inn"): _*)
    val condIns = keyNames.map(k => col(k) <=> col(s"ins_$k")).reduce(_ && _)
    val merged = state.join(insAgg, condIns, "full_outer")
      .select(keyNames.map(k => coalesce(col(k), col(s"ins_$k")).as(k)) ++
        Seq(col("m"), col("n"), col("imin"), col("inn")): _*)
    val condDel = keyNames.map(k => col(k) <=> col(s"del_$k")).reduce(_ && _)
    val withDel = merged.join(delAgg, condDel, "left")
    // dels ⊆ base ⇒ dmin ≥ m (and dmin non-null implies m non-null);
    // the minimum survives iff dmin > m
    val affectedKeys = withDel
      .filter(col("dmin").isNotNull && col("dmin") === col("m"))
      .select(keys: _*)
    val algebraic = withDel.filter(col("dmin").isNull || col("dmin") > col("m"))
      .select(keyNames.map(col) ++ Seq(
        (coalesce(col("n"), lit(0L)) + coalesce(col("inn"), lit(0L))
          - coalesce(col("dn"), lit(0L))).as("n_events"),
        least(col("m"), col("imin")).as("min_cents")): _*)
      .filter(col("n_events") > 0)
    val live = base.join(delIds, Seq(idName), "left_anti")
      .select(keys :+ cents.as("graft_cents"): _*)
      .unionByName(inserts.select(keys :+ cents.as("graft_cents"): _*))
    // null-SAFE semi-join (the same <=> rule as every other key match
    // here): a usingColumns semi-join compares with ===, so a
    // null-keyed group whose minimum was deleted would never match its
    // surviving live rows and the group would vanish from the view
    // even though rows remain
    val aff = affectedKeys
      .select(keyNames.map(k => col(k).as(s"aff_$k")): _*)
    val condAff = keyNames.map(k => col(k) <=> col(s"aff_$k")).reduce(_ && _)
    val recomputed = live.join(aff, condAff, "left_semi")
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_events"), min(col("graft_cents")).as("min_cents"))
    algebraic.unionByName(recomputed)
  }
}
