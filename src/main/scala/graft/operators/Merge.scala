package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table-maintenance operators the reference's WRITE_TRUNCATE sink
  * (SURVEY §2.2 K1) cannot express: keyed upsert (MERGE) and SCD2
  * history building. Both are pure DataFrame transforms — the caller
  * writes the result with the overwrite sink, which keeps the
  * all-or-nothing idempotency story of the reference while fixing its
  * cross-run data loss (SURVEY appendix: a WRITE_TRUNCATE run for
  * league A erases league B).
  */
object Merge {

  /** MERGE-style upsert: rows of `updates` win over same-key rows of
    * `target`; unmatched target rows survive; unmatched updates
    * insert. Exactly `updates ∪ (target ⟕̸ updates-keys)` — one
    * anti-join shuffle on the key. `target` and `updates` must share a
    * schema (unionByName checks).
    *
    * Scale: the anti join probes only the KEY projection of
    * `updates` — typically a small changeset against a huge target,
    * so mark it broadcast-able (Spark auto-broadcasts under the
    * threshold; the explicit hint keeps the 100 TB plan shape stable
    * when statistics are stale). The target side never shuffles when
    * the key projection broadcasts. */
  def upsert(target: DataFrame, updates: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert requires at least one key column")
    require(!updates.columns.contains("graft_rn"),
      "updates already has a column named graft_rn")
    // one row per key, or the merged result stops being a keyed table
    // (SQL MERGE raises on multiple matches; a streaming micro-batch
    // can legitimately carry several rows for one key). Deterministic
    // tie-break instead of an eager uniqueness count: keep the row
    // with the GREATEST non-key struct (lexicographic in declared
    // column order — "last writer wins" when a version/timestamp
    // column leads the non-key columns). Non-orderable column types
    // (maps) would need a caller-side projection first.
    val nonKey = updates.columns.filterNot(keys.contains)
    val distinctUpdates =
      if (nonKey.isEmpty) updates.distinct()
      else {
        val w = Window.partitionBy(keys.map(col): _*)
          .orderBy(struct(nonKey.toIndexedSeq.map(col): _*).desc)
        updates.withColumn("graft_rn", row_number().over(w))
          .filter(col("graft_rn") === 1).drop("graft_rn")
      }
    val keyRows = distinctUpdates.select(keys.map(col): _*)
    distinctUpdates.unionByName(
      target.join(broadcast(keyRows), keys, "left_anti"))
  }

  /** SCD2 (slowly-changing-dimension type 2) history: collapse an
    * event stream into attribute VERSIONS — one row per (key, run of
    * equal attribute values) with `valid_from`/`valid_to` effective
    * range and `is_current`. The standard dimension-history builder:
    * change detection is `lag` per key, range closing is `lead` over
    * the change rows — two windows over ONE (key)-partitioned sort
    * (same exchange feeds both).
    *
    * `order` must totally order events within a key (pass a tiebreak
    * column after the timestamp); `valid_to` is null on the open
    * (current) version, mirrored by the SQL twin. */
  def scd2(df: DataFrame, key: Seq[Column], attr: Column, validFrom: Column,
      order: Seq[Column]): DataFrame = {
    Seq("graft_attr", "graft_prev", "graft_rn", "valid_from", "valid_to",
      "is_current").foreach { c =>
        require(!df.columns.contains(c), s"input already has a column named $c")
      }
    val w = Window.partitionBy(key: _*).orderBy(order: _*)
    val changes = df
      .withColumn("graft_attr", attr)
      .withColumn("valid_from", validFrom)
      .withColumn("graft_prev", lag(col("graft_attr"), 1).over(w))
      // row_number, NOT prev-is-null, marks the run opener: a null
      // attribute value is a legitimate version, so "first event of
      // the key" and "previous attribute was null" must not conflate
      // (both lag and row_number ride the SAME window pass)
      .withColumn("graft_rn", row_number().over(w))
      .filter(col("graft_rn") === 1 ||
        not(col("graft_attr") <=> col("graft_prev")))
    changes
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select(key ++ Seq(col("graft_attr").as("attr_value"),
        col("valid_from"), col("valid_to"), col("is_current")): _*)
  }
}
