package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot reconciliation — the data-ops diff between two versions of
  * a keyed table (CDC backfill validation, migration checks, "what did
  * this pipeline change"): one full outer join on the key, null-safe
  * column compares, three verdicts. The shuffle is the key join and
  * nothing else; at 100 TB both sides arrive partitioned by the same
  * key (bucketed snapshots join exchange-free — `Layout.writeBucketed`).
  */
object Diff {

  /** Row-level diff of `after` vs `before` on `keys`: `added` (key
    * only in after), `removed` (only in before), `changed` (present
    * in both, any compared column differs under null-safe equality).
    * Unchanged rows are dropped — diff output is change-proportional,
    * never snapshot-proportional. Compared columns = the non-key
    * columns the two schemas SHARE; a column present on one side only
    * is ignored (schema evolution is `SchemaRegistry`'s job, not the
    * differ's). Output: key columns + `change_type`.
    *
    * Keys must be UNIQUE per side (the standard differ contract); a
    * null key COMPONENT is legal and matches null-safely across sides
    * (`<=>`), but duplicated full-null keys would pair many-to-many
    * like any other duplicated key. */
  def diff(before: DataFrame, after: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs at least one key column")
    val shared = before.columns.toSeq.intersect(after.columns.toSeq)
      .filterNot(keys.contains)
    // presence is a per-side MARKER column, not key non-nullness: the
    // null-safe join (<=>) matches null key components across sides,
    // so a row present in both snapshots with a null key part must
    // still classify as present-on-both (key-nullity inference would
    // call it 'added'). The marker survives the full outer join as
    // null exactly when the side is absent.
    val b = before.select(
      keys.map(k => col(k).as(s"b_$k")) ++ shared.map(c => col(c).as(s"b_$c")) :+
        lit(true).as("graft_in_b"): _*)
    val a = after.select(
      keys.map(k => col(k).as(s"a_$k")) ++ shared.map(c => col(c).as(s"a_$c")) :+
        lit(true).as("graft_in_a"): _*)
    val joinCond = keys.map(k => col(s"b_$k") <=> col(s"a_$k")).reduce(_ && _)
    val anyDiff = shared.map(c => !(col(s"b_$c") <=> col(s"a_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val inB = col("graft_in_b").isNotNull
    val inA = col("graft_in_a").isNotNull
    b.join(a, joinCond, "full_outer")
      .withColumn("change_type",
        when(!inB, lit("added"))
          .when(!inA, lit("removed"))
          .when(anyDiff, lit("changed")))
      .filter(col("change_type").isNotNull)
      .select(keys.map(k => coalesce(col(s"b_$k"), col(s"a_$k")).as(k)) :+
        col("change_type"): _*)
  }
}
