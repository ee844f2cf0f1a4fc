package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join — an operator Spark lacks natively (SURVEY.md §2.5 note:
  * the reference has no temporal joins either, but a complete engine
  * exposes one). For each left row, pick the single right row with the
  * greatest `rightTime <= leftTime` among rows sharing the key.
  *
  * Composition strategy (preference order (a) of the build rules —
  * compose built-ins): equi-join on the key with the range predicate,
  * then keep the latest right row per left row via row_number. Correct
  * for bounded fan-in per key.
  *
  * Scale: the equi+range join shuffles both sides on the key once; the
  * window runs inside the same partitioning. For heavily skewed keys a
  * production deployment switches to the union-tag trick (interleave
  * both sides sorted by (key, time), propagate last-seen right values
  * with a running window — one sort, zero row explosion); that variant
  * is `asofJoinSorted` below. Both produce identical results; the
  * choice is a physical one, exactly the kind of decision Catalyst
  * can't make for a missing logical operator.
  */
object AsOf {

  /** Both physical forms reference payload columns by bare name after
    * combining the two sides, so left/right payload names must be
    * disjoint and must not collide with the internal asof_* columns —
    * checked here so misuse errors clearly at construction instead of
    * as an AMBIGUOUS_REFERENCE at runtime. */
  private def requireDistinctCols(leftCols: Seq[String], rightCols: Seq[String]): Unit = {
    val overlap = leftCols.intersect(rightCols)
    require(overlap.isEmpty,
      s"left and right payload column names must be disjoint; shared: ${overlap.mkString(",")}")
    val reserved = (leftCols ++ rightCols).filter(_.startsWith("asof_"))
    require(reserved.isEmpty,
      s"payload columns must not use the reserved asof_ prefix: ${reserved.mkString(",")}")
  }

  /** Join+window form: good when per-key right-row counts are modest.
    *
    * Determinism contract (both forms agree):
    *  - every LEFT ROW emits exactly one output row — a per-row unique
    *    id is the window partition key, so two fully identical left
    *    rows both survive (a value-based partition key would collapse
    *    them, deviating from left-join semantics);
    *  - ties on rightTime within a key are broken by the greatest
    *    `rightCols` tuple (lexicographic in the given order), so the
    *    picked right row is a pure function of the data, not of the
    *    shuffle schedule.
    */
  /** `toleranceUs`: when set, a right row only matches if it is at
    * most that many microseconds older than the left row (both time
    * columns must be timestamps) — the "ignore stale quotes" as-of
    * variant. Staler rows are treated as absent: a left row whose
    * only candidates are too old comes back null-matched, exactly
    * like a row with no candidates at all. */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      leftCols: Seq[String], rightCols: Seq[String],
      toleranceUs: Option[Long] = None): DataFrame = {
    requireDistinctCols(leftCols, rightCols)
    // the id never reaches the output — it only keys the window, so
    // its run-to-run instability is invisible
    val l = left.select(leftKey.as("asof_key") +: leftTime.as("asof_lt") +:
      leftCols.map(col): _*)
      .withColumn("asof_lid", monotonically_increasing_id())
    val r = right.select(rightKey.as("asof_rkey") +: rightTime.as("asof_rt") +:
      rightCols.map(col): _*)
    val base = col("asof_key") === col("asof_rkey") && col("asof_rt") <= col("asof_lt")
    val cond = toleranceUs.fold(base) { tol =>
      base && (unix_micros(col("asof_lt")) - unix_micros(col("asof_rt")) <= tol)
    }
    val joined = l.join(r, cond, "left")
    val w = Window
      .partitionBy(col("asof_lid"))
      .orderBy(col("asof_rt").desc_nulls_last +:
        rightCols.map(c => col(c).desc_nulls_last): _*)
    joined
      .withColumn("asof_rn", row_number().over(w))
      .filter(col("asof_rn") === 1)
      .select(col("asof_key") +: col("asof_lt") +:
        (leftCols.map(col) ++ rightCols.map(col)): _*)
  }

  /** Union-tag form: one sort by (key, time), the last-seen right ROW
    * carried forward — no join fan-out, skew-safe. Right columns must
    * be named distinctly from left's.
    *
    * The carry is one STRUCT of all right columns, not per-column
    * `last(ignoreNulls)` carries: a right row with a null payload
    * column must be picked atomically (per-column carries would stitch
    * together values from different right rows — a tuple that never
    * existed — whenever the latest row has a null field). */
  def asofJoinSorted(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      leftCols: Seq[String], rightCols: Seq[String]): DataFrame = {
    requireDistinctCols(leftCols, rightCols)
    val rStructType = "struct<" +
      rightCols.map(c => s"`$c`:${right.schema(c).dataType.sql}").mkString(",") + ">"
    val l = left.select(leftKey.as("asof_key") +: leftTime.as("asof_t") +:
      lit(1).as("asof_is_left") +:
      (leftCols.map(col) :+ lit(null).cast(rStructType).as("asof_r")): _*)
    // a NULL-keyed right row can never match under asofJoin's ===
    // equi-join, but partitionBy(asof_key) groups null keys into one
    // live partition — unfiltered, a null-key left row would carry a
    // null-key right row and the two physical forms would diverge on
    // exactly the rows the equality semantics say match nothing
    val r = right.filter(rightKey.isNotNull)
      .select(rightKey.as("asof_key") +: rightTime.as("asof_t") +:
      lit(0).as("asof_is_left") +:
      (leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightCols.map(col): _*).as("asof_r")): _*)
    // right rows sort before left rows at equal time => "<=" semantics;
    // the right struct ascending pins which right row is "last seen"
    // among equal timestamps (greatest tuple — same tie rule as
    // asofJoin)
    val w = Window.partitionBy(col("asof_key"))
      .orderBy(col("asof_t"), col("asof_is_left"), col("asof_r").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select(col("asof_key") +: col("asof_t") +: col("asof_is_left") +:
        (leftCols.map(col) :+
          last(col("asof_r"), ignoreNulls = true).over(w).as("asof_r")): _*)
    carried.filter(col("asof_is_left") === 1)
      .select(col("asof_key") +: col("asof_t").as("asof_lt") +:
        (leftCols.map(col) ++ rightCols.map(c => col(s"asof_r.`$c`").as(c))): _*)
  }
}
