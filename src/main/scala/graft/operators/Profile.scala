package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality profiling: per-column completeness / uniqueness /
  * range in ONE scan. The naive formulation (one `SELECT count,
  * count(col), count(DISTINCT col), min, max` per column) scans the
  * table k times; this computes every metric as one wide aggregate
  * row — single pass, map-side partials, exact distinct counts — and
  * unpivots driver-sized data (one row) into the long
  * (column, metrics) profile. At 100 TB, swap `count_distinct` for
  * `approx_count_distinct` when exactness isn't required (one line;
  * the profile then needs no second shuffle for the distinct either).
  *
  * min/max surface as strings so heterogeneous column types share one
  * schema; keep DOUBLE columns out of oracle-compared profiles
  * (engines format float strings differently).
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    cols.foreach { c =>
      require(df.columns.contains(c), s"no such column: $c")
    }
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"${c}__nonnull"),
      count_distinct(col(c)).as(s"${c}__distinct"),
      min(col(c)).cast("string").as(s"${c}__min"),
      max(col(c)).cast("string").as(s"${c}__max")))
    val allAggs = count(lit(1)).as("graft_total") +: aggs
    val row = df.agg(allAggs.head, allAggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', graft_total, `${c}__nonnull`, `${c}__distinct`, `${c}__min`, `${c}__max`")
      .mkString(", ")
    row.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (column_name, n_rows, n_nonnull, n_distinct, min_s, max_s)")
  }
}
