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
    // Column API throughout — no SQL-text interpolation, so a column
    // name containing quotes/backticks/dots is data, never parsed
    // expression text. `ref` backtick-quotes (doubling inner
    // backticks) so col() resolves the name literally instead of as
    // a nested-field path.
    def ref(c: String) = col("`" + c.replace("`", "``") + "`")
    val metrics = array(cols.map { c =>
      struct(
        lit(c).as("column_name"),
        count(lit(1)).as("n_rows"),
        count(ref(c)).as("n_nonnull"),
        count_distinct(ref(c)).as("n_distinct"),
        min(ref(c)).cast("string").as("min_s"),
        max(ref(c)).cast("string").as("max_s"))
    }: _*)
    // one wide aggregate row → explode to the long profile (the
    // unpivot is over driver-sized data: one row, |cols| structs)
    df.agg(metrics.as("graft_m"))
      .select(explode(col("graft_m")).as("graft_row"))
      .select(col("graft_row.*"))
  }
}
