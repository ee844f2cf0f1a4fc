package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.Q

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query catalogue is assembled from the per-module registries; each
  * entry carries its DuckDB oracle SQL twin (or None for ops that are
  * not SQL-expressible, which the driver checks rows-only).
  */
object SparkEntry {

  /** Every implemented operator from SURVEY.md §2, one Q per name. */
  def catalogue: Seq[Q] =
    graft.queries.Relational.all ++
      graft.queries.Joins.all ++
      graft.queries.Windows.all ++
      graft.queries.Scalars.all ++
      graft.queries.Football.all ++
      graft.queries.Extended.all ++
      graft.queries.Advanced.all ++
      graft.queries.Scale.all ++
      graft.queries.Subqueries.all ++
      graft.queries.Graphs.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q08LeagueTable.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalogue.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalogue.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
