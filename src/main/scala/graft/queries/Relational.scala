package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.engine.{Q, Tables}

/** Core relational query surface.
  *
  * Covers SURVEY.md §2's operator inventory re-expressed over the driver's
  * TPC-H-ish tables, plus the §2.8 gap-fill (windows, sorts/top-k, set ops,
  * distinct aggregates, json/date/string scalar functions) the reference
  * lacks but a complete engine needs.
  *
  * Determinism rules (every query must hash-match its DuckDB oracle):
  *  - double sums go through DECIMAL(18,2) (exact in both engines), then
  *    cast back to double;
  *  - integer-ish outputs are pinned to BIGINT on both sides (DuckDB
  *    sum/rank return HUGEINT/BIGINT, Spark INT/LONG — cast explicitly);
  *  - every result has a total ORDER BY (driver hash is order-sensitive).
  *
  * Scale notes are per-query in the Scaladoc: the same plans target a
  * 1000-executor cluster; dimension joins are broadcast, fact-fact joins
  * shuffle on their join key only, aggregations are partial (map-side)
  * by construction.
  */
object Relational {

  /** Exact money arithmetic: cast to DECIMAL(18,2) before summing. */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** q01 — pricing summary (TPC-H Q1 shape): scan → filter → groupBy
    * with multiple partial aggregates. Scale: map-side combine on 2
    * grouping keys (4 groups) means the shuffle carries only
    * #partitions×#groups rows; the filter and the 7-column projection
    * push into the parquet scan.
    * Ref semantics analog: §2.4 G1 aggregation recomputed from facts.
    */
  val q01PricingSummary: Q = Q(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(COUNT(*) AS BIGINT) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dec(col("l_quantity")).pipe(sum).cast("double").as("sum_qty"),
        dec(col("l_extendedprice")).pipe(sum).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** q02 — filter + projection. Scale: both the predicate and the 3-col
    * projection reach the parquet scan (PushedFilters/ReadSchema);
    * nothing shuffles. */
  val q02FilterProject: Q = Q(
    "q02_filter_project",
    """SELECT l_orderkey, l_linenumber, l_shipdate
      |FROM lineitem
      |WHERE l_quantity > 45 AND l_returnflag = 'R'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_quantity") > 45 && col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** q03 — 3-way join + aggregate (orders ⋈ customer ⋈ nation).
    * Scale: nation (25 rows) is broadcast; orders⋈customer shuffles on
    * custkey once; the aggregate reuses that exchange where possible.
    * Ref analog: §2.5 J1/J2 hash equi-joins. */
  val q03JoinAgg: Q = Q(
    "q03_join_agg",
    """SELECT n_name AS nation, o_orderpriority AS priority,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY 1, 2
      |ORDER BY nation, priority""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name").as("nation"), col("o_orderpriority").as("priority"))
      .agg(
        count(lit(1)).as("n_orders"),
        dec(col("o_totalprice")).pipe(sum).cast("double").as("total_price"))
      .orderBy(col("nation"), col("priority"))
  }

  /** q05 — left-semi join (EXISTS): customers that placed at least one
    * high-value order. Ref analog: §2.3 P9 probe-hit keep. Scale: semi
    * join dedups the probe side early — no row explosion. */
  val q05SemiJoin: Q = Q(
    "q05_semi_join",
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter(col("o_totalprice") > 300000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** q06 — left-anti join (NOT EXISTS): customers with no high-priority
    * order. Ref analog: the complement of P9 (unmatched rows made
    * observable instead of silently skipped). */
  val q06AntiJoin: Q = Q(
    "q06_anti_join",
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** q08 — the flagship "league table" (SURVEY §7.2 slice 0): per
    * (season=order year, nation) a standings row — games played (order
    * count), points (total spend), and rank() within the season by
    * points desc — i.e. the reference's unified output shape
    * (rank/points/played per group, v1.json:11-14) recomputed from
    * facts.
    * Scale: the rank window partitions by season (few partitions, each
    * ≤ #nations rows AFTER aggregation — the window runs on the tiny
    * aggregated set, never on the fact table). */
  val q08LeagueTable: Q = Q(
    "q08_league_table",
    """WITH agg AS (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS season, n_name AS nation,
      |         CAST(COUNT(*) AS BIGINT) AS games_played,
      |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS points
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY 1, 2)
      |SELECT season, nation, games_played, points,
      |       CAST(rank() OVER (PARTITION BY season ORDER BY points DESC, nation) AS BIGINT) AS rnk
      |FROM agg
      |ORDER BY season, rnk, nation""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val agg = o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("season"), col("n_name").as("nation"))
      .agg(
        count(lit(1)).as("games_played"),
        dec(col("o_totalprice")).pipe(sum).cast("double").as("points"))
    agg
      .withColumn("rnk",
        rank().over(Window.partitionBy(col("season"))
          .orderBy(col("points").desc, col("nation"))).cast("long"))
      .orderBy(col("season"), col("rnk"), col("nation"))
  }

  /** q17 — JSON scalar extraction over events.props (§2.8 string/json
    * gap-fill; ref stages raw JSON payloads, §1.1). Scale: pure
    * per-row expression, whole-stage codegen, no shuffle before agg. */
  val q17JsonExtract: Q = Q(
    "q17_json_extract",
    """SELECT event_type,
      |  CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    // try_cast on BOTH sides: Spark's get_json_object+cast nulls a
    // non-integer '$.k' while a strict DuckDB CAST would abort the
    // whole oracle — TRY_CAST keeps the engines' lenient semantics
    // aligned for arbitrary props payloads
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        sum(get_json_object(col("props"), "$.k").try_cast("long")).as("sum_k"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  /** Small syntax helper so aggregate pipelines read left-to-right. */
  implicit private class ColOps(private val c: Column) extends AnyVal {
    def pipe(f: Column => Column): Column = f(c)
  }

  val all: Seq[Q] = Seq(
    q01PricingSummary, q02FilterProject, q03JoinAgg,
    q05SemiJoin, q06AntiJoin, q08LeagueTable, q17JsonExtract)
}
