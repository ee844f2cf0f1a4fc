package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.engine.{Q, Tables}

/** Window functions, top-k, sorts, rollup/cube/grouping-sets —
  * SURVEY.md §2.8's biggest gap (the reference has zero window
  * functions; its `rank` column is ingested data, which the engine
  * recomputes, see Relational.q08).
  */
object Windows {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** q09 — analytic windows: per-customer order timeline with
    * lag/lead, running total and a 3-row moving average. Scale: one
    * shuffle on the partition key, sort within partitions; no
    * unbounded-following frames (those need the whole partition
    * buffered). Skew on a hot customer is bounded by orders/customer.
    */
  val q09WindowAnalytic: Q = Q(
    "q09_window_analytic",
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  lag(o_totalprice) OVER w AS prev_price,
      |  lead(o_totalprice) OVER w AS next_price,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    / CAST(COUNT(*) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS moving_avg
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc_nulls_first, col("o_orderkey"))
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val last3 = w.rowsBetween(-2, Window.currentRow)
    Tables.orders(s, dir)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        sum(dec(col("o_totalprice"))).over(running).cast("double").as("running_total"),
        (sum(dec(col("o_totalprice"))).over(last3).cast("double") /
          count(lit(1)).over(last3)).as("moving_avg"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** q10 — top-k per group (row_number ≤ k): each customer's 3 most
    * expensive orders. Scale: rank-filter prunes inside the window
    * stage; never a global sort of the fact table. */
  val q10TopKPerGroup: Q = Q(
    "q10_topk_per_group",
    """SELECT * FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      |  FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).cast("long").as("rn"))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** q11 — ROLLUP hierarchy totals (nation → segment → grand total).
    * Scale: rollup expands grouping sets inside one aggregate — a
    * single shuffle, not one per level. */
  val q11Rollup: Q = Q(
    "q11_rollup",
    """SELECT n_name, c_mktsegment,
      |  CAST(GROUPING(n_name)*2 + GROUPING(c_mktsegment) AS BIGINT) AS gid,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY ROLLUP(n_name, c_mktsegment)
      |ORDER BY gid, n_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin) { (s, dir) =>
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .rollup(col("n_name"), col("c_mktsegment"))
      .agg(
        grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"),
        sum(dec(col("c_acctbal"))).cast("double").as("total_bal"))
      .orderBy(col("gid"), col("n_name").asc_nulls_first, col("c_mktsegment").asc_nulls_first)
  }

  /** q21 — explicit GROUPING SETS via the SQL surface (the engine's
    * `spark.sql` entry point; the Dataset API exposes rollup/cube
    * only). Scale: same single-shuffle expansion as rollup. */
  val q21GroupingSets: Q = Q(
    "q21_grouping_sets",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_gs")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem_gs
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
  }

  /** q14 — global sort + limit (top 100 line items by price). Scale:
    * Spark plans TakeOrderedAndProject — per-partition top-k then a
    * driver-side merge of k×partitions rows, NOT a global sort. */
  val q14SortLimit: Q = Q(
    "q14_sort_limit",
    """SELECT l_orderkey, l_linenumber, l_extendedprice
      |FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      |LIMIT 100""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(100)
  }

  /** q37 — RANGE frame (value-based, not row-based): per customer, the
    * rolling 30-day order total keyed on the order date expressed in
    * epoch days. Scale: same single shuffle as any window; range
    * frames matter when multiple rows share an ordering value. */
  val q37RangeFrame: Q = Q(
    "q37_range_frame",
    """SELECT o_custkey, o_orderkey, day_no,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
      |    (PARTITION BY o_custkey ORDER BY day_no RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS total_30d
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |        CAST(date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day_no
      |      FROM orders WHERE o_orderdate IS NOT NULL)
      |ORDER BY o_custkey, day_no, o_orderkey""".stripMargin) { (s, dir) =>
    rangeFrame30d(Tables.orders(s, dir))
      .orderBy(col("o_custkey"), col("day_no"), col("o_orderkey"))
  }

  /** q37's engine construction, extracted so its null discipline is
    * unit-testable on a null-bearing fixture (the catalogue fixture is
    * null-free): RANGE frames are defined over NON-NULL ordering keys
    * only — a null day_no row would sit in an engine-defined null peer
    * group (Spark and DuckDB place and frame it differently), so rows
    * with a null order date are dropped BEFORE the window. */
  private[graft] def rangeFrame30d(orders: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val base = orders
      .filter(col("o_orderdate").isNotNull)
      .select(
      col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
      datediff(col("o_orderdate").cast("date"), lit(java.sql.Date.valueOf("1990-01-01")))
        .cast("long").as("day_no"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day_no"))
      .rangeBetween(-30, Window.currentRow)
    base.select(col("o_custkey"), col("o_orderkey"), col("day_no"),
        sum(dec(col("o_totalprice"))).over(w).cast("double").as("total_30d"))
  }

  /** q38 — ranking family: rank / dense_rank / percent_rank /
    * cume_dist / ntile over one partitioning (exact closed-form
    * fractions, deterministic in both engines). */
  val q38RankFamily: Q = Q(
    "q38_rank_family",
    """SELECT c_nationkey, c_custkey,
      |  CAST(rank() OVER w AS BIGINT) AS rnk,
      |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
      |  percent_rank() OVER w AS prnk,
      |  cume_dist() OVER w AS cdist,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC NULLS LAST, c_custkey)
      |ORDER BY c_nationkey, rnk, c_custkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc_nulls_last, col("c_custkey"))
    Tables.customer(s, dir).select(
        col("c_nationkey"), col("c_custkey"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        percent_rank().over(w).as("prnk"),
        cume_dist().over(w).as("cdist"),
        ntile(4).over(w).cast("long").as("quartile"))
      .orderBy(col("c_nationkey"), col("rnk"), col("c_custkey"))
  }

  /** q39 — first/last/nth value with explicit ROWS frames (the
    * implicit default frame differs by engine, so pin it). */
  val q39ValueWindows: Q = Q(
    "q39_value_windows",
    """SELECT o_custkey, o_orderkey,
      |  first_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_price,
      |  last_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
      |  nth_value(o_totalprice, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_price
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc_nulls_first, col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, dir).select(
        col("o_custkey"), col("o_orderkey"),
        first(col("o_totalprice")).over(w).as("first_price"),
        last(col("o_totalprice")).over(w).as("last_price"),
        nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** q51 — gaps-and-islands (streak detection): runs of equal
    * event_type per user under a total (ts, event_id) order, via the
    * row_number-difference island key — VALUE-change sessionization,
    * complementing q40's time-gap session_window. Two window passes
    * over the same (user) partitioning: Catalyst plans ONE shuffle and
    * one sort for both (same partition keys, compatible ordering). */
  val q51Streaks: Q = Q(
    "q51_streaks",
    """WITH e AS (
      |  SELECT user_id, event_type,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST)
      |      - row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts NULLS FIRST, event_id NULLS FIRST) AS isl
      |  FROM events),
      |islands AS (
      |  SELECT user_id, event_type, isl, count(*) AS streak
      |  FROM e GROUP BY user_id, event_type, isl)
      |SELECT user_id,
      |  CAST(max(streak) AS BIGINT) AS max_streak,
      |  CAST(count(*) AS BIGINT) AS n_islands
      |FROM islands GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    val wAll = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc_nulls_first, col("event_id").asc_nulls_first)
    val wType = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").asc_nulls_first, col("event_id").asc_nulls_first)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        (row_number().over(wAll) - row_number().over(wType)).as("isl"))
      .groupBy(col("user_id"), col("event_type"), col("isl"))
      .agg(count(lit(1)).as("streak"))
      .groupBy(col("user_id"))
      .agg(max(col("streak")).as("max_streak"), count(lit(1)).as("n_islands"))
      .orderBy(col("user_id"))
  }

  /** q53 — time-series forward fill: nulls carry the last non-null
    * value per key under the event-time order (gap repair before
    * downstream aggregation — the sensor/telemetry staple). Nulls are
    * induced deterministically (every 5th event) since the corpus has
    * none. One shuffle on user_id; `last(..., ignoreNulls)` over a
    * running ROWS frame is incremental state, not a per-row rescan. */
  val q53ForwardFill: Q = Q(
    "q53_forward_fill",
    """WITH v AS (
      |  SELECT event_id, user_id, ts,
      |    CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
      |  FROM events)
      |SELECT event_id, user_id,
      |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
      |FROM v
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc_nulls_first, col("event_id").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"),
        when(col("event_id") % 5 === 0, lit(null)).otherwise(col("value")).as("v"))
      .select(col("event_id"), col("user_id"),
        last(col("v"), ignoreNulls = true).over(w).as("filled"))
      .orderBy(col("event_id"))
  }

  /** q57 — ordered funnel (view → click → purchase per user): each
    * stage's timestamp is the earliest qualifying event AFTER the
    * previous stage — three chained windowed conditional minima over
    * ONE user partitioning (one exchange; window passes compose), no
    * self-joins. The classic product-analytics sequence query, shaped
    * so a 100 TB event log pays a single shuffle. */
  val q57Funnel: Q = Q(
    "q57_funnel",
    """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |s1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN ts END)
      |                   OVER (PARTITION BY user_id) AS t_view FROM e),
      |s2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts > t_view THEN ts END)
      |                   OVER (PARTITION BY user_id) AS t_click FROM s1),
      |s3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t_click THEN ts END)
      |                   OVER (PARTITION BY user_id) AS t_purchase FROM s2)
      |SELECT DISTINCT user_id, t_view, t_click, t_purchase,
      |  CAST(CASE WHEN t_purchase IS NOT NULL THEN 3
      |            WHEN t_click IS NOT NULL THEN 2
      |            WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS funnel_stage
      |FROM s3 ORDER BY user_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t_click",
        min(when(col("event_type") === "click" && col("ts") > col("t_view"), col("ts"))).over(w))
      .withColumn("t_purchase",
        min(when(col("event_type") === "purchase" && col("ts") > col("t_click"), col("ts"))).over(w))
      .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
        when(col("t_purchase").isNotNull, 3L)
          .when(col("t_click").isNotNull, 2L)
          .when(col("t_view").isNotNull, 1L)
          .otherwise(0L).as("funnel_stage"))
      .distinct()
      .orderBy(col("user_id"))
  }

  /** q64 — SCD2 history (Merge.scd2): each user's event_type stream
    * collapsed into versions with valid_from/valid_to effective ranges
    * and an is_current marker — the dimension-history builder the
    * WRITE_TRUNCATE reference sink cannot express. One
    * (user)-partitioned sort feeds both the change-detect lag and the
    * range-close lead. Timestamps ride as epoch micros (BIGINT) so
    * the comparator never meets timestamp precision. */
  val q64Scd2: Q = Q(
    "q64_scd2",
    """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
      |           FROM events),
      |m AS (SELECT user_id, event_type, ts, event_id,
      |        lag(event_type) OVER w AS prev,
      |        row_number() OVER w AS rn
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST)),
      |c AS (SELECT user_id, event_type, ts, event_id FROM m
      |      WHERE rn = 1 OR event_type IS DISTINCT FROM prev),
      |f AS (SELECT user_id, event_type AS attr_value, epoch_us(ts) AS valid_from,
      |        epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST)) AS valid_to
      |      FROM c)
      |SELECT user_id, attr_value, valid_from, valid_to,
      |  (valid_to IS NULL) AS is_current
      |FROM f ORDER BY user_id, valid_from, attr_value""".stripMargin) { (s, dir) =>
    graft.operators.Merge.scd2(
        Tables.events(s, dir).select(col("user_id"), col("event_type"),
          col("ts"), col("event_id")),
        key = Seq(col("user_id")), attr = col("event_type"),
        validFrom = col("ts"), order = Seq(col("ts").asc_nulls_first, col("event_id").asc_nulls_first))
      .select(col("user_id"), col("attr_value"),
        unix_micros(col("valid_from")).as("valid_from"),
        unix_micros(col("valid_to")).as("valid_to"), col("is_current"))
      .orderBy(col("user_id"), col("valid_from"), col("attr_value"))
  }

  val all: Seq[Q] = Seq(
    q09WindowAnalytic, q10TopKPerGroup, q11Rollup, q21GroupingSets, q14SortLimit,
    q37RangeFrame, q38RankFamily, q39ValueWindows, q51Streaks, q53ForwardFill, q57Funnel,
    q64Scd2)
}
