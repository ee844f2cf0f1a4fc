package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.Column

import graft.engine.{Q, Tables}

/** Join-surface queries: outer joins, broadcast fact⋈dim, distinct
  * aggregation over joins, set operations, scalar subqueries.
  * SURVEY.md §2.5 (the reference only has broadcast inner equi-joins;
  * the rest is §2.8 gap-fill the engine must still expose).
  */
object Joins {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** q04 — left outer join with null-aware aggregates: every customer,
    * with count/sum of only their big orders (0 where none). Scale:
    * shuffle on custkey both sides; AQE coalesces post-shuffle
    * partitions; aggregate is partial. */
  val q04LeftJoin: Q = Q(
    "q04_left_join",
    """SELECT c_custkey,
      |  CAST(COUNT(o_orderkey) AS BIGINT) AS n_big_orders,
      |  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS big_total
      |FROM customer
      |LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 200000) o
      |  ON c_custkey = o.o_custkey
      |GROUP BY c_custkey
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter(col("o_totalprice") > 200000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(
        count(col("o_orderkey")).as("n_big_orders"),
        coalesce(sum(dec(col("o_totalprice"))), lit(0)).cast("double").as("big_total"))
      .orderBy(col("c_custkey"))
  }

  /** q07 — fact ⋈ dimension with an explicit broadcast hint: lineitem
    * (the 100 TB side) joined to part (bounded dim) without shuffling
    * the fact table — at scale this is THE difference between a
    * map-side join and a full shuffle of the fact table. Ref analog:
    * §2.5 J1's in-memory build side, done Spark-first. */
  val q07BroadcastJoin: Q = Q(
    "q07_broadcast_join",
    """SELECT p_brand,
      |  CAST(COUNT(*) AS BIGINT) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS brand_revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    val p = Tables.part(s, dir)
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(dec(col("l_extendedprice"))).cast("double").as("brand_revenue"))
      .orderBy(col("p_brand"))
  }

  /** q12 — distinct aggregation: per nation, distinct market segments
    * and exact customer count. Scale: count_distinct expands to a
    * two-phase aggregate (partial dedup then merge) — no driver
    * collect; for ~unbounded cardinality swap in
    * approx_count_distinct (HLL) which the catalogue exposes via
    * `Extended` ops. */
  val q12DistinctAgg: Q = Q(
    "q12_distinct_agg",
    """SELECT n_name AS nation,
      |  CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_segments,
      |  CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_customers,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY nation""".stripMargin) { (s, dir) =>
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(
        countDistinct(col("c_mktsegment")).as("n_segments"),
        countDistinct(col("c_custkey")).as("n_customers"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("nation"))
  }

  /** q13 — set operations (§2.8: the reference deliberately never
    * merges its two per-API tables; a complete engine does): nations
    * that have customers vs nations that have suppliers, tagged by
    * membership. Scale: INTERSECT/EXCEPT plan as aggregate + semi/anti
    * joins on already-small distinct sets. */
  val q13SetOps: Q = Q(
    "q13_set_ops",
    """WITH cn AS (SELECT DISTINCT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey),
      |     sn AS (SELECT DISTINCT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey)
      |SELECT 'both' AS tag, n_name FROM (SELECT n_name FROM cn INTERSECT SELECT n_name FROM sn)
      |UNION ALL
      |SELECT 'customer_only' AS tag, n_name FROM (SELECT n_name FROM cn EXCEPT SELECT n_name FROM sn)
      |UNION ALL
      |SELECT 'supplier_only' AS tag, n_name FROM (SELECT n_name FROM sn EXCEPT SELECT n_name FROM cn)
      |ORDER BY tag, n_name""".stripMargin) { (s, dir) =>
    val n = Tables.nation(s, dir)
    val cn = Tables.customer(s, dir)
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name")).distinct()
    val sn = Tables.supplier(s, dir)
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name")).distinct()
    val both = cn.intersect(sn).withColumn("tag", lit("both"))
    val cOnly = cn.except(sn).withColumn("tag", lit("customer_only"))
    val sOnly = sn.except(cn).withColumn("tag", lit("supplier_only"))
    both.unionByName(cOnly).unionByName(sOnly)
      .select(col("tag"), col("n_name"))
      .orderBy(col("tag"), col("n_name"))
  }

  /** q58 — BAG-semantics set operations (EXCEPT ALL / INTERSECT ALL):
    * multiplicities survive — 5 customers minus 2 suppliers in a
    * nation leaves 3 rows, where q13's DISTINCT forms collapse to
    * membership. Spark plans these as aggregate + replicate
    * (sum_of_counts), no row-by-row matching. */
  val q58BagSetOps: Q = Q(
    "q58_bag_set_ops",
    """WITH ca AS (SELECT CAST(c_nationkey AS BIGINT) AS n FROM customer),
      |     sa AS (SELECT CAST(s_nationkey AS BIGINT) AS n FROM supplier)
      |SELECT 'except_all' AS tag, n, CAST(count(*) AS BIGINT) AS n_rows
      |FROM (SELECT n FROM ca EXCEPT ALL SELECT n FROM sa) GROUP BY n
      |UNION ALL
      |SELECT 'intersect_all' AS tag, n, CAST(count(*) AS BIGINT) AS n_rows
      |FROM (SELECT n FROM ca INTERSECT ALL SELECT n FROM sa) GROUP BY n
      |ORDER BY tag, n""".stripMargin) { (s, dir) =>
    val ca = Tables.customer(s, dir).select(col("c_nationkey").cast("long").as("n"))
    val sa = Tables.supplier(s, dir).select(col("s_nationkey").cast("long").as("n"))
    val ex = ca.exceptAll(sa).groupBy(col("n"))
      .agg(count(lit(1)).as("n_rows")).withColumn("tag", lit("except_all"))
    val in = ca.intersectAll(sa).groupBy(col("n"))
      .agg(count(lit(1)).as("n_rows")).withColumn("tag", lit("intersect_all"))
    ex.unionByName(in)
      .select(col("tag"), col("n"), col("n_rows"))
      .orderBy(col("tag"), col("n"))
  }

  /** q20 — scalar subquery: customers above the global mean balance.
    * Scale: the 1-row global aggregate is broadcast into the filter
    * (no driver round-trip, no second scan of a cached collect);
    * exact decimal mean so both engines agree bit-for-bit. */
  val q20ScalarSubquery: Q = Q(
    "q20_scalar_subquery",
    """SELECT c_custkey, c_acctbal
      |FROM customer
      |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM customer)
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val c = Tables.customer(s, dir)
    val mean = c.agg(
      (sum(dec(col("c_acctbal"))).cast("double") / count(lit(1))).as("mean_bal"))
    c.crossJoin(broadcast(mean))
      .filter(col("c_acctbal") > col("mean_bal"))
      .select(col("c_custkey"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  /** q33 — five-table star chain (region ⋈ nation ⋈ customer ⋈ orders
    * ⋈ lineitem): the join-REORDER surface — Catalyst/CBO pick build
    * sides and ordering; the two dimension legs broadcast, the two
    * fact legs shuffle on their keys once each. TPC-H Q5-shaped
    * revenue per region. */
  val q33MultiwayJoin: Q = Q(
    "q33_multiway_join",
    """SELECT r_name,
      |  CAST(COUNT(*) AS BIGINT) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM region
      |JOIN nation ON n_regionkey = r_regionkey
      |JOIN customer ON c_nationkey = n_nationkey
      |JOIN orders ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE o_orderstatus = 'F'
      |GROUP BY r_name
      |ORDER BY r_name""".stripMargin) { (s, dir) =>
    val r = Tables.region(s, dir)
    val n = Tables.nation(s, dir)
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
    val l = Tables.lineitem(s, dir)
    r.join(n, col("n_regionkey") === col("r_regionkey"))
      .join(c, col("c_nationkey") === col("n_nationkey"))
      .join(o, col("o_custkey") === col("c_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_items"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"))
      .orderBy(col("r_name"))
  }

  val all: Seq[Q] = Seq(q04LeftJoin, q07BroadcastJoin, q12DistinctAgg, q13SetOps,
    q20ScalarSubquery, q33MultiwayJoin, q58BagSetOps)
}
