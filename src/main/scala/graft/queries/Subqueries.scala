package graft.queries

import graft.engine.{Q, Tables}

/** Subquery/CTE surface: correlated EXISTS (decorrelated to a semi
  * join by Catalyst), correlated LATERAL with per-row top-k, and
  * recursive CTEs (Spark 4 `WITH RECURSIVE`). These exercise the SQL
  * front-end paths a migrating user would hit; the DataFrame twins
  * (q05 semi join, q10 window top-k) already cover the same physical
  * shapes, so the interesting check here is that the DECLARATIVE
  * forms plan to the scalable operators rather than nested loops.
  */
object Subqueries {

  private def views(s: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    Tables.orders(s, dir).createOrReplaceTempView("g_orders")
    Tables.customer(s, dir).createOrReplaceTempView("g_customer")
    Tables.nation(s, dir).createOrReplaceTempView("g_nation")
  }

  /** q45 — correlated EXISTS: customers holding at least one urgent
    * open order. Catalyst decorrelates to a left-semi hash join (one
    * shuffle), never a per-row probe. */
  val q45ExistsSubquery: Q = Q(
    "q45_exists_subquery",
    """SELECT c_custkey, c_name
      |FROM customer c
      |WHERE EXISTS (
      |  SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey
      |    AND o.o_orderpriority = '1-URGENT' AND o.o_orderstatus = 'O')
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    views(s, dir)
    s.sql("""SELECT c_custkey, c_name
            |FROM g_customer c
            |WHERE EXISTS (
            |  SELECT 1 FROM g_orders o
            |  WHERE o.o_custkey = c.c_custkey
            |    AND o.o_orderpriority = '1-URGENT' AND o.o_orderstatus = 'O')
            |ORDER BY c_custkey""".stripMargin)
  }

  /** q46 — correlated LATERAL: each nation's 2 highest-value orders.
    * Spark decorrelates the limit via a rank window partitioned by the
    * correlation key — the same physical shape as q10's explicit
    * top-k, from declarative SQL. */
  val q46LateralJoin: Q = Q(
    "q46_lateral_join",
    """SELECT n_name, t.o_orderkey, t.o_totalprice
      |FROM nation, LATERAL (
      |  SELECT o_orderkey, o_totalprice
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE c_nationkey = n_nationkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      |ORDER BY n_name, t.o_totalprice DESC, t.o_orderkey""".stripMargin) { (s, dir) =>
    views(s, dir)
    s.sql("""SELECT n_name, t.o_orderkey, t.o_totalprice
            |FROM g_nation, LATERAL (
            |  SELECT o_orderkey, o_totalprice
            |  FROM g_orders JOIN g_customer ON o_custkey = c_custkey
            |  WHERE c_nationkey = n_nationkey
            |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
            |ORDER BY n_name, t.o_totalprice DESC, t.o_orderkey""".stripMargin)
  }

  /** q47 — recursive CTE (Spark 4 WITH RECURSIVE): a generated frontier
    * joined back to data each step. */
  val q47RecursiveCte: Q = Q(
    "q47_recursive_cte",
    """WITH RECURSIVE t(n) AS (
      |  SELECT 0
      |  UNION ALL
      |  SELECT n + 1 FROM t WHERE n < 24)
      |SELECT CAST(t.n AS BIGINT) AS n, n_name
      |FROM t JOIN nation ON n_nationkey = t.n
      |ORDER BY n""".stripMargin) { (s, dir) =>
    views(s, dir)
    s.sql("""WITH RECURSIVE t(n) AS (
            |  SELECT 0
            |  UNION ALL
            |  SELECT n + 1 FROM t WHERE n < 24)
            |SELECT CAST(t.n AS BIGINT) AS n, n_name
            |FROM t JOIN g_nation ON n_nationkey = t.n
            |ORDER BY n""".stripMargin)
  }

  val all: Seq[Q] = Seq(q45ExistsSubquery, q46LateralJoin, q47RecursiveCte)
}
