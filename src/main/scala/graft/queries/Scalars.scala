package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.engine.{Q, Tables}

/** Scalar-expression surface: string/date/conditional functions and the
  * batch twin of the streaming time-window aggregate. SURVEY.md §2.3
  * P1-P8 re-expressed + §2.8 gap-fill. All pure narrow expressions —
  * whole-stage codegen, no shuffle until the final aggregate/sort.
  */
object Scalars {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** q15 — string functions over part names: split/element access,
    * regexp extraction, case mapping, length, concat (ref §2.3 P6/P7
    * pk synthesis and split). */
  val q15StringFuncs: Q = Q(
    "q15_string_funcs",
    """SELECT p_partkey,
      |  split_part(p_name, ' ', 1) AS first_word,
      |  regexp_extract(p_name, '([a-z]+)\z', 1) AS last_word,
      |  CAST(length(p_name) AS BIGINT) AS name_len,
      |  upper(p_brand) AS brand_upper,
      |  p_brand || '-' || p_type AS brand_type
      |FROM part
      |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    Tables.part(s, dir)
      .select(
        col("p_partkey"),
        element_at(split(col("p_name"), " "), 1).as("first_word"),
        // \z (end of TEXT) in both dialects: Java's $ also matches
        // before a final line terminator, RE2's $ does not
        regexp_extract(col("p_name"), "([a-z]+)\\z", 1).as("last_word"),
        length(col("p_name")).cast("long").as("name_len"),
        upper(col("p_brand")).as("brand_upper"),
        concat(col("p_brand"), lit("-"), col("p_type")).as("brand_type"))
      .orderBy(col("p_partkey"))
  }

  /** q16 — date/time functions incl. the reference's one genuine date
    * scalar: season derivation (month ≥ 8 → year, else year−1; ref
    * `ingestion/main.py:15-22`, SURVEY §2.7 O6). */
  val q16DateFuncs: Q = Q(
    "q16_date_funcs",
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS BIGINT) AS yr,
      |  CAST(month(o_orderdate) AS BIGINT) AS mth,
      |  CAST(CASE WHEN month(o_orderdate) >= 8 THEN year(o_orderdate) ELSE year(o_orderdate) - 1 END AS BIGINT) AS season,
      |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
      |  CAST(date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mth"),
        when(month(col("o_orderdate")) >= 8, year(col("o_orderdate")))
          .otherwise(year(col("o_orderdate")) - 1).cast("long").as("season"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(col("o_orderdate").cast("date"), lit(java.sql.Date.valueOf("1990-01-01")))
          .cast("long").as("days_since"))
      .orderBy(col("o_orderkey"))
  }

  /** q18 — conditional aggregation (pivot-style): per nation, order
    * counts by status and revenue restricted to urgent priority. */
  val q18ConditionalAgg: Q = Q(
    "q18_conditional_agg",
    """SELECT n_name AS nation,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
      |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS urgent_revenue
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY nation""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(
        sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).cast("long").as("n_open"),
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).cast("long").as("n_filled"),
        sum(when(col("o_orderpriority") === "1-URGENT", dec(col("o_totalprice")))
          .otherwise(dec(lit(0)))).cast("double").as("urgent_revenue"))
      .orderBy(col("nation"))
  }

  /** q19 — aggregate + HAVING: part types with enough stocked items
    * and their exact mean retail price. */
  val q19Having: Q = Q(
    "q19_having",
    """SELECT p_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_parts,
      |  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
      |FROM part
      |GROUP BY p_type
      |HAVING COUNT(*) > 20
      |ORDER BY p_type""".stripMargin) { (s, dir) =>
    Tables.part(s, dir)
      .groupBy(col("p_type"))
      .agg(
        count(lit(1)).as("n_parts"),
        (sum(dec(col("p_retailprice"))).cast("double") / count(lit(1))).as("avg_price"))
      .filter(col("n_parts") > 20)
      .orderBy(col("p_type"))
  }

  /** q22 — tumbling time window over the events stream table (batch
    * twin of the Structured Streaming aggregate in
    * `graft.streaming`): events per hour × type. Scale: date_trunc is
    * a narrow expression, the aggregate shuffles on (hour, type);
    * with a watermark the same plan runs incrementally on a stream. */
  val q22TimeWindow: Q = Q(
    "q22_time_window",
    """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start, event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY hour_start, event_type""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(
        date_trunc("hour", col("ts")).as("hour_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("total_value"))
      .orderBy(col("hour_start"), col("event_type"))
  }

  /** q35 — regex/string-transform battery beyond q15: global
    * regexp_replace (DuckDB needs the 'g' flag for Spark's
    * replace-all semantics), match counting, boolean regex predicate,
    * translate, zero-padding. */
  val q35RegexFuncs: Q = Q(
    "q35_regex_funcs",
    """SELECT p_partkey,
      |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
      |  CAST(len(regexp_extract_all(p_name, '[a-z]+')) AS BIGINT) AS n_words,
      |  CASE WHEN regexp_matches(p_type, '^PROMO') THEN 1 ELSE 0 END AS is_promo,
      |  translate(p_brand, '#', '-') AS brand_dashed,
      |  lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS padded_key
      |FROM part
      |WHERE p_partkey % 10 = 0
      |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    Tables.part(s, dir)
      .filter(col("p_partkey") % 10 === 0)
      .select(
        col("p_partkey"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        regexp_count(col("p_name"), lit("[a-z]+")).cast("long").as("n_words"),
        when(col("p_type").rlike("^PROMO"), 1).otherwise(0).as("is_promo"),
        translate(col("p_brand"), "#", "-").as("brand_dashed"),
        lpad(col("p_partkey").cast("string"), 10, "0").as("padded_key"))
      .orderBy(col("p_partkey"))
  }

  val all: Seq[Q] = Seq(q15StringFuncs, q16DateFuncs, q18ConditionalAgg, q19Having,
    q22TimeWindow, q35RegexFuncs)
}
