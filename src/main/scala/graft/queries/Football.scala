package graft.queries

import org.apache.spark.sql.functions._

import graft.engine.{Enforce, Paths, Q, Tables}
import graft.engine.Enforce.FieldSpec

/** The reference's signature operators exercised through the oracle
  * harness: schema enforcement with dead-letter routing (SURVEY.md
  * §2.6 E1/E2) and path-convention pk extraction (§2.3 P1), driven by
  * a raw view derived from the events table (bad rows induced
  * deterministically so the split is non-trivial at every sf).
  */
object Football {

  /** Raw, stringly-typed view of events with a deliberately corrupt
    * INTEGER field on every 97th row — the shape records have when
    * they arrive from staged JSON (ref §1.1). */
  private def rawEvents(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.events(s, dir).select(
      col("event_id"),
      when(col("event_id") % 97 === 0, lit("not_a_number"))
        .otherwise(get_json_object(col("props"), "$.k")).as("k"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))

  private val rawOracle =
    """SELECT event_id,
      |    CASE WHEN event_id % 97 = 0 THEN 'not_a_number'
      |         ELSE json_extract_string(props, '$.k') END AS k,
      |    strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s
      |  FROM events""".stripMargin

  /** Oracle twin of Enforce.withError for the event schema —
    * STRUCTURAL (TRY_CAST per field, tags joined in schema order),
    * not a hardcoded replay of the %97 corruption rule, so the
    * Spark/DuckDB comparison stays valid on data where OTHER fields
    * fail too (a naturally non-integer props.k, a null event_id).
    * DuckDB's concat_ws skips NULLs exactly like Spark's. */
  private val errOracle =
    """concat_ws(',',
      |  CASE WHEN event_id IS NULL THEN 'missing_required:event_id'
      |       WHEN TRY_CAST(CAST(event_id AS VARCHAR) AS BIGINT) IS NULL THEN 'cast_failure:event_id' END,
      |  CASE WHEN k IS NOT NULL AND TRY_CAST(k AS BIGINT) IS NULL THEN 'cast_failure:k' END,
      |  CASE WHEN ts_s IS NOT NULL AND TRY_CAST(ts_s AS TIMESTAMP) IS NULL THEN 'cast_failure:ts_s' END)""".stripMargin

  private val eventSchema = Seq(
    FieldSpec("event_id", "INTEGER", required = true),
    FieldSpec("k", "INTEGER"),
    FieldSpec("ts_s", "TIMESTAMP"))

  /** q30 — enforcement OK path: validate + cast + prune; clean rows
    * come out typed (ref `helpers.py:51-101`). */
  val q30EnforceOk: Q = Q(
    "q30_enforce_ok",
    s"""WITH raw AS ($rawOracle),
       |flagged AS (SELECT *, $errOracle AS err FROM raw)
       |SELECT TRY_CAST(event_id AS BIGINT) AS event_id,
       |       TRY_CAST(k AS BIGINT) AS k,
       |       TRY_CAST(ts_s AS TIMESTAMP) AS ts_s
       |FROM flagged WHERE err = ''
       |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val (ok, _) = Enforce.split(rawEvents(s, dir), eventSchema)
    ok.orderBy(col("event_id"))
  }

  /** q31 — enforcement dead-letter path: rows with a failed cast are
    * diverted (never kill the job) with a field-tagged error (ref
    * `transforms.py:182-184`). */
  val q31EnforceDead: Q = Q(
    "q31_enforce_dead",
    s"""WITH raw AS ($rawOracle),
       |flagged AS (SELECT *, $errOracle AS err FROM raw)
       |SELECT event_id, err AS error
       |FROM flagged WHERE err <> ''
       |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val (_, dead) = Enforce.split(rawEvents(s, dir), eventSchema)
    dead.select(col("event_id"), col("error")).orderBy(col("event_id"))
  }

  /** q34 — dead-letter JSON sink shape (ref `pipeline.py:57-63`): one
    * `{"PK": ..., "error": ...}` document per diverted row. */
  val q34DeadLetterJson: Q = Q(
    "q34_dead_letter_json",
    s"""WITH raw AS ($rawOracle),
       |flagged AS (SELECT *, $errOracle AS err FROM raw)
       |SELECT '{"PK":' || event_id || ',"error":"' || err || '"}' AS value
       |FROM flagged WHERE err <> ''
       |ORDER BY value""".stripMargin) { (s, dir) =>
    val (_, dead) = Enforce.split(rawEvents(s, dir), eventSchema)
    Enforce.deadLetterJson(dead, "event_id").orderBy(col("value"))
  }

  /** q32 — pk extraction from the staged-file path convention, incl.
    * the `"unknown"` fallback for malformed paths (ref
    * `helpers.py:8-27`); grouped to standings-group granularity. */
  val q32PkExtract: Q = Q(
    "q32_pk_extract",
    """WITH paths AS (
      |  SELECT CASE WHEN event_id % 31 = 0 THEN 'api/malformed/run.json'
      |              ELSE 'api/season_' || CAST(year(CAST(ts AS TIMESTAMP)) AS VARCHAR)
      |                   || '/league_' || CAST(user_id % 10 AS VARCHAR) || '/teams/run_1.json' END AS path
      |  FROM events),
      |pks AS (
      |  SELECT CASE WHEN regexp_extract(path, '/season_([0-9]+)/league_([0-9]+)/', 1) = ''
      |              THEN 'unknown'
      |              ELSE regexp_extract(path, '/season_([0-9]+)/league_([0-9]+)/', 1) || '-'
      |                   || regexp_extract(path, '/season_([0-9]+)/league_([0-9]+)/', 2) END AS pk
      |  FROM paths)
      |SELECT pk, CAST(COUNT(*) AS BIGINT) AS n_files
      |FROM pks GROUP BY pk ORDER BY pk""".stripMargin) { (s, dir) =>
    val paths = Tables.events(s, dir).select(
      when(col("event_id") % 31 === 0, lit("api/malformed/run.json"))
        .otherwise(concat(
          lit("api/season_"), year(col("ts")).cast("string"),
          lit("/league_"), (col("user_id") % 10).cast("string"),
          lit("/teams/run_1.json"))).as("path"))
    paths.select(Paths.extractPk(col("path")).as("pk"))
      .groupBy(col("pk")).agg(count(lit(1)).as("n_files"))
      .orderBy(col("pk"))
  }

  val all: Seq[Q] = Seq(q30EnforceOk, q31EnforceDead, q34DeadLetterJson, q32PkExtract)
}
