package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's TPC-H-ish parquet tables (TESTDATA.md).
  *
  * All queries take a scale-factor directory so the same plan runs at
  * sf0.001 (smoke), sf0.01 (correctness) and sf0.1 (bench) — and, by
  * design, unchanged on a real cluster where `sfDir` is an object-store
  * prefix over TBs of parquet. Nothing here collects to the driver;
  * scans stay columnar (vectorized parquet reader) and Catalyst pushes
  * filters/projections down into the scan.
  */
object Tables {
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, sfDir: String): DataFrame    = t(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame    = t(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame  = t(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame  = t(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame      = t(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame    = t(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame  = t(spark, sfDir, "lineitem")
  /** `events.ts` has shipped as either parquet TIMESTAMP(NANOS) or
    * TIMESTAMP(MICROS) across testdata generations. Spark's vectorized
    * reader rejects NANOS outright, so the nanos generation is read as
    * a long (legacy conf) and converted; the micros generation arrives
    * as a real timestamp already. Branch on the arriving type instead
    * of assuming a generation — the conversion is exact either way
    * (the nanos data is micros-aligned; DuckDB's TIMESTAMP cast
    * agrees).
    *
    * The `spark.sql.legacy.parquet.nanosAsLong` conf that unlocks the
    * nanos generation is set by the HARNESS sessions (Verify / Bench /
    * Explain / the test spec), never here: a library table reader must
    * not flip session-global semantics under a co-tenant (their own
    * nanos parquet would silently start arriving as longs). On a
    * session without the flag, nanos-generation data fails loudly at
    * the scan — the correct failure mode for an un-opted-in session.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = t(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ =>
        // micros arrives as TIMESTAMP_NTZ; cast to the session-local
        // TIMESTAMP every downstream query has always seen (session
        // TZ is pinned UTC, so the instant is unchanged)
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "embeddings")
}

/** Deterministic scratch directories for catalogue queries that must
  * MATERIALIZE a layout to demonstrate an end-to-end path (q69's
  * staged-write round-trip, q76's hive-partitioned DPP fact). A fresh
  * `createTempDirectory` per construction accumulated one full copy
  * per run (bench constructs every query at least twice); a
  * deterministic per-(label, sfDir) path + `mode("overwrite")` bounds
  * disk to ONE live copy per fixture. Single-process use (Verify /
  * Bench / tests) — two sessions writing the same sfDir concurrently
  * would race, which no harness does.
  */
object WorkDirs {
  def path(label: String, sfDir: String): String = {
    val root = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_work",
      s"${label}_${java.lang.Integer.toHexString(sfDir.hashCode)}")
    java.nio.file.Files.createDirectories(root.getParent)
    root.toString
  }

  /** Per-PROCESS scratch root, for queries whose ORACLE SQL must name
    * the same staged files the engine wrote (q86): the oracle string
    * and the query fn are built in the same JVM, so a pid-suffixed
    * path is deterministic within one process while two concurrent
    * harness processes (bench + Verify) can never delete each other's
    * files mid-read — the round-9 race class. LIVE siblings are never
    * touched (that would reintroduce the race this exists to retire);
    * roots left by DEAD pids are swept best-effort on first use per
    * JVM, so /tmp does not grow without bound across JVM generations.
    * Liveness is checked via ProcessHandle.of(pid): a reused pid makes
    * the sweep skip a genuinely-dead dir (conservative — it stays a
    * few KB until a later generation), never delete a live one. */
  def processScoped(label: String): String = {
    val root = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_work",
      s"${label}_p${ProcessHandle.current().pid()}")
    java.nio.file.Files.createDirectories(root.getParent)
    sweepDeadPidRoots(root.getParent)
    root.toString
  }

  private val sweptOnce = new java.util.concurrent.atomic.AtomicBoolean(false)
  private val PidDir = """.*_p(\d+)""".r

  /** Best-effort, once per JVM: delete sibling `<label>_p<pid>` dirs
    * whose pid is no longer alive. Every step tolerates concurrent
    * deletion by another sweeping JVM (failures are swallowed — the
    * next generation retries). The catches are NonFatal, not just
    * IOException: Files.walk/list traversal surfaces vanished entries
    * as UncheckedIOException (a RuntimeException), and an overlong
    * digit suffix makes pid.toLong throw NumberFormatException — two
    * concurrently-starting JVMs sweeping the same root (the exact
    * bench+Verify case this code targets) must not crash a live
    * process inside processScoped. */
  private def sweepDeadPidRoots(parent: java.nio.file.Path): Unit = {
    if (!sweptOnce.compareAndSet(false, true)) return
    val self = ProcessHandle.current().pid()
    def deadPid(pid: String): Boolean =
      try pid.toLong != self && !ProcessHandle.of(pid.toLong).isPresent
      catch { case scala.util.control.NonFatal(_) => false }
    try {
      val entries = java.nio.file.Files.list(parent)
      try {
        entries.iterator().forEachRemaining { p =>
          p.getFileName.toString match {
            case PidDir(pid) if deadPid(pid) =>
              try {
                val walk = java.nio.file.Files.walk(p)
                try walk.sorted(java.util.Comparator.reverseOrder())
                  .forEach { f =>
                    try java.nio.file.Files.deleteIfExists(f)
                    catch { case scala.util.control.NonFatal(_) => () }
                  }
                finally walk.close()
              } catch { case scala.util.control.NonFatal(_) => () }
            case _ => ()
          }
        }
      } finally entries.close()
    } catch { case scala.util.control.NonFatal(_) => () }
  }
}

/** One catalogue entry: a named query plus (optionally) its DuckDB
  * oracle SQL twin. Column names/types must match the oracle exactly —
  * the driver sorts columns by name and hash-compares values.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
