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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read it as a long (legacy conf) and convert to a
    * micros timestamp. The driver data is micros-aligned so no
    * precision is lost (DuckDB's TIMESTAMP cast agrees).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, sfDir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "embeddings")
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
