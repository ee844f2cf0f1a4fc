package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering for scan
  * pruning. Sorting 100 TB by one column gives perfect min/max
  * pruning on that column and none on any other; interleaving the
  * bits of two keys (Morton / Z-order code) and range-partitioning by
  * the code clusters rows so parquet row-group min/max stats stay
  * tight on BOTH dimensions — the standard lakehouse OPTIMIZE ZORDER
  * layout, expressed as plain deterministic integer arithmetic.
  */
object Layout {

  /** Bits interleaved per dimension (16 → a 32-bit code from two
    * dimensions). Keys are taken modulo 2^16: Z-ordering is a
    * LOCALITY transform, not an identity — collisions across the
    * modulus only loosen pruning, never correctness. */
  val MortonBits = 16

  /** 32-bit Morton code of two non-negative integer columns:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1.
    * Spelled as a fixed sum of shift/mask terms — codegen-friendly,
    * no UDF, and emitted identically for the DuckDB oracle by
    * `mortonSql` (same Scala loop builds both). */
  def morton(a: Column, b: Column): Column = {
    val aa = pmod(a.cast("long"), lit(1L << MortonBits))
    val bb = pmod(b.cast("long"), lit(1L << MortonBits))
    (0 until MortonBits).map { i =>
      (shiftright(aa, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(bb, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)
  }

  /** DuckDB twin of `morton` over two SQL expressions — generated from
    * the same loop so the formulas cannot drift. */
  def mortonSql(a: String, b: String): String = {
    val m = 1L << MortonBits
    val aa = s"((($a) % $m + $m) % $m)"
    val bb = s"((($b) % $m + $m) % $m)"
    (0 until MortonBits).map { i =>
      s"((($aa >> $i) & 1) * ${1L << (2 * i)} + (($bb >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString("(", " + ", ")")
  }

  /** Z-order layout: range-partition by the Morton code and sort
    * within partitions — the write-side clustering step (follow with
    * `.write.parquet`). Both dimensions then prune via row-group
    * min/max stats. */
  def zorderBy(df: DataFrame, a: Column, b: Column): DataFrame = {
    // withColumn would silently REPLACE a caller's graft_z and drop()
    // would then delete it — refuse instead of corrupting the schema
    require(!df.columns.contains("graft_z"),
      "input already has a column named graft_z")
    df.withColumn("graft_z", morton(a, b))
      .repartitionByRange(col("graft_z"))
      .sortWithinPartitions(col("graft_z"))
      .drop("graft_z")
  }

  /** Small-files-safe write: AQE REBALANCE coalesces tiny post-shuffle
    * partitions and splits skewed ones to the advisory size, so the
    * table lands in ~`advisoryBytes` files regardless of upstream
    * partitioning — the standing fix for the small-files problem (a
    * 100 TB table written from 100k tiny tasks is unreadable-many
    * files; one written from a skewed join has multi-GB stragglers).
    * The advisory conf is scoped to this write and restored after. */
  def writeSized(df: DataFrame, path: String, advisoryBytes: Long): Unit = {
    require(advisoryBytes > 0, s"advisoryBytes must be positive, got $advisoryBytes")
    val spark = df.sparkSession
    val key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, advisoryBytes.toString)
    try df.hint("REBALANCE").write.mode("overwrite").parquet(path)
    finally old.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  /** Bucketed write: hash-bucket + sort the table by its join key at
    * WRITE time, so every later equi-join/aggregation on that key is
    * exchange-free — the shuffle is paid once per table lifetime, not
    * once per query. The 100 TB pattern for fact⋈fact joins where
    * neither side broadcasts: bucket both sides into the SAME bucket
    * count on the join key and the sort-merge join reads co-located
    * buckets directly (PlanAuditSpec pins the no-Exchange plan).
    *
    * Spark-native bucketing requires the catalog (`saveAsTable`) —
    * plain `.parquet(path)` writes carry no bucket metadata. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    require(buckets >= 1, s"buckets must be positive, got $buckets")
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }
}
