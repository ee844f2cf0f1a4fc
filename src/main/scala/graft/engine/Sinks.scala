package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sinks — SURVEY.md §2.2.
  *
  * K1: the reference writes each run with WRITE_TRUNCATE (full-replace
  * idempotency, `pipeline.py:47-55`, SCHEMA.md:51) to a per-source
  * table → `SaveMode.Overwrite` parquet, one subdir per api source.
  *
  * K2: failed groups go to a single-shard JSON-lines dead-letter file
  * (`pipeline.py:57-63`).
  *
  * Scale: the unified sink optionally partitions by a low-cardinality
  * key (e.g. season) so downstream reads prune partitions; the
  * dead-letter coalesce(1) mirrors the reference's num_shards=1 and is
  * safe because dead letters are a trickle — never coalesce the main
  * output.
  */
object Sinks {

  /** K1 — WRITE_TRUNCATE ≡ overwrite; `update_timestamp` defaulted at
    * the sink (ref v1.json's CURRENT_TIMESTAMP() column default). */
  def writeUnified(df: DataFrame, outDir: String, apiName: String,
      partitionBySeason: Boolean = false): Unit = {
    val stamped = df.withColumn("update_timestamp",
      coalesce(col("update_timestamp"), current_timestamp()))
    val w = stamped.write.mode("overwrite")
    (if (partitionBySeason) w.partitionBy("season") else w)
      .parquet(s"$outDir/teams_$apiName")
  }

  /** K2 — dead-letter JSON-lines, single shard (ref num_shards=1). */
  def writeDeadLetter(dead: DataFrame, pkCol: String, deadLetterDir: String): Unit =
    Enforce.deadLetterJson(dead, pkCol)
      .coalesce(1)
      .write.mode("overwrite")
      .text(deadLetterDir)
}
