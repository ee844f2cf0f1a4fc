package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: loops the 256-dir dynamic-partition write so a thread
  * dump can catch where writer tasks spend their time (r21). */
object DevLayoutProf2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "1024")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.engine.Tables.embeddings(spark, "/root/testdata/sf0.1")
    val pre = emb.select(col("vec_id"), col("embedding"),
      (col("vec_id") % 256).as("cell"))
    val base = java.nio.file.Files.createTempDirectory("dev_layout2").toString
    pre.count()
    println(s"PID ${ProcessHandle.current().pid()}")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm
    pre.repartition(32, col("cell")).write.mode("overwrite")
      .partitionBy("cell").parquet(s"$base/warm")
    time("A 256 partition dirs (baseline)") {
      pre.repartition(32, col("cell")).write.mode("overwrite")
        .partitionBy("cell").parquet(s"$base/a")
    }
    time("B 256 PLAIN files, no partitionBy") {
      pre.repartition(256).write.mode("overwrite").parquet(s"$base/b")
    }
    time("C dirs, block 64k page 8k") {
      pre.repartition(32, col("cell")).write.mode("overwrite")
        .option("parquet.block.size", (64 * 1024).toString)
        .option("parquet.page.size", (8 * 1024).toString)
        .partitionBy("cell").parquet(s"$base/c")
    }
    time("D dirs, block 1m") {
      pre.repartition(32, col("cell")).write.mode("overwrite")
        .option("parquet.block.size", (1 << 20).toString)
        .partitionBy("cell").parquet(s"$base/d")
    }
    time("E dirs, maxConcurrentWriters") {
      pre.repartition(32, col("cell")).write.mode("overwrite")
        .option("maxRecordsPerFile", "0")
        .partitionBy("cell").parquet(s"$base/e")
    }
    time("A2 256 partition dirs (repeat)") {
      pre.repartition(32, col("cell")).write.mode("overwrite")
        .partitionBy("cell").parquet(s"$base/a2")
    }
    time("C2 dirs, block 64k page 8k (repeat)") {
      pre.repartition(32, col("cell")).write.mode("overwrite")
        .option("parquet.block.size", (64 * 1024).toString)
        .option("parquet.page.size", (8 * 1024).toString)
        .partitionBy("cell").parquet(s"$base/c2")
    }
    spark.stop()
  }
}
