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
    (1 to 20).foreach { i =>
      val t0 = System.nanoTime()
      pre.repartition(32, col("cell")).write.mode("overwrite")
        .partitionBy("cell").parquet(s"$base/w$i")
      println(f"write $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
