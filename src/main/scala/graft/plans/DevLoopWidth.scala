package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: A/B the iterative graph loops' round width — runs g01's
  * operator chain under different spark.sql.shuffle.partitions values
  * on the same local[32] session (r21; guide §2.2 "size shuffle
  * partitions to the data"). */
object DevLoopWidth {
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
    val sfDir = "/root/testdata/sf0.1"
    // warm-up
    graft.SparkEntry.queries("g01_pagerank")(spark, sfDir).count()
    for (w <- Seq(32, 8, 4, 1, 32, 8, 4, 1)) {
      graft.Caches.releaseAll(); spark.catalog.clearCache()
      spark.conf.set("spark.sql.shuffle.partitions", w.toString)
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("g01_pagerank")(spark, sfDir).count()
      val t1 = System.nanoTime()
      graft.Caches.releaseAll(); spark.catalog.clearCache()
      val t2 = System.nanoTime()
      val n2 = graft.SparkEntry.queries("g05_pagerank_weighted")(spark, sfDir).count()
      val t3 = System.nanoTime()
      println(f"width $w%2d: g01 ${(t1 - t0) / 1e9}%.2f s ($n rows), g05 ${(t3 - t2) / 1e9}%.2f s ($n2 rows)")
    }
    spark.stop()
  }
}
