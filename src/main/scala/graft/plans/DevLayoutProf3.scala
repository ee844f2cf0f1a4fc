package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: A/B the local file:// scheme's ChecksumFileSystem CRC
  * sidecars against RawLocalFileSystem on the 256-dir
  * dynamic-partition write floor (r21). Two sessions in one JVM —
  * the fs.file.impl choice is a Hadoop-conf setting read at
  * FileSystem.get, cached per (scheme, conf), so each session sees
  * its own. */
object DevLayoutProf3 {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("false").toBoolean
    def run(raw: Boolean): Unit = {
      val b = SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "1024")
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      val spark = (if (raw)
        b.config("spark.hadoop.fs.file.impl",
          "org.apache.hadoop.fs.RawLocalFileSystem")
      else b).getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val emb = graft.engine.Tables.embeddings(spark, "/root/testdata/sf0.1")
      val pre = emb.select(col("vec_id"), col("embedding"),
        (col("vec_id") % 256).as("cell"))
      val base = java.nio.file.Files.createTempDirectory(
        s"dev_layout3_$raw").toString
      pre.count()
      def time(name: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime()
        f
        println(f"[raw=$raw] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      // warm
      pre.repartition(32, col("cell")).write.mode("overwrite")
        .partitionBy("cell").parquet(s"$base/warm")
      for (i <- 1 to 3)
        time(s"256 partition dirs #$i") {
          pre.repartition(32, col("cell")).write.mode("overwrite")
            .partitionBy("cell").parquet(s"$base/a$i")
        }
      for (i <- 1 to 2)
        time(s"256 plain files #$i") {
          pre.repartition(256).write.mode("overwrite").parquet(s"$base/b$i")
        }
      // count sidecar files to prove what the FS wrote
      val n = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$base/a1"))
        .filter(p => p.getFileName.toString.endsWith(".crc")).count()
      println(s"[raw=$raw] crc sidecars in a1: $n")
      spark.stop()
    }
    run(raw = which)
  }
}
