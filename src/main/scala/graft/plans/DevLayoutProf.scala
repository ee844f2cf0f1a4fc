package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only (never in a query path): isolates the IVF layout build's
  * per-stage costs — assignment kernel to a noop sink vs the
  * partitioned write vs a plain write — so per-task fixed overheads
  * are attributable (r21 profiling; guide §1.4). */
object DevLayoutProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "1024")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.engine.Tables.embeddings(spark, sfDir)
    val cents = emb.filter(col("vec_id") < 256)
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm-up
    emb.count(); cents.count()
    val base = java.nio.file.Files.createTempDirectory("dev_layout").toString
    time("full buildIvfLayout (first)") {
      graft.operators.Similarity.buildIvfLayout(emb, cents, s"$base/l1").count()
    }
    time("full buildIvfLayout (second)") {
      graft.operators.Similarity.buildIvfLayout(emb, cents, s"$base/l2").count()
    }
    // assignment only, noop sink, 32-way
    val cb = emb.sparkSession // placeholder to keep imports tidy
    time("assign-only noop 32-way") {
      val a = emb.repartition(32)
        .crossJoin(broadcast(cents.select(col("vec_id").cast("long").as("cid"), col("embedding").as("ce"))
          .agg(sort_array(collect_list(struct(col("cid"), col("ce")))).as("graft_cents"))))
        .select(col("vec_id"),
          graft.functions.CodebookKernels.codebookArgmax(col("embedding"), col("graft_cents")).as("best"))
      a.write.format("noop").mode("overwrite").save()
    }
    time("assign-only noop 32-way (second)") {
      val a = emb.repartition(32)
        .crossJoin(broadcast(cents.select(col("vec_id").cast("long").as("cid"), col("embedding").as("ce"))
          .agg(sort_array(collect_list(struct(col("cid"), col("ce")))).as("graft_cents"))))
        .select(col("vec_id"),
          graft.functions.CodebookKernels.codebookArgmax(col("embedding"), col("graft_cents")).as("best"))
      a.write.format("noop").mode("overwrite").save()
    }
    // plain write, no partitionBy, 32 tasks
    time("plain write 32 files no partitionBy") {
      emb.repartition(32).write.mode("overwrite").parquet(s"$base/plain")
    }
    // partitioned write of precomputed cells (no kernel): 32 tasks x ~8 cells
    val pre = emb.select(col("vec_id"), col("embedding"),
      (col("vec_id") % 256).as("cell"))
    time("partitionBy write precomputed cells 32 tasks") {
      pre.repartition(32, col("cell")).write.mode("overwrite")
        .partitionBy("cell").parquet(s"$base/pre")
    }
    time("partitionBy write precomputed cells 32 tasks (second)") {
      pre.repartition(32, col("cell")).write.mode("overwrite")
        .partitionBy("cell").parquet(s"$base/pre2")
    }
    time("partitionBy write uncompressed") {
      pre.repartition(32, col("cell")).write.mode("overwrite")
        .option("compression", "none")
        .partitionBy("cell").parquet(s"$base/pre3")
    }
    time("partitionBy write 256 tasks (1 file each)") {
      pre.repartition(256, col("cell")).write.mode("overwrite")
        .partitionBy("cell").parquet(s"$base/pre4")
    }
    time("partitionBy write 8 cells only (32 tasks)") {
      pre.withColumn("cell", col("cell") % 8)
        .repartition(32, col("cell")).write.mode("overwrite")
        .partitionBy("cell").parquet(s"$base/pre5")
    }
    time("partitionBy write small block.size") {
      pre.repartition(32, col("cell")).write.mode("overwrite")
        .option("parquet.block.size", (1 << 20).toString)
        .partitionBy("cell").parquet(s"$base/pre6")
    }
    spark.stop()
  }
}
