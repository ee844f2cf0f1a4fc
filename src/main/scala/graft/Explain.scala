package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan and wall time for named
  * catalogue queries. Usage:
  *   runMain graft.Explain <sfDir> <queryName> [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // harness opt-in for the nanos-generation events parquet (see Tables.events)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // execution-time DPP even when exchange reuse misses under AQE
      // (the r18 q76 finding — see TestSpark / Scale.q76DppPrune)
      .config("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
      // r20 I/O configs — same pair as Bench, so dev plan/time reads
      // match what the bench session executes
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "1024")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      // r21: the default 100-entry codegen class cache thrashes on
      // this catalogue (q86 alone compiles ~155 classes — its second
      // run recompiled 107 of them; at 5000 entries: 24, and the
      // rerun wall dropped 4.6 → 3.2 s). Same value in Bench/Verify/
      // SparkSpec so dev plan/time reads match the bench session.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("GRAFT_CODEGEN_CACHE", "5000"))
      .getOrCreate()
    // dev knob: GRAFT_LOG_LEVEL=INFO surfaces DAGScheduler "Job took"
    // lines for per-job attribution between the ===== name ===== markers
    spark.sparkContext.setLogLevel(
      sys.env.getOrElse("GRAFT_LOG_LEVEL", "WARN"))
    names.foreach { name =>
      // time CONSTRUCTION + action together: iterative operators
      // (connected components) run their loop jobs eagerly while the
      // DataFrame is being built, which is exactly what Bench measures
      println(s"----- begin $name")
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val tBuild = (System.nanoTime() - t0) / 1e9
      println(s"===== $name =====")
      df.explain("formatted")
      val t1 = System.nanoTime()
      val n = df.count()
      println(f"$name: $n rows in ${(System.nanoTime() - t1) / 1e9 + tBuild}%.2f s (build $tBuild%.2f s)")
    }
    spark.stop()
  }
}
