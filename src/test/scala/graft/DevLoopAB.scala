package graft

import org.apache.spark.sql.SparkSession

/** Dev-only A/B: iterative-loop join strategy (SMJ vs SHJ) and other
  * session-flag experiments over the graph catalogue queries. */
object DevLoopAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).getOrElse("g01_pagerank").split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(name: String): Double = {
      Caches.releaseAll(); spark.catalog.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n => run(n) } // warm
    for (pref <- Seq("true", "false"); rep <- 1 to 2) {
      spark.conf.set("spark.sql.join.preferSortMergeJoin", pref)
      names.foreach { n =>
        println(f"preferSMJ=$pref rep$rep $n%-24s ${run(n)}%.3f s")
      }
    }
    spark.stop()
  }
}
