package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only profiling harness (test scope, never shipped): runs the
  * named catalogue queries twice (cold + warm) against a sf dir and
  * prints per-job wall time + stage task-time for the WARM run, so a
  * query's cost decomposes into its actual Spark jobs. Usage:
  *   Test/runMain graft.DevProfileG <sfDir> <q1,q2,...>
  */
object DevProfileG {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var jobs = List.empty[(Int, Long, Long, String)] // id, start, end, desc
    val descs = scala.collection.concurrent.TrieMap[Int, String]()
    val stageTask = scala.collection.concurrent.TrieMap[Int, (Long, Int, String)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val d = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties).flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        descs(js.jobId) = d
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = ()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stageTask(si.stageId) = (
          si.taskMetrics.executorRunTime,
          si.numTasks, si.name.takeWhile(_ != '\n').take(80))
      }
    }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // cold run
      Caches.releaseAll(); spark.catalog.clearCache()
      val t0 = System.nanoTime(); fn(spark, sfDir).count()
      val cold = (System.nanoTime() - t0) / 1e9
      // warm run, instrumented
      Caches.releaseAll(); spark.catalog.clearCache()
      stageTask.clear(); descs.clear()
      spark.sparkContext.addSparkListener(listener)
      val jobTimes = scala.collection.mutable.ArrayBuffer[(Int, Double)]()
      val l2 = new SparkListener {
        val starts = scala.collection.concurrent.TrieMap[Int, Long]()
        override def onJobStart(js: SparkListenerJobStart): Unit =
          starts(js.jobId) = System.nanoTime()
        override def onJobEnd(je: SparkListenerJobEnd): Unit =
          starts.get(je.jobId).foreach(s =>
            jobTimes.synchronized { jobTimes += je.jobId -> (System.nanoTime() - s) / 1e9 })
      }
      spark.sparkContext.addSparkListener(l2)
      val t1 = System.nanoTime(); fn(spark, sfDir).count()
      val warm = (System.nanoTime() - t1) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      spark.sparkContext.removeSparkListener(l2)
      println(f"== $name cold=$cold%.2f warm=$warm%.2f")
      jobTimes.sortBy(_._1).foreach { case (id, s) =>
        println(f"  job $id%3d $s%6.3f s  ${descs.getOrElse(id, "").take(100)}")
      }
      println("  top stages by executor task-time:")
      stageTask.toSeq.sortBy(-_._2._1).take(12).foreach { case (sid, (rt, nt, nm)) =>
        println(f"    stage $sid%4d ${rt / 1e3}%7.2f cpu-s  $nt%3d tasks  $nm")
      }
    }
    spark.stop()
  }
}
