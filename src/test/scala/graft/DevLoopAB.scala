package graft

import org.apache.spark.sql.SparkSession

/** Dev-only A/B: iterative-loop join strategy (SHJ hints vs planner
  * default) over the graph catalogue queries, via the
  * `graft.dev.loopJoinHint` knob (a conf like preferSortMergeJoin
  * cannot toggle EXPLICIT hints — hints win over it). Each timing
  * prints its own n-way parallel spin probe so a throttled window is
  * visible in the record (the r11 lesson: absolute claims from
  * unprobed measurements are garbage). Also measures the
  * final-round-as-pure-plan two-action cost (the documented
  * single-action contract). */
object DevLoopAB {
  @volatile private var sink: Long = 0L
  // Bench's probe, not a copy: the two drifted once (identical code
  // duplicated here) and a re-tuned spin would have made Bench and
  // DevLoopAB probe readings silently incomparable
  private def parProbeMs(n: Int): Double = Bench.parProbeMs(n)

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
    sink ^= parProbeMs(cpus.toInt).toLong // JIT/thread warm-up
    def run(name: String): (Double, Double) = {
      Caches.releaseAll(); spark.catalog.clearCache()
      val probe = parProbeMs(cpus.toInt)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      ((System.nanoTime() - t0) / 1e9, probe)
    }
    names.foreach { n => run(n) } // warm
    // interleaved arms so both share any ambient window
    for (rep <- 1 to 3; hint <- Seq("shuffle_hash", "")) {
      spark.conf.set("graft.dev.loopJoinHint", hint)
      names.foreach { n =>
        val (dt, probe) = run(n)
        val arm = if (hint.isEmpty) "planner-default" else s"hint=$hint"
        println(f"rep$rep $arm%-17s $n%-24s $dt%.3f s  par_probe=${probe}%.1f ms")
      }
    }
    spark.conf.set("graft.dev.loopJoinHint", "shuffle_hash")
    // two-action cost: the final round is a pure plan — a second
    // action on the SAME result re-executes it (the single-action
    // contract in Graph's scaladoc)
    names.headOption.foreach { n =>
      Caches.releaseAll(); spark.catalog.clearCache()
      val df = SparkEntry.queries(n)(spark, sfDir)
      val p1 = parProbeMs(cpus.toInt)
      val t1 = System.nanoTime(); df.count()
      val a1 = (System.nanoTime() - t1) / 1e9
      val p2 = parProbeMs(cpus.toInt)
      val t2 = System.nanoTime(); df.count()
      val a2 = (System.nanoTime() - t2) / 1e9
      println(f"two-action $n: first=$a1%.3f s (probe $p1%.1f ms)  " +
        f"second=$a2%.3f s (probe $p2%.1f ms) — second re-pays the final round")
    }
    spark.stop()
  }
}
