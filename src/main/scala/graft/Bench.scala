package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** CPU-health calibration emitted with every bench line: single-
    * thread vs n-way parallel spin. Hypervisor throttle windows
    * (r5/r6 NOTES: 5.7-11.6 effective cores on a 16-cpu container,
    * identical code, up to 25x warm-query slowdowns) otherwise read
    * as engine regressions — the ratio makes a throttled measurement
    * self-documenting and normalizable. */
  private def effectiveCores(n: Int): Double = {
    def spin(): Long = {
      var x = 0L; var i = 0
      while (i < 30000000) { x += i.toLong * i; i += 1 }
      x
    }
    spin() // JIT warm-up
    val t1 = System.nanoTime(); spin()
    val single = System.nanoTime() - t1
    val threads = (1 to n).map(_ => new Thread(new Runnable {
      def run(): Unit = { spin(); () }
    }))
    val t2 = System.nanoTime()
    threads.foreach(_.start()); threads.foreach(_.join())
    val par = System.nanoTime() - t2
    math.rint(10.0 * n * single / par) / 10.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warm-up actions so the first measured queries don't
    // absorb JVM/codegen/scan-index startup (~5s) — measurement
    // hygiene only, identical output contract. Warm-ups run at
    // sf0.001 (never the bench scale factor) and touch the four scan
    // families: relational joins (entry), text kernels, embeddings,
    // events.
    try {
      SparkEntry.entry(spark).count()
      SparkEntry.queries("t63_fingerprint")(spark, "/root/testdata/sf0.001").count()
      SparkEntry.queries("d48_minhash_agg")(spark, "/root/testdata/sf0.001").count()
      SparkEntry.queries("s51_knn_ivf")(spark, "/root/testdata/sf0.001").count()
      // events family: nanos-timestamp read path + JSON-path and
      // timestamp-parse JIT (the enforce/window queries' hot kernels)
      SparkEntry.queries("q30_enforce_ok")(spark, "/root/testdata/sf0.001").count()
    } catch { case _: Throwable => () }
    // failures must be VISIBLE: a silently-swallowed exception records
    // time-until-crash as an ordinary timing, and a whole-catalogue
    // regression would read as a performance win
    val failed = scala.collection.mutable.ArrayBuffer[String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // isolation: several operators persist intra-query frames (their
      // scaladoc cache contract); across 89 queries in ONE session the
      // accumulated MEMORY_AND_DISK copies crowd the 8g heap and the
      // later heavy queries pay eviction + GC instead of compute.
      // Clearing BETWEEN queries keeps each measurement self-contained
      // (every query builds its own caches from a cold catalog).
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case e: Throwable =>
        failed += name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // name-sorted key order: stable, diffable across rounds
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val health = effectiveCores(cpus.toInt)
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"effective_cores":$health,"sf":"$sfDir"}"""
    println(line)
    // stdout tails get truncated in driver logs (r4 lost 41 of 104
    // per-query timings) — persist the full line for round-over-round
    // diffing
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_FULL.json"), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
