package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only A/B of co-occurrence edge-build strategies (test scope). */
object DevEdgeAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_suppkey"))

    def time(label: String)(f: => Long): Unit = {
      // warm-up + 3 reps
      f
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f; val dt = (System.nanoTime() - t0) / 1e9
        (dt, n)
      }
      println(f"$label%-28s min=${reps.map(_._1).min}%.3f s  rows=${reps.head._2}")
    }

    def joinBuild(): DataFrame = {
      val l2 = li.select(col("l_orderkey"), col("l_suppkey").as("s2"))
      li.join(l2, "l_orderkey")
        .filter(col("l_suppkey") =!= col("s2"))
        .select(col("l_suppkey").as("src"), col("s2").as("dst"))
    }
    def setBuild(): DataFrame = {
      li.groupBy(col("l_orderkey"))
        .agg(collect_set(col("l_suppkey")).as("ss"))
        .select(explode(col("ss")).as("src"), col("ss"))
        .select(col("src"), explode(col("ss")).as("dst"))
        .filter(col("src") =!= col("dst"))
    }

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("join+repart+distinct AQE0") {
      joinBuild().repartition(col("src")).distinct().count()
    }
    time("set+repart+distinct AQE0") {
      setBuild().repartition(col("src")).distinct().count()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    time("join+repart+distinct AQE1") {
      joinBuild().repartition(col("src")).distinct().count()
    }
    time("set+repart+distinct AQE1") {
      setBuild().repartition(col("src")).distinct().count()
    }
    // how much is the scan-side parallelism worth?
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("join w/ pre-repart scan") {
      val base = li.repartition(32)
      val l2 = base.select(col("l_orderkey"), col("l_suppkey").as("s2"))
      base.join(l2, "l_orderkey")
        .filter(col("l_suppkey") =!= col("s2"))
        .select(col("l_suppkey").as("src"), col("s2").as("dst"))
        .repartition(col("src")).distinct().count()
    }
    // g10 bipartite: current (distinct + self-join) vs collect_set
    def liPS = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_partkey").cast("long").as("l"), col("l_suppkey").cast("long").as("r"))
    for (aqe <- Seq(false, true)) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      time(s"bip join build AQE=$aqe") {
        val m = liPS.distinct()
        val m2 = m.select(col("l"), col("r").as("r2"))
        m.join(m2, "l").filter(col("r") < col("r2"))
          .groupBy(col("r"), col("r2")).agg(count(lit(1)).as("weight")).count()
      }
      time(s"bip set build AQE=$aqe") {
        liPS.groupBy(col("l")).agg(collect_set(col("r")).as("ss"))
          .select(explode(col("ss")).as("r"), col("ss"))
          .select(col("r"), explode(col("ss")).as("r2"))
          .filter(col("r") < col("r2"))
          .groupBy(col("r"), col("r2")).agg(count(lit(1)).as("weight")).count()
      }
      time(s"bip sorted-set build AQE=$aqe") {
        // sort the set once, emit only ordered pairs via index nesting
        liPS.groupBy(col("l")).agg(sort_array(collect_set(col("r"))).as("ss"))
          .select(posexplode(col("ss")).as(Seq("i", "r")), col("ss"))
          .select(col("r"), explode(slice(col("ss"), col("i") + 2,
            greatest(size(col("ss")) - col("i") - 1, lit(0)))).as("r2"))
          .groupBy(col("r"), col("r2")).agg(count(lit(1)).as("weight")).count()
      }
    }
    spark.stop()
  }
}
