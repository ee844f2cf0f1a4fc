package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Scale-mechanics tests: salting preserves join semantics; bucketed
  * tables co-locate joins (no exchange on the join key). */
class ScaleSpec extends SparkSpec {

  test("salted join returns exactly the unsalted join's result") {
    val li = graft.engine.Tables.lineitem(spark, sfDir)
    val o = graft.engine.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), o,
        key = "o_orderkey", rowTag = col("l_linenumber") + col("l_partkey"),
        saltFactor = 7)
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("interval join never plans a cartesian/broadcast-nested-loop product") {
    val ev = graft.engine.Tables.events(spark, sfDir)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("p_ts"))
    val joined = graft.operators.Interval.joinLookback(errors, purchases,
      col("user_id"), col("p_user"), col("ts"), col("p_ts"),
      Seq("error_id"), Seq("purchase_id"), w = 1800L)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"range join must stay an equi-join on (key, bucket):\n$plan")
    // the naive BETWEEN formulation, by contrast, has no equi-keys;
    // full result-set equality, not just counts
    val naive = errors.join(purchases,
      col("user_id") === col("p_user") &&
        col("p_ts") >= col("ts") - expr("INTERVAL 30 MINUTES") && col("p_ts") <= col("ts"))
      .select(col("error_id"), col("purchase_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketized = joined.select(col("error_id"), col("purchase_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketized == naive && naive.nonEmpty)
  }

  test("interval join: bucket probe covers the window across the epoch (negative timestamps)") {
    // the bucket ids use truncating `div`, whose buckets around zero
    // differ from floor division (bucket 0 spans (-w, w)) — the
    // two-bucket probe {trunc(lt/w), trunc(lt/w)-1} must still cover
    // every rt in [lt-w, lt] for all sign combinations; randomized
    // pre/post-epoch micros vs the naive BETWEEN formulation
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    val wSec = 60L
    val span = 5 * wSec * 1000000L // ±5 windows around the epoch
    val lrows = (1 to 300).map { i =>
      (i.toLong, rnd.nextInt(6).toLong, rnd.nextLong() % span)
    }
    val rrows = (1 to 300).map { i =>
      (1000L + i, rnd.nextInt(6).toLong, rnd.nextLong() % span)
    }
    val l = lrows.toDF("lid", "k", "us")
      .select(col("lid"), col("k"), expr("timestamp_micros(us)").as("lt"))
    val r = rrows.toDF("rid", "rk", "rus")
      .select(col("rid"), col("rk"), expr("timestamp_micros(rus)").as("rt"))
    val bucketized = graft.operators.Interval.joinLookback(l, r,
        col("k"), col("rk"), col("lt"), col("rt"),
        Seq("lid"), Seq("rid"), w = wSec)
      .select(col("lid"), col("rid"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val naive = l.join(r,
        col("k") === col("rk") &&
          unix_micros(col("rt")) >= unix_micros(col("lt")) - wSec * 1000000L &&
          unix_micros(col("rt")) <= unix_micros(col("lt")))
      .select(col("lid"), col("rid"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(bucketized == naive && naive.nonEmpty,
      s"missing=${(naive -- bucketized).take(3)} extra=${(bucketized -- naive).take(3)}")
  }

  test("bloom prune filters fact rows before the shuffle, result exact") {
    val li = graft.engine.Tables.lineitem(spark, sfDir)
    val hot = graft.engine.Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 400000)
      .select(col("o_orderkey").as("dim_key"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val pruned = graft.operators.BloomPrune.prunedJoin(
        li, hot, col("l_orderkey"), col("dim_key"), expectedDimKeys = 100000L)
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("bloom_might_contain"),
        s"expected the bloom pre-filter in the plan:\n$plan")
      val exact = li.join(hot, col("l_orderkey") === col("dim_key")).count()
      assert(pruned.count() == exact)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("typed top-k aggregator runs map-side partials (exchange carries k rows/group)") {
    val li = graft.engine.Tables.lineitem(spark, sfDir)
    val agg = li.groupBy(col("l_returnflag"))
      .agg(graft.functions.TopKAgg.topK(3)(
        col("l_extendedprice").cast("double"), col("l_orderkey")).as("top"))
    val plan = agg.queryExecution.executedPlan.toString
    // partial aggregation below the exchange is the whole point:
    // each map task contributes <= k rows per group to the shuffle
    // (plan prints top-down, so the partial appears after the Exchange)
    val partialIdx = plan.toLowerCase.indexOf("partial_topkbyvalue")
    assert(partialIdx > plan.indexOf("Exchange") && plan.indexOf("Exchange") > 0,
      s"expected a partial top-k below the exchange:\n$plan")
    // and the aggregator agrees with the window formulation
    val viaWindow = li
      .withColumn("r", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("l_returnflag"))
          .orderBy(col("l_extendedprice").cast("double").desc, col("l_orderkey"))))
      .filter(col("r") <= 3)
      .select(col("l_returnflag"), col("l_orderkey"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val viaAgg = agg.select(col("l_returnflag"), explode(col("top")).as("t"))
      .select(col("l_returnflag"), col("t._2"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(viaAgg == viaWindow)
  }

  test("AQE splits a skewed join partition at runtime (the automatic sibling of salting)") {
    import spark.implicits._
    // one hot key carrying ~all rows + a long tail
    val hot = (1 to 200000).map(i => (7L, i.toLong)) ++ (1 to 200).map(i => (i.toLong + 100, i.toLong))
    val big = hot.toDF("k", "v").repartition(8)
    val small = (1 to 300).map(i => (i.toLong, s"dim_$i")).toDF("k", "name")
    val saved = Map(
      "spark.sql.adaptive.enabled" -> spark.conf.get("spark.sql.adaptive.enabled"),
      "spark.sql.autoBroadcastJoinThreshold" -> spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.shuffle.partitions" -> spark.conf.get("spark.sql.shuffle.partitions"))
    // skew-splitting needs multiple shuffle partitions to exist at all
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ so skew handling engages
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    try {
      val joined = big.join(small, "k")
      // collect() executes THIS QueryExecution, so the adaptive plan
      // below is the final (re-optimized) one — count() would execute
      // a separate plan and leave this one unfinalized
      assert(joined.collect().length == 200000 + 200)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the skewed join:\n${plan.take(2000)}")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("q83 null discipline: null-value/null-ts rows drop before the rolling window") {
    import spark.implicits._
    // e2 (null value) and e3 (null ts) must NOT appear and must not
    // occupy window slots — unfiltered, Spark's collect_list would
    // skip e2's null cent while a DuckDB list() keeps it (diverging
    // n_window), and null ts would order at opposite ends across
    // engines (the t98/t99 null-asymmetry class).
    val ev = Seq(
      (1L, 1L, Option(1L), Option(1.00)),
      (1L, 2L, Option(2L), Option.empty[Double]),
      (1L, 3L, Option.empty[Long], Option(3.00)),
      (1L, 4L, Option(4L), Option(2.00)))
      .toDF("user_id", "event_id", "ts", "value")
    val out = graft.queries.Scale.rollingMedian5(ev)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(1L -> (1L, 100L), 4L -> (2L, 100L)))
  }

  test("q80 null discipline: null ts orders FIRST and a null type counts as one distinct type") {
    import spark.implicits._
    // Spark's ASC window default is NULLS FIRST — the oracle pins the
    // same explicitly; a DuckDB default (NULLS LAST) would put e4 at
    // the END of the trajectory instead
    val ev = Seq(
      (1L, 1L, Option(1L), Option("a")),
      (1L, 2L, Option(2L), Option.empty[String]),
      (1L, 3L, Option(3L), Option("a")),
      (1L, 4L, Option.empty[Long], Option("b")))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = graft.queries.Scale.runningDistinct(ev)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out == Map(4L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 3L))
  }

  test("q37 null discipline: null-order-date rows drop before the RANGE frame") {
    import spark.implicits._
    // a RANGE frame is defined over NON-NULL ordering keys only: a
    // null day_no row would sit in an engine-defined null peer group
    // (Spark and DuckDB place and frame it differently), so the null
    // o_orderdate row must neither appear nor contribute to any frame
    val orders = Seq(
      (1L, 10L, 100.0, Option("1990-01-05")),
      (1L, 11L, 50.0, Option.empty[String]),
      (1L, 12L, 30.0, Option("1990-01-20")))
      .toDF("o_custkey", "o_orderkey", "o_totalprice", "o_orderdate")
    val out = graft.queries.Windows.rangeFrame30d(orders)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    // order 12 is within 30 days of order 10 → 130; the null row gone
    assert(out == Map(10L -> 100.0, 12L -> 130.0), s"got $out")
  }

  test("q40 null discipline: null-ts events drop before sessionization") {
    import spark.implicits._
    // sessions are defined over TIMESTAMPED events only — a null ts
    // orders at opposite partition ends across engines in the oracle's
    // lag derivation, and session_window's null-key group is
    // engine-defined
    val ev = Seq(
      (1L, Option(java.sql.Timestamp.valueOf("2024-01-01 10:00:00")), Option(1.0)),
      (1L, Option(java.sql.Timestamp.valueOf("2024-01-01 10:10:00")), Option(2.0)),
      (1L, Option.empty[java.sql.Timestamp], Option(99.0)),
      (1L, Option(java.sql.Timestamp.valueOf("2024-01-01 12:00:00")), Option(4.0)))
      .toDF("user_id", "ts", "value")
    val out = graft.queries.Advanced.sessionAgg(ev)
      .collect().map(r => (r.getLong(3), r.getDouble(4)))
    // two sessions; the null-ts row's value (99.0) appears nowhere
    assert(out.toSet == Set((2L, 3.0), (1L, 4.0)), s"got ${out.toSeq}")
  }

  test("bucketed tables join without an exchange on the bucket key") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = graft.engine.Tables.lineitem(spark, sfDir)
      val o = graft.engine.Tables.orders(spark, sfDir)
      li.write.mode("overwrite")
        .option("path", s"$wh/li_b").bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
      o.write.mode("overwrite")
        .option("path", s"$wh/o_b").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("o_bucketed")
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      // co-located: the sort-merge join reads bucket files directly
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected no shuffle in bucketed join plan:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
