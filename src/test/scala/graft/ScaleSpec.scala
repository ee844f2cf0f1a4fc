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
