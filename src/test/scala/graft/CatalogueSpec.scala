package graft

import graft.engine.Paths
import org.apache.spark.sql.functions._

/** Driver-contract integrity + smoke over sf0.001. */
class CatalogueSpec extends SparkSpec {
  import spark.implicits._

  test("entry (flagship) returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("catalogue names are unique and oracle keys are a subset") {
    val names = SparkEntry.catalogue.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("every query runs and is non-empty at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("extractPk matches the reference semantics incl. unknown fallback") {
    val df = Seq(
      "api/season_2023/league_39/teams/run_1.json",
      "api/season_2022/league_153/standings/run_2.json",
      "api/malformed/run.json").toDF("path")
    val pks = df.select(Paths.extractPk(col("path"))).as[String].collect().toSeq
    assert(pks == Seq("2023-39", "2022-153", "unknown"))
  }
}
