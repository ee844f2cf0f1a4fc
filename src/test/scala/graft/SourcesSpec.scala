package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.sources.StagedJson

/** DSv2 staged-json source: schema, partition-column recovery,
  * source-side pruning (fewer planned partitions under an equality
  * filter), and content-column laziness. */
class SourcesSpec extends SparkSpec {

  private def write(root: Path, rel: String, content: String): Unit = {
    val p = root.resolve(rel)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
  }

  private lazy val root: String = {
    val r = Files.createTempDirectory("graft_dsv2")
    write(r, "season_2023/league_153/teams/run_1.json", """[{"team_key": "1"}]""")
    write(r, "season_2023/league_153/standings/run_1.json", """[{"team_id": "1"}]""")
    write(r, "season_2023/league_39/teams/run_1.json", """{"response": []}""")
    write(r, "season_2022/league_153/teams/run_1.json", """[{"team_key": "9"}]""")
    r.toString
  }

  test("reads the staged layout as a table with recovered partition columns") {
    val df = spark.read.format("staged-json").load(root)
    val rows = df.select("season", "league", "endpoint", "pk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSet
    assert(rows == Set(
      (2023L, 153L, "teams", "2023-153"),
      (2023L, 153L, "standings", "2023-153"),
      (2023L, 39L, "teams", "2023-39"),
      (2022L, 153L, "teams", "2022-153")))
  }

  test("equality filters on partition columns prune at planning time") {
    val df = spark.read.format("staged-json").load(root)
      .filter(col("season") === 2023 && col("league") === 153)
    assert(df.count() == 2)
    // the scan planned ONLY the 2 matching files (4 staged in total)
    assert(StagedJson.lastPlannedPartitions.get() == 2,
      s"planned ${StagedJson.lastPlannedPartitions.get()} partitions")
  }

  test("the directory WALK itself is pruned, not just the file list") {
    // level-1 predicate admits only league_153: league_39's directory
    // is never descended into (object-store listing is the real cost)
    val files = StagedJson.listFiles(root,
      dirOk = (level, name) => level != 1 || name == "league_153",
      keepNonConforming = false)
    assert(files.size == 3)
    assert(files.forall(_.contains("/league_153/")), files.mkString(","))
  }

  test("content is read only when required; payload reaches spark.read.json downstream") {
    // metadata-only projection: file bytes never read (content pruned)
    val meta = spark.read.format("staged-json").load(root)
      .groupBy("endpoint").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(meta == Map("teams" -> 3L, "standings" -> 1L))
    // full read: content flows into a JSON parse
    val teams = spark.read.format("staged-json").load(root)
      .filter(col("endpoint") === "teams" && col("season") === 2023 && col("league") === 153)
      .select(col("pk"), col("content"))
    val parsed = teams.select(col("pk"),
        from_json(col("content"),
          org.apache.spark.sql.types.DataType.fromDDL("array<struct<team_key:string>>")).as("t"))
      .select(col("pk"), explode(col("t")).as("row"))
      .select(col("pk"), col("row.team_key"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(parsed.toSeq == Seq(("2023-153", "1")))
  }
}
