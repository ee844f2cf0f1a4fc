package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-source normalizers: nested API-shaped JSON → the unified
  * team-season schema (SURVEY.md §2.3 P2-P8, §2.5 J1/J2; reference
  * `transforms.py:19-132`).
  *
  * Spark-first re-design of the reference's per-group DoFn: instead of
  * GroupByKey → python loop over each (season, league) group
  * (`pipeline.py:37-43`), every staged file is read into one
  * DataFrame, rows carry their group key (`pk`, recovered from the
  * file path — §2.3 P1), and the per-group build-dict/probe hash join
  * (`transforms.py:32-37,89-94`) becomes ONE distributed equi-join on
  * `(pk, team_id)`. Semantics are identical (probe misses drop = inner
  * join, ref P9) but the plan scales: at 100 TB the join shuffles by
  * key instead of materializing per-group dicts, and Catalyst
  * broadcasts the smaller side automatically (teams ≈ 20 rows/group).
  */
object Normalize {

  /** S3+S4: read one endpoint's staged JSON documents (top-level array
    * or object per file), tagging each row with its source path and
    * group pk. `multiLine` handles pretty-printed payloads; corrupt
    * documents surface in `_corrupt_record` rather than failing the
    * job (→ dead-letter, ref `transforms.py:167-169`). */
  def readStaged(spark: SparkSession, glob: String): DataFrame =
    spark.read
      .option("multiLine", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(glob)
      .withColumn("src_path", input_file_name())
      .withColumn("pk", Paths.extractPk(input_file_name()))

  private def l(c: Column): Column = c.cast("long")

  /** API-Football (ref `transforms.py:19-72`): flat string-typed
    * payloads; join standings⋈teams on team id within each pk group;
    * rank/points/played/W/D/L renames; GF/GA default 0 on missing
    * (P4); goal_difference computed (P5); season from the path pk
    * (P7). Both inputs must carry a `pk` column (from readStaged). */
  def apiFootball(teams: DataFrame, standings: DataFrame): DataFrame = {
    val t = teams.select(
      col("pk").as("t_pk"), col("team_key"),
      col("team_country").as("t_country"),
      col("venue.venue_name").as("t_venue_name"),
      col("venue.venue_city").as("t_venue_city"))
    val s = standings
    s.join(broadcast(t),
        s("pk") === t("t_pk") && s("team_id") === t("team_key"), "inner")
      .select(
        concat_ws("-", col("pk"), col("team_id")).as("pk"),
        col("team_id").cast("string").as("team_id"),
        col("team_name").cast("string").as("team_name"),
        col("t_country").cast("string").as("team_country"),
        col("league_id").cast("string").as("league_id"),
        col("league_name").cast("string").as("league_name"),
        l(element_at(split(col("pk"), "-"), 1)).as("season"),
        l(col("overall_league_position")).as("rank"),
        l(col("overall_league_PTS")).as("points"),
        l(col("overall_league_payed")).as("games_played"), // [sic] upstream field name
        l(col("overall_league_W")).as("wins"),
        l(col("overall_league_D")).as("draws"),
        l(col("overall_league_L")).as("losses"),
        coalesce(l(col("overall_league_GF")), lit(0L)).as("goals_for"),
        coalesce(l(col("overall_league_GA")), lit(0L)).as("goals_against"),
        (coalesce(l(col("overall_league_GF")), lit(0L)) -
          coalesce(l(col("overall_league_GA")), lit(0L))).as("goal_difference"),
        col("overall_league_form").cast("string").as("form"),
        col("t_venue_name").cast("string").as("venue_name"),
        col("t_venue_city").cast("string").as("venue_city"),
        lit(null).cast("timestamp").as("update_timestamp"),
        lit("1").as("schema_version"))
  }

  /** API-Sports (ref `transforms.py:75-126`): nested payloads. The
    * standings file's rows live at `response[0].league.standings[0]`
    * with a 1-row league header applied to every output row (the
    * reference's implicit cross-join to the header, §2.5 J2) — here
    * the header fields ride along the exploded rows, no join needed.
    * Teams wrap rows in a `response` array. */
  def apiSports(teamsRaw: DataFrame, standingsRaw: DataFrame): DataFrame = {
    val t = teamsRaw
      .select(col("pk").as("t_pk"), explode(col("response")).as("r"))
      .select(
        col("t_pk"),
        col("r.team.id").cast("long").as("t_team_id"),
        col("r.team.country").as("t_country"),
        col("r.venue.name").as("t_venue_name"),
        col("r.venue.city").as("t_venue_city"))
    val header = standingsRaw.select(
      col("pk"), element_at(col("response"), 1).getField("league").as("league"))
    val rows = header.select(
      col("pk"),
      col("league.id").cast("string").as("league_id"),
      col("league.name").cast("string").as("league_name"),
      col("league.season").cast("long").as("season"),
      explode(element_at(col("league.standings"), 1)).as("standing"))
    rows.join(broadcast(t),
        rows("pk") === t("t_pk") && rows("standing.team.id") === t("t_team_id"), "inner")
      .select(
        concat_ws("-", col("pk"), col("standing.team.id")).as("pk"),
        col("standing.team.id").cast("string").as("team_id"),
        col("standing.team.name").cast("string").as("team_name"),
        col("t_country").cast("string").as("team_country"),
        col("league_id"), col("league_name"), col("season"),
        l(col("standing.rank")).as("rank"),
        l(col("standing.points")).as("points"),
        l(col("standing.all.played")).as("games_played"),
        l(col("standing.all.win")).as("wins"),
        l(col("standing.all.draw")).as("draws"),
        l(col("standing.all.lose")).as("losses"),
        coalesce(l(col("standing.all.goals.for")), lit(0L)).as("goals_for"),
        coalesce(l(col("standing.all.goals.against")), lit(0L)).as("goals_against"),
        l(col("standing.goalsDiff")).as("goal_difference"), // source value verbatim (ref transforms.py:118)
        col("standing.form").cast("string").as("form"),
        col("t_venue_name").cast("string").as("venue_name"),
        col("t_venue_city").cast("string").as("venue_city"),
        lit(null).cast("timestamp").as("update_timestamp"),
        lit("1").as("schema_version"))
  }

  /** E3 dispatch (ref `transforms.py:129-132`): api name → normalizer;
    * unknown name fails fast at construction. */
  val transformMap: Map[String, (DataFrame, DataFrame) => DataFrame] = Map(
    "apifootball" -> apiFootball _,
    "apisports" -> apiSports _)

  def normalizer(apiName: String): (DataFrame, DataFrame) => DataFrame =
    transformMap.getOrElse(apiName,
      throw new IllegalArgumentException(s"Unknown api_name $apiName"))

  /** Full staged-dir pipeline for one API: route files by endpoint
    * path substring (S4, ref `transforms.py:163-166`), normalize,
    * enforce the unified schema, split dead letters (group-level, ref
    * E1). Returns (ok, dead). */
  def pipeline(spark: SparkSession, root: String, apiName: String): (DataFrame, DataFrame) = {
    val teams = readStaged(spark, s"$root/*/*/teams/*.json")
    val standings = readStaged(spark, s"$root/*/*/standings/*.json")
    val unified = normalizer(apiName)(teams, standings)
    Enforce.splitByGroup(unified, SchemaRegistry.v1.fields, "pk")
  }
}
