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

  // try_cast, not cast: Spark 4 defaults ANSI on, where a plain cast of
  // a malformed numeric string throws and kills the stage — the
  // reference diverts the group instead (dead-letter). try_cast nulls,
  // and Enforce routes the null/required/cast checks to the dead side.
  private def l(c: Column): Column = c.try_cast("long")

  /** Corrupt or empty staged files infer a schema without the payload
    * columns; pad the expected columns with typed nulls so the
    * normalizer plan always resolves and the affected rows flow to the
    * dead-letter path instead of failing analysis. */
  private def pad(df: DataFrame, cols: (String, String)*): DataFrame =
    cols.foldLeft(df) { case (d, (name, typ)) =>
      if (d.columns.contains(name)) d else d.withColumn(name, lit(null).cast(typ))
    }

  /** API-Football (ref `transforms.py:19-72`): flat string-typed
    * payloads; join standings⋈teams on team id within each pk group;
    * rank/points/played/W/D/L renames; GF/GA default 0 on missing
    * (P4); goal_difference computed (P5); season from the path pk
    * (P7). Both inputs must carry a `pk` column (from readStaged). */
  def apiFootball(teamsRaw: DataFrame, standingsRaw: DataFrame): DataFrame = {
    val teams = pad(teamsRaw,
      "team_key" -> "string", "team_country" -> "string",
      "venue" -> "struct<venue_name:string,venue_city:string>")
    val standings = pad(standingsRaw,
      "team_id" -> "string", "team_name" -> "string", "league_id" -> "string",
      "league_name" -> "string", "overall_league_position" -> "string",
      "overall_league_PTS" -> "string", "overall_league_payed" -> "string",
      "overall_league_W" -> "string", "overall_league_D" -> "string",
      "overall_league_L" -> "string", "overall_league_GF" -> "string",
      "overall_league_GA" -> "string", "overall_league_form" -> "string")
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
        // Every API-Football numeric arrives as a STRING and the
        // reference int()s it (raising on non-numeric → the whole
        // group dead-letters, transforms.py:48-64 + 182-184). The raw
        // strings therefore ride through to Enforce, whose try_cast
        // flags 'abc' as cast_failure:<field>; an l() here would
        // silently null the evidence and the row would pass clean.
        // ABSENT values: GF/GA default "0" (ref .get(field, 0));
        // the rest stay null — reference raises KeyError there, but
        // this engine's documented NULLABLE default admits them
        // (SchemaRegistry strict mode restores the reference's
        // behavior).
        col("overall_league_position").cast("string").as("rank"),
        col("overall_league_PTS").cast("string").as("points"),
        col("overall_league_payed").cast("string").as("games_played"), // [sic] upstream field name
        col("overall_league_W").cast("string").as("wins"),
        col("overall_league_D").cast("string").as("draws"),
        col("overall_league_L").cast("string").as("losses"),
        coalesce(col("overall_league_GF").cast("string"), lit("0")).as("goals_for"),
        coalesce(col("overall_league_GA").cast("string"), lit("0")).as("goals_against"),
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
  def apiSports(teamsRaw0: DataFrame, standingsRaw0: DataFrame): DataFrame = {
    val teamsRaw = pad(teamsRaw0, "response" ->
      "array<struct<team:struct<id:bigint,name:string,country:string>,venue:struct<name:string,city:string>>>")
    val standingsRaw = pad(standingsRaw0, "response" ->
      ("array<struct<league:struct<id:bigint,name:string,season:bigint," +
        "standings:array<array<struct<rank:bigint,team:struct<id:bigint,name:string>," +
        "points:bigint,goalsDiff:bigint,form:string," +
        "all:struct<played:bigint,win:bigint,draw:bigint,lose:bigint," +
        "goals:struct<`for`:bigint,against:bigint>>>>>>>>"))
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
    * enforce the unified schema, split dead letters at the
    * (season, league) GROUP granularity exactly like the reference
    * (ref `transforms.py:149-184`: any failure inside a group diverts
    * the whole group):
    *  - unparseable staged document → its group dead-letters
    *    (`error=corrupt_input`, ref `transforms.py:167-169`);
    *  - any enforcement failure → the row's whole group dead-letters;
    *  - a group present in the inputs that produces NO unified rows
    *    (empty payload / nothing joinable) → dead-letters
    *    (`error=empty_or_unjoinable_group`, ref `transforms.py:26-27,
    *    78-87` P10 presence checks).
    *
    * Returns (ok, dead): `dead` has one (pk, error) row per failed
    * group, feedable to `Sinks.writeDeadLetter`. Scale: the group
    * verdicts are distinct-sets of group keys (tiny), combined with
    * semi/anti joins — no driver collection. */
  def pipeline(spark: SparkSession, root: String, apiName: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.DataFrame
    // cache: multiple consumers each (normalize + expected-pk audit).
    // `_corrupt_record` must be dropped BEFORE caching: materializing a
    // cache selects every column, and for a fully-corrupt file that is
    // only the corrupt-record column, which Spark refuses to query off
    // a JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN). Whole-file
    // corruption is detected by the text parse probe below instead.
    def staged(glob: String): DataFrame = {
      val df = readStaged(spark, glob)
      (if (df.columns.contains("_corrupt_record")) df.drop("_corrupt_record") else df).cache()
    }
    val teams = staged(s"$root/*/*/teams/*.json")
    val standings = staged(s"$root/*/*/standings/*.json")

    // corrupt-document detection: whole-file text read + parse probe
    // (get_json_object of the root returns null for unparseable docs).
    // Spark disallows querying only `_corrupt_record` off a JSON scan,
    // and a per-file verdict is what the reference's per-group read
    // failure maps to anyway (ref transforms.py:158-169).
    def corruptPks(glob: String): DataFrame =
      spark.read.option("wholetext", "true").text(glob)
        .select(Paths.extractPk(input_file_name()).as("pk"), col("value"))
        .filter(get_json_object(col("value"), "$").isNull)
        .select(col("pk")).distinct()
    val corrupt = corruptPks(s"$root/*/*/teams/*.json")
      .unionByName(corruptPks(s"$root/*/*/standings/*.json")).distinct()

    // every group the staged inputs mention — the universe that must be
    // accounted for between ok and dead
    val expected = teams.select(col("pk")).unionByName(standings.select(col("pk"))).distinct()

    // group key = the row pk minus its trailing -team_id segment. NOT
    // "first two '-'-segments": the path-pk fallback is the single
    // token "unknown" (Paths.extractPk), whose row pks look like
    // "unknown-<team>" — a two-segment split would yield a group
    // "unknown-<team>" that never matches the expected/corrupt
    // universes (groups double-counted ok+dead, corrupt rows never
    // quarantined).
    def groupOf(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      regexp_replace(c, "-[^-]*$", "")

    val unified = normalizer(apiName)(teams, standings)
      .withColumn("group_pk", groupOf(col("pk")))
    val (ok0, deadRows) = Enforce.splitByGroup(unified, SchemaRegistry.v1.fields, "group_pk")

    val enforceDead = deadRows.select(col("group_pk").as("pk")).distinct()
      .withColumn("error", lit("enforcement_failure"))
    val corruptDead = corrupt.withColumn("error", lit("corrupt_input"))
    val okGroups = ok0.select(groupOf(col("pk")).as("pk")).distinct()
    val vanished = expected
      .join(okGroups, Seq("pk"), "left_anti")
      .join(enforceDead.select("pk"), Seq("pk"), "left_anti")
      .join(corruptDead.select("pk"), Seq("pk"), "left_anti")
      .withColumn("error", lit("empty_or_unjoinable_group"))

    val dead = corruptDead.unionByName(enforceDead).unionByName(vanished)
    // rows of a corrupt group are not trustworthy either — remove them
    val ok = ok0.join(
      corrupt.select(col("pk").as("bad_group")),
      groupOf(col("pk")) === col("bad_group"),
      "left_anti")
    (ok, dead)
  }
}
