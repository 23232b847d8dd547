package graft.nhl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Staging models — the reference's dbt staging layer as pure
  * `DataFrame => DataFrame` functions (SURVEY.md §1.1, §3 E3).
  */
object Staging {

  /** stg games / playoffs: identity pass-through; incremental dedup
    * is applied by Ledger.incrementalByKey at write time
    * (ref: games.sql:9-13, playoffs.sql:9-13). */
  def stgGames(raw: DataFrame): DataFrame = raw

  /** The 14 stat columns cleaned by the reference
    * (ref: team_statistics.sql:12-25). */
  private val statCols = Schemas.teamStatsCols

  /** P6: scraped HTML embeds division-header rows; null them out
    * column-wise (ref: team_statistics.sql:12-25 CASE WHEN
    * UPPER(col) LIKE '%DIVISION%' THEN NULL). */
  def nullOutDivisionRows(df: DataFrame): DataFrame =
    statCols.foldLeft(df) { (d, c) =>
      d.withColumn(c,
        when(upper(col(c)).like("%DIVISION%"), lit(null)).otherwise(col(c)))
    }

  /** P5: keep rows where all 14 stat columns are non-null
    * (ref: team_statistics.sql:32-46). */
  def dropNullStatRows(df: DataFrame): DataFrame =
    df.filter(statCols.map(col(_).isNotNull).reduce(_ && _))

  /** stg team_statistics: P6 ∘ P5 + typed casts
    * (ref: team_statistics.sql:1-50; casts are ours — the raw CSV
    * layer keeps strings, the staging layer types them). */
  def stgTeamStatistics(raw: DataFrame): DataFrame = {
    val cleaned = dropNullStatRows(nullOutDivisionRows(raw))
    cleaned.select(
      col("updated_at"), col("source_file"), col("unique_key"),
      col("TEAM").as("team"),
      col("GP").cast(LongType).as("gp"),
      col("OVERALL_WINS").cast(LongType).as("overall_wins"),
      col("OVERALL_LOSSES").cast(LongType).as("overall_losses"),
      col("OVERALL_OT").cast(LongType).as("overall_ot"),
      col("TOTAL_POINTS").cast(LongType).as("total_points"),
      col("POINT_PCTG").cast(DoubleType).as("point_pctg"),
      col("GOALS_FOR").cast(LongType).as("goals_for"),
      col("GOALS_AGAINST").cast(LongType).as("goals_against"),
      col("SRS_RATING").cast(DoubleType).as("srs_rating"),
      col("SOS_RATING").cast(DoubleType).as("sos_rating"),
      col("GOALS_PER_GAME").cast(DoubleType).as("goals_per_game"),
      col("GOALS_AGAINST_PER_GAME").cast(DoubleType)
        .as("goals_against_per_game"),
      col("REGULATION_RECORD").as("regulation_record"))
  }

  /** stg teams: lateral-flatten of the JSON teams array with parent
    * columns carried along + market||' '||name full name
    * (ref: teams.sql:11-17 LATERAL FLATTEN + concat). */
  def stgTeams(rawTeams: DataFrame): DataFrame =
    rawTeams
      .select(
        col("updated_at"), col("source_file"), col("unique_key"),
        explode(col("teams")).as("f"))
      .select(
        col("updated_at"), col("source_file"),
        md5(concat_ws("|", col("unique_key"), col("f.id")))
          .as("unique_key"),
        col("f.id").as("id"),
        col("f.name").as("name"),
        col("f.alias").as("alias"),
        col("f.market").as("market"),
        concat_ws(" ", col("f.market"), col("f.name")).as("full_name"))

  /** stg games from the JSON schedules: explode the promoted games
    * array into one row per game (SURVEY.md §3 E2 staging). */
  def stgApiGames(rawSchedules: DataFrame): DataFrame =
    rawSchedules
      .select(
        col("updated_at"), col("source_file"), col("unique_key"),
        col("season.year").as("season_year"),
        col("season.type").as("season_type"),
        explode(col("games")).as("g"))
      .select(
        col("updated_at"), col("source_file"),
        md5(concat_ws("|", col("unique_key"), col("g.id")))
          .as("unique_key"),
        col("season_year"), col("season_type"),
        col("g.id").as("game_id"),
        col("g.status").as("status"),
        col("g.scheduled").as("scheduled"),
        col("g.home.name").as("home_team"),
        col("g.away.name").as("away_team"),
        col("g.home_points").as("home_points"),
        col("g.away_points").as("away_points"))
}
