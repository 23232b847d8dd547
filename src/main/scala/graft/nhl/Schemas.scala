package graft.nhl

import org.apache.spark.sql.types._

/** Typed schemas for the reference's tables (SURVEY.md §1).
  *
  * Schema-on-load, positionally declared, exactly as the reference's
  * COPY INTO scripts do (ref: include/sql/copy_into_nhl_stats_seasons
  * .sql:7-14, copy_into_nhl_stats_teams.sql:4-17) — but as explicit
  * `StructType`s: no `inferSchema` in production paths, so plans and
  * pushdowns are deterministic at any scale.
  */
object Schemas {

  /** Snowflake TIME has no stable Spark equivalent (SURVEY.md §7 hard
    * part 1): games carry both a canonical "HH:MM" string and a
    * seconds-since-midnight int for arithmetic/ordering. */
  val TimeStr: DataType = StringType

  /** Header-less hockey-reference games CSV, positional $1..$10
    * (ref: copy_into_nhl_stats_seasons.sql:7-14; $7 the OT/SO
    * indicator is skipped, $10 Notes is dropped). */
  val gamesCsv: StructType = StructType(Seq(
    StructField("_c0", StringType), // game_date
    StructField("_c1", StringType), // game_time
    StructField("_c2", StringType), // visitor
    StructField("_c3", StringType), // visitor_goals
    StructField("_c4", StringType), // home
    StructField("_c5", StringType), // home_goals
    StructField("_c6", StringType), // OT/SO indicator — deliberately skipped
    StructField("_c7", StringType), // attendance
    StructField("_c8", StringType), // length_of_game
    StructField("_c9", StringType)  // notes — dropped
  ))

  /** Header-less team-stats CSV, positional $1..$14
    * (ref: copy_into_nhl_stats_teams.sql:4-17). */
  val teamStatsCols: Seq[String] = Seq(
    "TEAM", "GP", "OVERALL_WINS", "OVERALL_LOSSES", "OVERTIME_LOSSES",
    "TOTAL_POINTS", "POINTS_PERCENTAGE", "GOALS_FOR", "GOALS_AGAINST",
    "HOCKEY_REFERENCE_SRS", "STRENGTH_OF_SCHEDULE",
    "POINTS_PERCENTAGE_IN_REGULATION", "WINS_IN_REGULATION",
    "REGULATION_RECORD")

  val teamStatsCsv: StructType =
    StructType(teamStatsCols.indices.map(i => StructField(s"_c$i", StringType)))

  /** SportRadar schedule payload, schema-first (ref:
    * copy_into_nhl_api_schedules.sql:4-10 promotes games/league/season
    * VARIANT paths; we type them as structs so Catalyst can prune). */
  val sportradarGame: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("status", StringType),
    StructField("scheduled", StringType),
    StructField("home_points", LongType),
    StructField("away_points", LongType),
    StructField("home", StructType(Seq(
      StructField("id", StringType), StructField("name", StringType),
      StructField("alias", StringType)))),
    StructField("away", StructType(Seq(
      StructField("id", StringType), StructField("name", StringType),
      StructField("alias", StringType))))))

  val sportradarSchedule: StructType = StructType(Seq(
    StructField("league", StructType(Seq(
      StructField("id", StringType), StructField("name", StringType),
      StructField("alias", StringType)))),
    StructField("season", StructType(Seq(
      StructField("id", StringType), StructField("year", LongType),
      StructField("type", StringType)))),
    StructField("games", ArrayType(sportradarGame))))

  /** SportRadar teams payload (ref: copy_into_nhl_api_teams.sql:3-9,
    * flattened by teams.sql:11-17). */
  val sportradarTeam: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("alias", StringType),
    StructField("market", StringType)))

  /** SportRadar seasons payload (ref: copy_into_nhl_api_seasons
    * .sql:3-9 — raw_json['seasons'] promoted as `season`). */
  val sportradarSeasons: StructType = StructType(Seq(
    StructField("league", StructType(Seq(
      StructField("id", StringType), StructField("name", StringType),
      StructField("alias", StringType)))),
    StructField("seasons", ArrayType(StructType(Seq(
      StructField("id", StringType), StructField("year", LongType),
      StructField("type", StructType(Seq(
        StructField("code", StringType))))))))))

  val sportradarTeams: StructType = StructType(Seq(
    StructField("league", StructType(Seq(
      StructField("id", StringType), StructField("name", StringType),
      StructField("alias", StringType)))),
    StructField("teams", ArrayType(sportradarTeam))))

  /** Typed staging rows (SURVEY.md §1.3). */
  final case class Game(
      game_date: java.sql.Date, game_time: String, game_time_secs: Int,
      visitor: String, visitor_goals: Long, home: String, home_goals: Long,
      guests_in_attendance: Long, length_of_game: String,
      length_of_game_secs: Int, source_file: String, unique_key: String)

  final case class TeamStat(
      team: String, gp: Long, overall_wins: Long, overall_losses: Long,
      overtime_losses: Long, total_points: Long,
      points_percentage: Double, goals_for: Long, goals_against: Long,
      hockey_reference_srs: Double, strength_of_schedule: Double,
      points_percentage_in_regulation: Double, wins_in_regulation: Long,
      regulation_record: String, source_file: String, unique_key: String)

  final case class Team(
      id: String, name: String, alias: String, market: String,
      full_name: String, source_file: String, unique_key: String)
}
