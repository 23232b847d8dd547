package graft.nhl

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** The mart layer: seasonal_metrics_agg
  * (ref: dags/nhl_dbt/models/example/marts/seasonal_metrics_agg.sql:1-74).
  *
  * Implements the *intended* semantics (SURVEY.md §1.1 note): the
  * games-CSV staging joined to team statistics once on the visitor
  * team and once on the home team, branches UNIONed with set
  * semantics — one row per (game, participating team-stat row),
  * 21 columns (ref :21-42).
  *
  * Scale: team_statistics is a per-season dimension (32 rows/season) —
  * always broadcast, so the games fact never shuffles for the joins;
  * the UNION-distinct is the single shuffle, exactly the reference
  * mart's cost shape. At 100 TB of games the plan is scan + 2 BHJ +
  * one exchange for the distinct.
  */
object Mart {

  private def branch(games: DataFrame, stats: DataFrame,
      gameKey: String): DataFrame =
    games.join(broadcast(stats), games(gameKey) === stats("TEAM"), "inner")
      .select(
        // the exact 21-column select list (ref :21-42,:49-70)
        games("game_date").as("GAME_DATE"),
        games("game_time").as("GAME_TIME"),
        games("visitor").as("VISITOR"),
        games("visitor_goals").as("VISITOR_GOALS"),
        games("home").as("HOME"),
        games("home_goals").as("HOME_GOALS"),
        games("guests_in_attendance").as("GUESTS_IN_ATTENDANCE"),
        games("length_of_game").as("LENGTH_OF_GAME"),
        stats("GP"), stats("OVERALL_WINS"), stats("OVERALL_LOSSES"),
        stats("OVERTIME_LOSSES"), stats("TOTAL_POINTS"),
        stats("POINTS_PERCENTAGE"), stats("GOALS_FOR"),
        stats("GOALS_AGAINST"), stats("HOCKEY_REFERENCE_SRS"),
        stats("STRENGTH_OF_SCHEDULE"),
        stats("POINTS_PERCENTAGE_IN_REGULATION"),
        stats("WINS_IN_REGULATION"), stats("REGULATION_RECORD"))

  /** visitor-branch ∪ home-branch with set semantics
    * (ref :43-47,:71-73; UNION not UNION ALL — the distinct is
    * mandatory for parity, SURVEY.md §2 row A2). */
  def seasonalMetricsAgg(stgGames: DataFrame,
      stgTeamStatistics: DataFrame): DataFrame =
    branch(stgGames, stgTeamStatistics, "visitor")
      .union(branch(stgGames, stgTeamStatistics, "home"))
      .distinct()
}
