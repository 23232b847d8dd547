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
    games.join(broadcast(stats), games(gameKey) === stats("team"), "inner")
      .select(
        // game side (ref :22-31)
        games("game_date"), games("game_time"), games("game_time_secs"),
        games("visitor"), games("visitor_goals"),
        games("home"), games("home_goals"),
        games("guests_in_attendance"),
        games("length_of_game"), games("length_of_game_secs"),
        // team-stat side (ref :32-42)
        stats("team"), stats("gp"), stats("overall_wins"),
        stats("overall_losses"), stats("overall_ot"),
        stats("total_points"), stats("point_pctg"),
        stats("goals_for"), stats("goals_against"),
        stats("goals_per_game"), stats("goals_against_per_game"))

  /** visitor-branch ∪ home-branch with set semantics
    * (ref :43-47,:71-73; UNION not UNION ALL — the distinct is
    * mandatory for parity, SURVEY.md §2 row A2). */
  def seasonalMetricsAgg(stgGames: DataFrame,
      stgTeamStatistics: DataFrame): DataFrame =
    branch(stgGames, stgTeamStatistics, "visitor")
      .union(branch(stgGames, stgTeamStatistics, "home"))
      .distinct()
}
