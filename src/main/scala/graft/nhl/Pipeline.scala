package graft.nhl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's three DAGs composed as one callable pipeline
  * (SURVEY.md §3): raw ingest (E1/E2 equivalents) → ledgered
  * incremental load → staging models → mart → quality gate.
  *
  * Each stage is a pure function; "orchestration" is Scala call
  * order. `run` returns every materialized layer so callers (tests,
  * jobs) can inspect or persist them.
  *
  * Task-retry semantics (ref: `dags/nhl_api_dag.py:113` —
  * `retries=1, retry_delay=5s`; same pattern in the other DAGs)
  * live in [[withRetry]]: wrap any stage call to get the Airflow
  * task-level retry behavior. Because every COPY INTO is idempotent
  * per file (S7 ledger), a retried ingest never double-loads —
  * retries are safe by construction, which is the property the
  * reference leans on too. Scheduling (`@daily`) and sensor
  * poke/timeout stay out of engine scope (SURVEY §2.1): they belong
  * to whatever invokes the pipeline.
  */
object Pipeline {

  /** Run `f`, retrying up to `retries` more times on failure with
    * `delayMs` between attempts — the Airflow task retry contract.
    * Non-retryable analysis errors (missing columns, bad schemas)
    * fail fast: retrying cannot fix a plan that does not resolve. */
  def withRetry[T](retries: Int = 1, delayMs: Long = 5000L)(f: => T): T = {
    require(retries >= 0 && delayMs >= 0)
    var attempt = 0
    var out: Option[T] = None
    while (out.isEmpty) {
      try out = Some(f)
      catch {
        case e: org.apache.spark.sql.AnalysisException => throw e
        case scala.util.control.NonFatal(e) =>
          if (attempt >= retries) throw e
          attempt += 1
          if (delayMs > 0) Thread.sleep(delayMs)
      }
    }
    out.get
  }

  final case class Layout(
      gamesCsvDir: String, teamStatsCsvDir: String,
      schedulesJsonDir: String, playoffsJsonDir: String,
      seasonsJsonDir: String, teamsJsonDir: String,
      warehouseDir: String)

  final case class Result(
      regularSeason: DataFrame, teamStats: DataFrame,
      apiSchedules: DataFrame, apiPlayoffs: DataFrame,
      apiSeasons: DataFrame, apiTeams: DataFrame,
      stgGames: DataFrame, stgPlayoffs: DataFrame,
      stgTeamStatistics: DataFrame, stgTeams: DataFrame,
      seasonalMetricsAgg: DataFrame)

  private def loadIfPresent(spark: SparkSession, dir: String,
      read: (SparkSession, String) => DataFrame, target: String): Option[DataFrame] = {
    if (Ledger.pathExists(spark, dir)) {
      Ledger.copyInto(spark, read(spark, dir), target)
      Ledger.readTarget(spark, target)
    } else None
  }

  /** Run the full pipeline over staged input dirs; every COPY INTO is
    * idempotent per file (re-runs are no-ops, ref S7). */
  def run(spark: SparkSession, layout: Layout): Result = {
    import layout._
    def tgt(name: String) = s"$warehouseDir/raw_$name"

    val regularSeason = loadIfPresent(spark, gamesCsvDir,
      Ingest.readGamesCsv, tgt("regular_season"))
      .getOrElse(sys.error(s"missing games csv dir: $gamesCsvDir"))
    val teamStats = loadIfPresent(spark, teamStatsCsvDir,
      Ingest.readTeamStatsCsv, tgt("team_stats"))
      .getOrElse(sys.error(s"missing team stats dir: $teamStatsCsvDir"))
    val schedules = loadIfPresent(spark, schedulesJsonDir,
      Ingest.readScheduleJson, tgt("nhl_api_reg_schedules"))
    val playoffs = loadIfPresent(spark, playoffsJsonDir,
      Ingest.readScheduleJson, tgt("nhl_api_playoff_schedules"))
    val seasons = loadIfPresent(spark, seasonsJsonDir,
      Ingest.readSeasonsJson, tgt("nhl_api_seasons"))
    val teams = loadIfPresent(spark, teamsJsonDir,
      Ingest.readTeamsJson, tgt("nhl_api_teams"))

    val empty = spark.emptyDataFrame
    val stgG = Staging.stgGames(schedules.getOrElse(empty))
    val stgP = Staging.stgGames(playoffs.getOrElse(empty))
    val stgTS = Staging.stgTeamStatistics(teamStats)
    val stgT = teams.map(Staging.stgTeams).getOrElse(empty)

    // quality gate before the mart, as the reference DAG orders it
    // (hockeyreference_dag.py:141-149 precedes dbt)
    Quality.requireNoNulls(stgTS, Seq("TEAM"))

    val mart = Mart.seasonalMetricsAgg(regularSeason, stgTS)
    Result(regularSeason, teamStats,
      schedules.getOrElse(empty), playoffs.getOrElse(empty),
      seasons.getOrElse(empty), teams.getOrElse(empty),
      stgG, stgP, stgTS, stgT, mart)
  }
}
