package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY.md §2 to a
  * (SparkSession, sfDir) => DataFrame; `oracleSql` carries the DuckDB
  * equivalent for the driver's hash-compare. Column names/aliases are
  * kept identical on both sides.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Agg.martJoinUnion(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Parity.queries ++
      graft.queries.Agg.queries ++
      graft.queries.Parity2.queries ++
      graft.queries.Parity3.queries ++
      graft.queries.Parity4.queries ++
      graft.queries.Parity5.queries ++
      graft.queries.Parity6.queries ++
      graft.queries.Parity7.queries ++
      graft.queries.Parity8.queries ++
      graft.queries.Parity9.queries ++
      graft.queries.Parity10.queries ++
      graft.queries.Parity11.queries ++
      graft.queries.Parity12.queries ++
      graft.queries.Parity13.queries ++
      graft.queries.Parity14.queries ++
      graft.queries.Parity15.queries ++
      graft.queries.Parity16.queries ++
      graft.queries.Parity17.queries ++
      graft.queries.Parity18.queries ++
      graft.queries.Parity19.queries ++
      graft.queries.Parity20.queries ++
      graft.queries.Parity21.queries ++
      graft.queries.Parity22.queries ++
      graft.queries.Parity23.queries ++
      graft.queries.Parity24.queries ++
      graft.queries.Parity25.queries ++
      graft.queries.Parity26.queries ++
      graft.queries.Parity27.queries ++
      graft.queries.Parity28.queries ++
      graft.queries.Parity29.queries ++
      graft.queries.Parity30.queries ++
      graft.queries.Parity31.queries ++
      graft.queries.Parity32.queries ++
      graft.queries.Parity33.queries ++
      graft.queries.Parity34.queries ++
      graft.queries.Parity35.queries ++
      graft.queries.Parity36.queries ++
      graft.queries.Parity37.queries ++
      graft.queries.Parity38.queries ++
      graft.queries.Parity39.queries ++
      graft.queries.Parity40.queries ++
      graft.queries.Parity41.queries ++
      graft.queries.Parity42.queries ++
      graft.queries.Parity43.queries ++
      graft.queries.Parity44.queries ++
      graft.queries.Parity45.queries ++
      graft.queries.Parity46.queries ++
      graft.queries.Parity47.queries ++
      graft.queries.Parity48.queries ++
      graft.queries.Parity49.queries ++
      graft.queries.Parity50.queries ++
      graft.queries.Parity51.queries ++
      graft.queries.Parity52.queries ++
      graft.queries.Parity53.queries ++
      graft.queries.Parity54.queries ++
      graft.queries.Parity55.queries ++
      graft.queries.Parity56.queries ++
      graft.queries.Parity57.queries ++
      graft.queries.Parity58.queries ++
      graft.queries.Parity59.queries ++
      graft.queries.Parity60.queries ++
      graft.queries.Parity61.queries ++
      graft.queries.Parity62.queries ++
      graft.queries.Parity63.queries ++
      graft.queries.Parity64.queries ++
      graft.queries.Parity65.queries ++
      graft.queries.Parity66.queries ++
      graft.queries.Parity67.queries ++
      graft.queries.Parity68.queries ++
      graft.queries.Parity69.queries ++
      graft.queries.Parity70.queries ++
      graft.queries.Parity71.queries ++
      graft.queries.Parity72.queries ++
      graft.queries.Parity73.queries ++
      graft.queries.Parity74.queries ++
      graft.queries.Parity75.queries ++
      graft.queries.Parity76.queries ++
      graft.queries.Parity77.queries ++
      graft.queries.Parity78.queries ++
      graft.queries.ExtQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Parity.oracles ++
      graft.queries.Agg.oracles ++
      graft.queries.Parity2.oracles ++
      graft.queries.Parity3.oracles ++
      graft.queries.Parity4.oracles ++
      graft.queries.Parity5.oracles ++
      graft.queries.Parity6.oracles ++
      graft.queries.Parity7.oracles ++
      graft.queries.Parity8.oracles ++
      graft.queries.Parity9.oracles ++
      graft.queries.Parity10.oracles ++
      graft.queries.Parity11.oracles ++
      graft.queries.Parity12.oracles ++
      graft.queries.Parity13.oracles ++
      graft.queries.Parity14.oracles ++
      graft.queries.Parity15.oracles ++
      graft.queries.Parity16.oracles ++
      graft.queries.Parity17.oracles ++
      graft.queries.Parity18.oracles ++
      graft.queries.Parity19.oracles ++
      graft.queries.Parity20.oracles ++
      graft.queries.Parity21.oracles ++
      graft.queries.Parity22.oracles ++
      graft.queries.Parity23.oracles ++
      graft.queries.Parity24.oracles ++
      graft.queries.Parity25.oracles ++
      graft.queries.Parity26.oracles ++
      graft.queries.Parity27.oracles ++
      graft.queries.Parity28.oracles ++
      graft.queries.Parity29.oracles ++
      graft.queries.Parity30.oracles ++
      graft.queries.Parity31.oracles ++
      graft.queries.Parity32.oracles ++
      graft.queries.Parity33.oracles ++
      graft.queries.Parity34.oracles ++
      graft.queries.Parity35.oracles ++
      graft.queries.Parity36.oracles ++
      graft.queries.Parity37.oracles ++
      graft.queries.Parity38.oracles ++
      graft.queries.Parity39.oracles ++
      graft.queries.Parity40.oracles ++
      graft.queries.Parity41.oracles ++
      graft.queries.Parity42.oracles ++
      graft.queries.Parity43.oracles ++
      graft.queries.Parity44.oracles ++
      graft.queries.Parity45.oracles ++
      graft.queries.Parity46.oracles ++
      graft.queries.Parity47.oracles ++
      graft.queries.Parity48.oracles ++
      graft.queries.Parity49.oracles ++
      graft.queries.Parity50.oracles ++
      graft.queries.Parity51.oracles ++
      graft.queries.Parity52.oracles ++
      graft.queries.Parity53.oracles ++
      graft.queries.Parity54.oracles ++
      graft.queries.Parity55.oracles ++
      graft.queries.Parity56.oracles ++
      graft.queries.Parity57.oracles ++
      graft.queries.Parity58.oracles ++
      graft.queries.Parity59.oracles ++
      graft.queries.Parity60.oracles ++
      graft.queries.Parity61.oracles ++
      graft.queries.Parity62.oracles ++
      graft.queries.Parity63.oracles ++
      graft.queries.Parity64.oracles ++
      graft.queries.Parity65.oracles ++
      graft.queries.Parity66.oracles ++
      graft.queries.Parity67.oracles ++
      graft.queries.Parity68.oracles ++
      graft.queries.Parity69.oracles ++
      graft.queries.Parity70.oracles ++
      graft.queries.Parity71.oracles ++
      graft.queries.Parity72.oracles ++
      graft.queries.Parity73.oracles ++
      graft.queries.Parity74.oracles ++
      graft.queries.Parity75.oracles ++
      graft.queries.Parity76.oracles ++
      graft.queries.Parity77.oracles ++
      graft.queries.Parity78.oracles ++
      graft.queries.ExtQueries.oracles
}
