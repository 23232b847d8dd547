package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** dbt-generic-test family as library operators (ref: the reference
  * installs dbt_utils but declares zero tests — `dags/nhl_dbt/
  * packages.yml:1-3`, `schema.yml:4-12`; its only runtime assertion
  * is the A1 null gate, `dags/hockeyreference_dag.py:141-149`). This
  * is that surface made first-class: each check returns a one-row
  * (check, n_violations) frame, and `suite` unions them into a
  * data-quality report.
  *
  * Scale shapes: `uniqueKey` is one partial-combined aggregate over
  * the key (violating keys are counted post-combine, so the shuffle
  * carries |distinct keys| not |rows|); `notNull`/`acceptedValues`
  * are map-only scans feeding a count; `referentialIntegrity` is a
  * left-anti join the planner broadcasts when the parent's key
  * projection is small (and AQE handles as a shuffle anti join when
  * it is not). Nothing collects; every check is a single action-free
  * plan, so the whole suite is one union job.
  */
object DqChecks {

  private def report(name: String, violations: Column, df: DataFrame)
      : DataFrame =
    df.agg(violations.cast("long").as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  /** dbt `unique` (compound keys allowed): key combinations occurring
    * more than once (dbt's count — duplicated keys, not rows). */
  def uniqueKey(name: String, df: DataFrame, keys: Seq[String]): DataFrame =
    report(name, count(when(col("_n") > 1, 1)),
      df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("_n")))

  /** dbt `not_null`. */
  def notNull(name: String, df: DataFrame, column: String): DataFrame =
    report(name, count(when(col(column).isNull, 1)), df)

  /** dbt `relationships`: child keys with no parent row (orphans).
    * Null child keys are not orphans (SQL FK semantics). */
  def referentialIntegrity(name: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    report(name, count(lit(1)),
      child.select(col(childKey)).filter(col(childKey).isNotNull)
        .join(parent.select(col(parentKey)),
          col(childKey) === col(parentKey), "left_anti"))

  /** dbt `accepted_values`. */
  def acceptedValues(name: String, df: DataFrame, column: String,
      allowed: Seq[String]): DataFrame =
    report(name,
      count(when(!col(column).isin(allowed: _*) || col(column).isNull, 1)),
      df)

  /** Union the one-row reports into the suite result (deterministic
    * order for the gate). */
  def suite(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_ unionByName _).orderBy(col("check_name"))
}
