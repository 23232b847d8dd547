package graft.nhl

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Data-quality gate (ref: hockeyreference_dag.py:139-149
  * SQLColumnCheckOperator — TEAM null count must equal 0).
  *
  * Implemented with `Observation` so the check is a free side-output
  * of whatever action materializes the frame — no second scan of the
  * data, which is the difference between a metric and a full extra
  * pass at 100 TB.
  */
object Quality {

  final case class NullCheckFailure(column: String, nulls: Long)
    extends RuntimeException(
      s"quality gate: column '$column' has $nulls null(s), expected 0")

  /** Attach a null-count observation to `df`; returns the observed
    * frame and a callback that throws NullCheckFailure after an
    * action has run. */
  def observeNulls(df: DataFrame, columns: Seq[String])
      : (DataFrame, () => Map[String, Long]) = {
    val obs = Observation()
    val metrics = columns.map(c =>
      count(when(col(c).isNull, 1)).as(s"nulls_$c"))
    val observed = df.observe(obs, metrics.head, metrics.tail: _*)
    val get = () => columns.map(c =>
      c -> obs.get(s"nulls_$c").asInstanceOf[Long]).toMap
    (observed, get)
  }

  /** Streaming variant of the gate: attach a NAMED observe (the
    * `Observation` helper is batch-only — its get() would block
    * forever on a stream); per-micro-batch values arrive in
    * `StreamingQueryProgress.observedMetrics(name)` as a Row of
    * `nulls_<col>` longs. Same zero-extra-scan property as the batch
    * gate — the metric rides the micro-batch that materializes
    * anyway. */
  def observeNullsStream(df: DataFrame, columns: Seq[String],
      name: String = "dq"): DataFrame = {
    val metrics = columns.map(c =>
      count(when(col(c).isNull, 1)).as(s"nulls_$c")) :+
      count(lit(1)).as("rows")
    df.observe(name, metrics.head, metrics.tail: _*)
  }

  /** Run the gate eagerly (one count action) and throw on failure —
    * the batch equivalent of the reference's failing Airflow task. */
  def requireNoNulls(df: DataFrame, columns: Seq[String]): DataFrame = {
    val (observed, get) = observeNulls(df, columns)
    observed.count()
    get().foreach { case (c, n) =>
      if (n > 0) throw NullCheckFailure(c, n)
    }
    df
  }
}
