package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 batch 15: last-observation-carried-forward gap fill.
  *
  *  - `x5_locf`: per-user LOCF — 'error' events null out the reading
  *    and the last valid observation carries forward (the sensor/
  *    feature-store gap-fill primitive; the step-function sibling of
  *    x5_interpolate's linear fill). `last(_, ignoreNulls)` over a
  *    (ts, event_id)-ordered per-user window ≡ DuckDB's
  *    `last_value(x IGNORE NULLS)` — exact value equality, no
  *    arithmetic.
  *
  * Scale posture: one keyed window over the user partitioning the
  * event pipeline already shuffles by; LOCF state is one value per
  * partition row — no second pass, no self-join formulation.
  */
object Parity28 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "x5_locf" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      eventsNs(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          when(col("event_type") =!= "error", col("value")).as("reading"))
        .withColumn("filled", last(col("reading"), ignoreNulls = true).over(w))
        .select(col("event_id"), col("user_id"), col("reading"),
          col("filled"))
    }
  )

  val oracles: Map[String, String] = Map(
    "x5_locf" ->
      """WITH e AS (
           SELECT event_id, user_id, ts,
                  CASE WHEN event_type <> 'error' THEN value END AS reading
           FROM events)
         SELECT event_id, user_id, reading,
                last_value(reading IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS filled
         FROM e"""
  )
}
