package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 batch 18: concentration measurement.
  *
  *  - `x6_gini`: Gini coefficient of `events.value` per event type —
  *    the concentration/inequality metric (is the value mass spread
  *    evenly or held by a few events?). Data-mixture balance and
  *    source-concentration audits use exactly this shape. Rank
  *    formulation G = 2·Σ(rank·v) / (n·Σv) − (n+1)/n with the rank
  *    sums in EXACT decimal (rank·dec2(v)); only the final
  *    normalization chain is IEEE, mirrored on both engines.
  *
  * Scale posture: one rank window over the per-type partitioning +
  * one keyed aggregate — the same budget as every other per-type
  * statistic here. (At 100 TB with heavy groups, the histogram trick
  * of x6_median_mode applies whenever value cardinality is bounded:
  * Gini from a value histogram is a prefix-sum over distinct values.)
  */
object Parity31 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "x6_gini" -> { (s, d) =>
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value").asc, col("event_id").asc)
      events(s, d)
        .select(col("event_type"), col("event_id"), col("value"))
        .withColumn("rnk", row_number().over(w))
        .withColumn("v", Exact.dec2(col("value")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("rnk") * col("v")).cast("double").as("s1"),
          sum(col("v")).cast("double").as("s0"))
        .select(col("event_type"), col("n"),
          round(lit(2.0) * col("s1") /
            (col("n").cast("double") * col("s0")) -
            (col("n").cast("double") + 1.0) / col("n").cast("double"), 10)
            .as("gini"))
    }
  )

  val oracles: Map[String, String] = Map(
    "x6_gini" ->
      """WITH r AS (
           SELECT event_type,
                  CAST(value AS DECIMAL(18,2)) AS v,
                  row_number() OVER (PARTITION BY event_type
                    ORDER BY value ASC, event_id ASC) AS rnk
           FROM events),
         a AS (SELECT event_type, count(*) AS n,
                 CAST(sum(rnk * v) AS DOUBLE) AS s1,
                 CAST(sum(v) AS DOUBLE) AS s0
               FROM r GROUP BY event_type)
         SELECT event_type, n,
                round(2.0 * s1 / (CAST(n AS DOUBLE) * s0)
                  - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 10)
                  AS gini
         FROM a"""
  )
}
