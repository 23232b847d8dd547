package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Round-12 batch 10: robust trend estimation.
  *
  *  - `x6_theil_sen`: Theil–Sen robust slope of the per-type daily
  *    event volume — the median of ALL pairwise slopes, the standard
  *    outlier-resistant alternative to `x6_ols_group`'s least-squares
  *    line (one corrupted day moves OLS arbitrarily; Theil–Sen
  *    tolerates ~29% contamination). Slopes run over TRUE day gaps
  *    (days since the type's first day, not observation rank) in
  *    exact integer micro units; the median is the deterministic
  *    lower median (rank (n+1) DIV 2 — ties share a value, so the
  *    emitted slope is unique even when row identity is not).
  *
  * Scale posture: the pairwise O(days²) stage runs on the DAY
  * AGGREGATE, never the event stream — the x6_bootstrap_ci claim
  * again: a century of days is ~1.3 M rows per type BEFORE pairing
  * and the pair relation is bounded by the calendar, not the corpus.
  * The event-side cost is one map-side-combinable grouped count.
  */
object Parity61 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "x6_theil_sen" -> { (s, d) =>
      val day = eventsNs(s, d)
        .groupBy(col("event_type"),
          expr("CAST(timestamp_micros(ts DIV 1000) AS DATE)").as("d"))
        .agg(count(lit(1)).as("y"))
      val x = day.withColumn("i",
        datediff(col("d"),
          min(col("d")).over(Window.partitionBy(col("event_type"))))
          .cast(LongType))
      val a = x.select(col("event_type"), col("i").as("ia"),
        col("y").as("ya"))
      val b = x.select(col("event_type").as("et_b"), col("i").as("ib"),
        col("y").as("yb"))
      val sl = a.join(b,
          col("event_type") === col("et_b") && col("ib") > col("ia"))
        .select(col("event_type"),
          expr("((yb - ya) * 1000000) DIV (ib - ia)").as("s"))
      val w = Window.partitionBy(col("event_type"))
      val nd = day.groupBy("event_type")
        .agg(count(lit(1)).cast(LongType).as("n_days"))
      sl.withColumn("rn", row_number().over(w.orderBy(col("s"))))
        .withColumn("n", count(lit(1)).over(w))
        .filter(col("rn") === expr("(n + 1) DIV 2"))
        .join(nd, "event_type")
        .select(col("event_type"), col("n_days"),
          col("n").cast(LongType).as("n_pairs"),
          col("s").cast(LongType).as("slope_micro"))
        .orderBy("event_type")
    })

  val oracles: Map[String, String] = Map(
    "x6_theil_sen" ->
      """WITH day AS (SELECT event_type,
             CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         x AS (SELECT event_type,
             CAST(d - min(d) OVER (PARTITION BY event_type) AS BIGINT)
               AS i, y FROM day),
         sl AS (SELECT a.event_type,
             ((b.y - a.y) * 1000000) // (b.i - a.i) AS s
           FROM x a JOIN x b ON a.event_type = b.event_type
             AND b.i > a.i),
         r AS (SELECT event_type, s,
             row_number() OVER (PARTITION BY event_type ORDER BY s)
               AS rn,
             count(*) OVER (PARTITION BY event_type) AS n FROM sl),
         nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
           FROM day GROUP BY 1)
         SELECT r.event_type, nd.n_days, CAST(n AS BIGINT) AS n_pairs,
           CAST(s AS BIGINT) AS slope_micro
         FROM r JOIN nd USING (event_type)
         WHERE rn = (n + 1) // 2 ORDER BY event_type"""
  )
}
