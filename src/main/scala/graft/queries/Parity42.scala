package graft.queries

import graft.Tables._
import graft.ops.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Round-11 batch 11: differential-privacy release and forecast
  * backtesting — FULL-equality DuckDB oracles.
  *
  *  - `x7_dp_counts`: ε-DP Laplace-noised histogram release of the
  *    per-type event counts — the privacy-preserving publication op
  *    next to x4_kanon (k-anonymity suppresses, DP perturbs). The
  *    Laplace draw is DETERMINISTIC: u = polyHash60('dp:'+key)/2^60
  *    is the uniform, inverse-CDF −b·sign(u−½)·ln(1−2|u−½|) is the
  *    noise — one draw per released cell (the correct practice
  *    shape) and bit-replayable in SQL. `n_true` rides along as
  *    oracle scaffolding only; the RELEASED artifact is the noised
  *    column (clamped at 0, integer-rounded).
  *  - `x5_backtest_snaive`: seasonal-naive forecast backtest —
  *    forecast(t) = value(t−7) vs naive forecast(t) = value(t−1),
  *    scored by MAE and MAPE over the evaluation window per event
  *    type. THE baseline every forecasting deployment must beat;
  *    absolute errors stay exact decimal, per-row MAPE ratios
  *    quantize to DECIMAL(18,10) before the order-free sum.
  *
  * Scale posture: both run on the (type × day) aggregate of the
  * event stream — the heavy stage is the one map-side-combined
  * grouped mean the monitoring family already pays; everything after
  * is metadata-sized. The DP release is one map over the released
  * cells (noise is per-cell, not per-row).
  */
object Parity42 {
  type Q = (SparkSession, String) => DataFrame

  private val NsPerDay = 86400L * 1000000000L
  /** DP epsilon (Laplace scale b = 1/eps for a count query of
    * sensitivity 1). */
  private val Eps = 1.0
  private val Pow60 = math.pow(2.0, 60)

  val queries: Map[String, Q] = Map(
    // ---- epsilon-DP Laplace count release --------------------------
    "x7_dp_counts" -> { (s, d) =>
      val counts = events(s, d).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_true"))
      val u = TextOps.polyHash60(concat(lit("dp:"), col("event_type")))
        .cast(DoubleType) / lit(Pow60)
      val v = u - lit(0.5)
      val noise = lit(-1.0 / Eps) * signum(v) *
        log(lit(1.0) - lit(2.0) * abs(v))
      counts
        .select(col("event_type"), col("n_true"),
          round(u, 10).as("u_draw"),
          round(noise, 8).as("noise"),
          greatest(lit(0L),
            round(col("n_true").cast(DoubleType) + noise, 0)
              .cast("long")).as("n_released"))
        .orderBy(col("event_type"))
    },

    // ---- seasonal-naive forecast backtest --------------------------
    "x5_backtest_snaive" -> { (s, d) =>
      val daily = eventsNs(s, d)
        .select(col("event_type"), expr(s"ts DIV $NsPerDay").as("day_idx"),
          Exact.dec2(col("value")).as("v"))
        .groupBy(col("event_type"), col("day_idx"))
        .agg((sum(col("v")).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).as("mean_raw"))
        .select(col("event_type"), col("day_idx"),
          round(col("mean_raw"), 6).cast("decimal(18,6)").as("x"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day_idx"))
      val fc = daily
        .withColumn("f7", lag(col("x"), 7).over(w))
        .withColumn("f1", lag(col("x"), 1).over(w))
        .filter(col("f7").isNotNull && col("f1").isNotNull)
      // MAE terms stay exact decimal; MAPE per-row ratios quantize
      // to DECIMAL(18,10) so the sum is accumulation-order-free
      fc.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_eval"),
          round(sum(abs(col("x") - col("f7"))).cast(DoubleType) /
            count(lit(1)).cast(DoubleType), 8).as("mae_snaive"),
          round(sum(abs(col("x") - col("f1"))).cast(DoubleType) /
            count(lit(1)).cast(DoubleType), 8).as("mae_naive1"),
          round(sum(round(abs(col("x") - col("f7")).cast(DoubleType) /
              col("x").cast(DoubleType), 10).cast("decimal(18,10)"))
            .cast(DoubleType) /
            count(lit(1)).cast(DoubleType), 8).as("mape_snaive"))
        .withColumn("snaive_wins",
          when(col("mae_snaive") < col("mae_naive1"), 1L).otherwise(0L))
        .orderBy(col("event_type"))
    })

  /** DuckDB polyHash60 (Parity20 idiom). */
  private def hx15(e: String): String = OracleSql.hx15(e)

  val oracles: Map[String, String] = Map(
    "x7_dp_counts" ->
      s"""WITH counts AS (SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_true
           FROM events GROUP BY event_type),
         draws AS (SELECT event_type, n_true,
             CAST(${hx15("'dp:' || event_type")} AS DOUBLE) /
               ${Pow60.toLong}.0 AS u
           FROM counts),
         noised AS (SELECT event_type, n_true, u,
             (-1.0 / $Eps) * sign(u - 0.5) *
               ln(1.0 - 2.0 * abs(u - 0.5)) AS noise
           FROM draws)
         SELECT event_type, n_true, round(u, 10) AS u_draw,
           round(noise, 8) AS noise,
           greatest(CAST(0 AS BIGINT),
             CAST(round(CAST(n_true AS DOUBLE) + noise, 0) AS BIGINT))
             AS n_released
         FROM noised ORDER BY event_type""",
    "x5_backtest_snaive" ->
      s"""WITH daily AS (SELECT event_type,
             epoch_us(ts) * 1000 // $NsPerDay AS day_idx,
             CAST(round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) /
               CAST(count(*) AS DOUBLE), 6) AS DECIMAL(18,6)) AS x
           FROM events GROUP BY event_type, 2),
         fc AS (SELECT event_type, day_idx, x,
             lag(x, 7) OVER w AS f7, lag(x, 1) OVER w AS f1
           FROM daily
           WINDOW w AS (PARTITION BY event_type ORDER BY day_idx)),
         ev AS (SELECT * FROM fc WHERE f7 IS NOT NULL AND f1 IS NOT NULL),
         agg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_eval,
             round(CAST(sum(abs(x - f7)) AS DOUBLE) /
               CAST(count(*) AS DOUBLE), 8) AS mae_snaive,
             round(CAST(sum(abs(x - f1)) AS DOUBLE) /
               CAST(count(*) AS DOUBLE), 8) AS mae_naive1,
             round(CAST(sum(CAST(round(CAST(abs(x - f7) AS DOUBLE) /
                 CAST(x AS DOUBLE), 10) AS DECIMAL(18,10))) AS DOUBLE) /
               CAST(count(*) AS DOUBLE), 8) AS mape_snaive
           FROM ev GROUP BY event_type)
         SELECT event_type, n_eval, mae_snaive, mae_naive1, mape_snaive,
           CASE WHEN mae_snaive < mae_naive1 THEN CAST(1 AS BIGINT)
             ELSE CAST(0 AS BIGINT) END AS snaive_wins
         FROM agg ORDER BY event_type"""
  )
}
