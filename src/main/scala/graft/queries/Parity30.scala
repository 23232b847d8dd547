package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Round-10 batch 17: robust statistics, distribution profiling, and
  * retention planning — FULL-equality DuckDB oracles.
  *
  *  - `x6_mad_outliers`: median-absolute-deviation outlier detection
  *    per event type (robust z-score: |v - median| > 3·MAD) — the
  *    robust sibling of x5_burst_detect's mean±3σ (one wild value
  *    cannot move the median the way it moves the mean). Both
  *    medians use the explicit middle-rank formulation
  *    (x6_median_mode's idiom), exact in both engines.
  *  - `x6_qq_deciles`: decile-by-decile quantile-quantile comparison
  *    of the click vs view value distributions (ntile(10) boundary
  *    per cohort) — the full-profile companion to x6_ks_test's
  *    single max-gap statistic.
  *  - `x1_ttl_plan`: retention/TTL delete planning — per-type
  *    retention windows against the stream's max event time, emitting
  *    the per-(type, day) delete manifest a lakehouse DELETE job
  *    executes. The storage-lifecycle sibling of x8_compaction_plan.
  *
  * Scale posture: MAD is two rank windows over the per-type
  * partitioning (at 100 TB: the histogram form when value cardinality
  * is bounded — x6_median_mode — or a t-digest when approximate is
  * acceptable; this query is the exact-rank reference). QQ runs the
  * same per-cohort windows once. The TTL plan aggregates to
  * (type, day)-sized output and its cutoffs broadcast.
  */
object Parity30 {
  type Q = (SparkSession, String) => DataFrame

  private val NsPerDay = 86400L * 1000000000L

  /** Exact per-group median of `v` via middle ranks: avg of the
    * values at ranks (n+1)/2 and (n+2)/2. */
  private def medians(df: DataFrame, grp: String, v: String,
      out: String): DataFrame = {
    val w = Window.partitionBy(col(grp)).orderBy(col(v).asc)
    df.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col(grp))))
      .filter(col("rn") === expr("(n + 1) DIV 2") ||
        col("rn") === expr("(n + 2) DIV 2"))
      .groupBy(col(grp))
      .agg((sum(col(v)).cast("double") / count(lit(1))).as(out))
  }

  val queries: Map[String, Q] = Map(
    // ---- MAD robust outliers --------------------------------------
    "x6_mad_outliers" -> { (s, d) =>
      val ev = events(s, d).select(col("event_type"), col("value"))
      val med = medians(ev, "event_type", "value", "med")
      val dev = ev.join(broadcast(med), Seq("event_type"))
        .withColumn("adev", abs(col("value") - col("med")))
      val mad = medians(dev, "event_type", "adev", "mad")
      dev.join(broadcast(mad), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(round(first(col("med")), 10).as("med"),
          round(first(col("mad")), 10).as("mad"),
          sum(when(col("adev") > lit(3.0) * col("mad"), 1L).otherwise(0L))
            .as("n_outliers"),
          count(lit(1)).as("n_rows"))
    },
    // ---- quantile-quantile deciles --------------------------------
    "x6_qq_deciles" -> { (s, d) =>
      def deciles(et: String, out: String): DataFrame = {
        val w = Window.partitionBy(lit(1))
          .orderBy(col("value").asc, col("event_id").asc)
        events(s, d).filter(col("event_type") === et)
          .select(col("event_id"), col("value"))
          .withColumn("dec", ntile(10).over(w))
          .groupBy(col("dec")).agg(max(col("value")).as(out))
      }
      deciles("click", "q_click")
        .join(deciles("view", "q_view"), Seq("dec"))
        .select(col("dec").cast(IntegerType).as("decile"),
          col("q_click"), col("q_view"),
          round(col("q_click") - col("q_view"), 10).as("qq_diff"))
    },
    // ---- TTL retention planning -----------------------------------
    "x1_ttl_plan" -> { (s, d) =>
      val retentionDays = when(col("event_type") === "error", 7L)
        .when(col("event_type").isin("click", "view"), 14L)
        .otherwise(25L)
      val ev = eventsNs(s, d)
        .select(col("event_type"), col("ts"),
          expr(s"ts DIV $NsPerDay").as("day_idx"),
          retentionDays.as("keep_days"))
      val mx = ev.agg(max(col("ts")).as("max_ts"))
      ev.crossJoin(broadcast(mx))
        .filter(col("ts") < col("max_ts") - col("keep_days") * NsPerDay)
        .groupBy(col("event_type"), col("day_idx"))
        .agg(count(lit(1)).as("n_expired"))
    }
  )

  val oracles: Map[String, String] = Map(
    "x6_mad_outliers" ->
      """WITH ev AS (SELECT event_type, value AS v FROM events),
         r AS (SELECT event_type, v,
                 row_number() OVER (PARTITION BY event_type ORDER BY v ASC)
                   AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n
               FROM ev),
         med AS (SELECT event_type,
                   CAST(sum(v) AS DOUBLE) / count(*) AS med
                 FROM r WHERE rn = (n+1)//2 OR rn = (n+2)//2
                 GROUP BY event_type),
         dev AS (SELECT ev.event_type, abs(v - med) AS adev, med
                 FROM ev JOIN med USING (event_type)),
         r2 AS (SELECT event_type, adev,
                  row_number() OVER (PARTITION BY event_type
                    ORDER BY adev ASC) AS rn,
                  count(*) OVER (PARTITION BY event_type) AS n
                FROM dev),
         mad AS (SELECT event_type,
                   CAST(sum(adev) AS DOUBLE) / count(*) AS mad
                 FROM r2 WHERE rn = (n+1)//2 OR rn = (n+2)//2
                 GROUP BY event_type)
         SELECT d.event_type,
                round(any_value(d.med), 10) AS med,
                round(any_value(m.mad), 10) AS mad,
                CAST(sum(CASE WHEN d.adev > 3.0 * m.mad THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_outliers,
                count(*) AS n_rows
         FROM dev d JOIN mad m USING (event_type)
         GROUP BY d.event_type""",
    "x6_qq_deciles" ->
      """WITH ck AS (
           SELECT ntile(10) OVER (ORDER BY value ASC, event_id ASC) AS dec,
                  value FROM events WHERE event_type = 'click'),
         vw AS (
           SELECT ntile(10) OVER (ORDER BY value ASC, event_id ASC) AS dec,
                  value FROM events WHERE event_type = 'view'),
         ca AS (SELECT dec, max(value) AS q_click FROM ck GROUP BY dec),
         va AS (SELECT dec, max(value) AS q_view FROM vw GROUP BY dec)
         SELECT CAST(dec AS INTEGER) AS decile, q_click, q_view,
                round(q_click - q_view, 10) AS qq_diff
         FROM ca JOIN va USING (dec)""",
    "x1_ttl_plan" ->
      s"""WITH ev AS (
            SELECT event_type, epoch_us(ts) * 1000 AS ts,
                   epoch_us(ts) * 1000 // $NsPerDay AS day_idx,
                   CASE WHEN event_type = 'error' THEN 7
                        WHEN event_type IN ('click', 'view') THEN 14
                        ELSE 25 END AS keep_days
            FROM events),
          mx AS (SELECT max(ts) AS max_ts FROM ev)
          SELECT event_type, day_idx, count(*) AS n_expired
          FROM ev, mx
          WHERE ts < max_ts - keep_days * $NsPerDay
          GROUP BY event_type, day_idx"""
  )
}
