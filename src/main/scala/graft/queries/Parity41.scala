package graft.queries

import graft.Tables._
import graft.ops.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Round-11 batch 10: classifier-agreement measurement and survival
  * analysis — FULL-equality DuckDB oracles.
  *
  *  - `x4_kappa`: Cohen's kappa between the heuristic language
  *    classifier (`TextOps.langId`) and the ground-truth `lang`
  *    column — THE chance-corrected agreement metric for validating
  *    any cheap classifier against labels before trusting it on
  *    100 TB (raw accuracy lies when classes are imbalanced). The
  *    full confusion matrix rides along; all cells integer, kappa is
  *    one mirrored IEEE tail.
  *  - `x5_kaplan_meier`: Kaplan–Meier survival curve over per-user
  *    ACTIVITY STREAKS (maximal consecutive-day runs, the
  *    gaps-and-islands relation) — a streak ending before the
  *    horizon is an observed "death", one touching the horizon is
  *    right-censored (the whole point of the product-limit
  *    estimator: naive mean streak length is biased low by exactly
  *    those). Per event time: at-risk count from a cumulative
  *    window, hazard 1 − d/n, and S(t) via exact DECIMAL-quantized
  *    ln-terms (the product becomes an order-free sum; one mirrored
  *    exp at the end; a d = n step pins S to exactly 0 thereafter
  *    instead of feeding ln(0)).
  *
  * Scale posture: kappa is one map (the packed single-pass stopword
  * scorer) + one grouped count; the confusion matrix is
  * (langs × langs)-sized. Kaplan–Meier aggregates the event stream
  * to per-user lifetimes (one keyed aggregate — the sessionize
  * shuffle family), and every window after that runs on the
  * lifetime-value relation, which is DAYS-sized, not users-sized,
  * after the group-by: metadata windows, no global sort of users.
  */
object Parity41 {
  type Q = (SparkSession, String) => DataFrame

  private val NsPerDay = 86400L * 1000000000L

  val queries: Map[String, Q] = Map(
    // ---- Cohen's kappa for the language classifier -----------------
    "x4_kappa" -> { (s, d) =>
      val pred = documents(s, d).select(col("lang"),
        TextOps.langId(col("text")).as("lang_pred"))
      val cells = pred.groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n"))
      val rows = cells.groupBy(col("lang"))
        .agg(sum(col("n")).as("row_total"))
      val cols = cells.groupBy(col("lang_pred"))
        .agg(sum(col("n")).as("col_total"))
      val joined = cells.join(rows, Seq("lang"))
        .join(cols, Seq("lang_pred"))
      val tot = joined.agg(
        sum(col("n")).as("n_total"),
        sum(when(col("lang") === col("lang_pred"), col("n"))
          .otherwise(0L)).as("n_agree"))
      // pe needs sum over LABELS of row·col — aggregate the per-label
      // products once (rows ⋈ cols on the label), not per cell
      val pe = rows.join(cols, col("lang") === col("lang_pred"))
        .agg(sum(col("row_total") * col("col_total")).as("rc_sum"))
      val k = tot.crossJoin(broadcast(pe))
        .select(col("n_total"), col("n_agree"),
          round(col("n_agree").cast(DoubleType) /
            col("n_total").cast(DoubleType), 8).as("po"),
          round(col("rc_sum").cast(DoubleType) /
            (col("n_total").cast(DoubleType) *
              col("n_total").cast(DoubleType)), 8).as("pe"))
        .select(col("n_total"), col("n_agree"), col("po"), col("pe"),
          round((col("po") - col("pe")) / (lit(1.0) - col("pe")), 8)
            .as("kappa"))
      joined.crossJoin(broadcast(k))
        .select(col("lang"), col("lang_pred"), col("n"),
          col("row_total"), col("col_total"), col("po"), col("pe"),
          col("kappa"))
        .orderBy(col("lang"), col("lang_pred"))
    },

    // ---- Kaplan-Meier survival of activity streaks -----------------
    "x5_kaplan_meier" -> { (s, d) =>
      val ud = eventsNs(s, d)
        .select(col("user_id"), expr(s"ts DIV $NsPerDay").as("day"))
        .distinct()
      // gaps-and-islands: a streak is a maximal run of consecutive
      // active days (day - row_number is constant inside a run)
      val isl = ud.withColumn("grp", col("day") -
          row_number().over(Window.partitionBy(col("user_id"))
            .orderBy(col("day"))).cast("long"))
        .groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("t"), max(col("day")).as("last_day"))
      val horizon = ud.agg(max(col("day")).as("h"))
      val lab = isl.crossJoin(broadcast(horizon))
        .select(col("t"),
          when(col("last_day") === col("h"), 0L).otherwise(1L)
            .as("churned"))
      val allt = lab.groupBy(col("t")).agg(count(lit(1)).as("n_t"))
        .withColumn("cum_lt", coalesce(sum(col("n_t")).over(
          Window.orderBy(col("t"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val times = lab.filter(col("churned") === 1)
        .groupBy(col("t")).agg(count(lit(1)).as("d"))
      val nTot = lab.agg(count(lit(1)).as("n_users"))
      val steps = times.join(allt.select(col("t"), col("cum_lt")), Seq("t"))
        .crossJoin(broadcast(nTot))
        .select(col("t"), col("d"),
          (col("n_users") - col("cum_lt")).as("n_risk"))
        .withColumn("zero_step",
          when(col("d") === col("n_risk"), 1L).otherwise(0L))
        // ln(1 − d/n) quantized to DECIMAL makes the product-limit an
        // ORDER-FREE sum; d = n would be ln(0) — flagged instead
        .withColumn("ln_term",
          when(col("zero_step") === 0,
            round(log(lit(1.0) - col("d").cast(DoubleType) /
              col("n_risk").cast(DoubleType)), 12)
              .cast("decimal(18,12)")))
      val w = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      steps
        .withColumn("any_zero", max(col("zero_step")).over(w))
        .withColumn("cum_ln", sum(col("ln_term")).over(w))
        .select(col("t"), col("n_risk"), col("d"),
          round(lit(1.0) - col("d").cast(DoubleType) /
            col("n_risk").cast(DoubleType), 8).as("factor"),
          when(col("any_zero") === 1, lit(0.0))
            .otherwise(round(exp(col("cum_ln").cast(DoubleType)), 8))
            .as("s_t"))
        .orderBy(col("t"))
    })

  val oracles: Map[String, String] = Map(
    "x4_kappa" ->
      """WITH tk AS (SELECT doc_id, lang, text,
           string_split_regex(trim(lower(text)), '\s+') AS t
         FROM documents),
      sc AS (SELECT doc_id, lang,
        CAST(len(list_filter(t, x -> x IN ('the','and','of','is','with'))) AS DOUBLE) AS s_en,
        CAST(len(list_filter(t, x -> x IN ('le','la','les','et','est'))) AS DOUBLE) AS s_fr,
        CAST(len(list_filter(t, x -> x IN ('el','los','las','es','y'))) AS DOUBLE) AS s_es,
        CAST(len(list_filter(t, x -> x IN ('der','die','das','und','ist'))) AS DOUBLE) AS s_de,
        CAST(length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS DOUBLE) AS s_zh
        FROM tk),
      pred AS (SELECT lang,
        CASE WHEN greatest(s_en, s_fr, s_es, s_de, s_zh) <= 0 THEN 'en'
             WHEN s_en >= s_fr AND s_en >= s_es AND s_en >= s_de AND s_en >= s_zh THEN 'en'
             WHEN s_fr >= s_es AND s_fr >= s_de AND s_fr >= s_zh THEN 'fr'
             WHEN s_es >= s_de AND s_es >= s_zh THEN 'es'
             WHEN s_de >= s_zh THEN 'de'
             ELSE 'zh' END AS lang_pred
        FROM sc),
      cells AS (SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
        FROM pred GROUP BY lang, lang_pred),
      r AS (SELECT lang, CAST(sum(n) AS BIGINT) AS row_total
        FROM cells GROUP BY lang),
      c AS (SELECT lang_pred, CAST(sum(n) AS BIGINT) AS col_total
        FROM cells GROUP BY lang_pred),
      tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total,
          CAST(sum(CASE WHEN lang = lang_pred THEN n ELSE 0 END)
            AS BIGINT) AS n_agree
        FROM cells),
      pe0 AS (SELECT CAST(sum(r.row_total * c.col_total) AS BIGINT)
          AS rc_sum
        FROM r JOIN c ON r.lang = c.lang_pred),
      k AS (SELECT n_total, n_agree,
          round(CAST(n_agree AS DOUBLE) / CAST(n_total AS DOUBLE), 8)
            AS po,
          round(CAST(rc_sum AS DOUBLE) /
            (CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE)), 8) AS pe
        FROM tot CROSS JOIN pe0),
      k2 AS (SELECT n_total, n_agree, po, pe,
          round((po - pe) / (1.0 - pe), 8) AS kappa FROM k)
      SELECT cells.lang, cells.lang_pred, cells.n, r.row_total,
        c.col_total, k2.po, k2.pe, k2.kappa
      FROM cells
      JOIN r ON cells.lang = r.lang
      JOIN c ON cells.lang_pred = c.lang_pred
      CROSS JOIN k2
      ORDER BY cells.lang, cells.lang_pred""",
    "x5_kaplan_meier" ->
      s"""WITH ud AS (SELECT DISTINCT user_id,
             epoch_us(ts) * 1000 // $NsPerDay AS day FROM events),
         isl0 AS (SELECT user_id, day,
             day - CAST(row_number() OVER (PARTITION BY user_id
               ORDER BY day) AS BIGINT) AS grp
           FROM ud),
         isl AS (SELECT user_id, grp, CAST(count(*) AS BIGINT) AS t,
             max(day) AS last_day
           FROM isl0 GROUP BY user_id, grp),
         h AS (SELECT max(day) AS h FROM ud),
         lab AS (SELECT t,
             CASE WHEN last_day = h.h THEN 0 ELSE 1 END AS churned
           FROM isl CROSS JOIN h),
         allt AS (SELECT t, CAST(count(*) AS BIGINT) AS n_t FROM lab
           GROUP BY t),
         allc AS (SELECT t, coalesce(CAST(sum(n_t) OVER (ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS BIGINT), 0) AS cum_lt
           FROM allt),
         times AS (SELECT t, CAST(count(*) AS BIGINT) AS d FROM lab
           WHERE churned = 1 GROUP BY t),
         ntot AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM lab),
         steps AS (SELECT times.t, times.d,
             ntot.n_users - allc.cum_lt AS n_risk
           FROM times JOIN allc ON times.t = allc.t CROSS JOIN ntot),
         terms AS (SELECT t, d, n_risk,
             CASE WHEN d = n_risk THEN 1 ELSE 0 END AS zero_step,
             CASE WHEN d <> n_risk THEN CAST(round(ln(1.0 -
               CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)), 12)
               AS DECIMAL(18,12)) END AS ln_term
           FROM steps),
         cum AS (SELECT t, d, n_risk,
             max(zero_step) OVER w AS any_zero,
             sum(ln_term) OVER w AS cum_ln
           FROM terms
           WINDOW w AS (ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT t, n_risk, d,
           round(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE), 8)
             AS factor,
           CASE WHEN any_zero = 1 THEN 0.0
             ELSE round(exp(CAST(cum_ln AS DOUBLE)), 8) END AS s_t
         FROM cum ORDER BY t"""
  )
}
