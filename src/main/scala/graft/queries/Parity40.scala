package graft.queries

import graft.Tables._
import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Round-11 batch 9: changepoint localization, mixture rebalancing,
  * and similarity-threshold calibration — FULL-equality DuckDB
  * oracles.
  *
  *  - `x5_changepoint`: single-changepoint localization per event
  *    type by binary segmentation over the daily-mean series — for
  *    every split k, SSE(left) + SSE(right) from exact decimal
  *    prefix sums (one mirrored IEEE tail per split), argmin by
  *    struct-min with a deterministic tie. The LOCALIZATION
  *    companion to x6_cusum (which detects drift but does not place
  *    it): reduction vs the unsplit SSE says how real the break is.
  *  - `x7_mixture_plan`: dataset mixture rebalancing — given a
  *    uniform target share per source, the per-source sampling rate
  *    min(1, target/actual), expected post-sample rows, and the
  *    deficit flag for under-represented sources that cap at 1.
  *    THE SlimPajama/Pile-style source-weighting op a pretraining
  *    data pipeline runs before sampling; one-pass semantics
  *    (no deficit redistribution), documented as such.
  *  - `x3_cos_histogram`: the embedding-similarity decile table —
  *    within-label pair cosines binned at 0.1, with descending
  *    cumulative pair counts. The calibration table that picks
  *    SemDeDup's τ the way `x2_lsh_scurve` picks the text banding:
  *    measured corpus property, not folklore. Exact scaled-long
  *    cosines make the bin edges engine-stable.
  *
  * Scale posture: changepoint runs on the (type × day) aggregate —
  * the window chain sits entirely inside the type partitioning and
  * the split grid is day-count-sized. The mixture plan is one
  * grouped count + a broadcast total. The cosine histogram rides the
  * SAME label-blocked pair join as x3_neardup_pairs (block-bounded
  * by construction; at 100 TB the same table is computed over
  * SemDeDup's data-chosen clusters or a stratified pair sample —
  * machinery unchanged) and aggregates to ≤ 20 bins.
  */
object Parity40 {
  type Q = (SparkSession, String) => DataFrame

  private val NsPerDay = 86400L * 1000000000L

  val queries: Map[String, Q] = Map(
    // ---- binary-segmentation changepoint ---------------------------
    "x5_changepoint" -> { (s, d) =>
      val daily = eventsNs(s, d)
        .select(col("event_type"), expr(s"ts DIV $NsPerDay").as("day_idx"),
          Exact.dec2(col("value")).as("v"))
        .groupBy(col("event_type"), col("day_idx"))
        .agg((sum(col("v")).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).as("mean_raw"))
        .select(col("event_type"), col("day_idx"),
          round(col("mean_raw"), 6).cast("decimal(18,6)").as("x"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day_idx"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val pre = daily
        .withColumn("k", row_number().over(
          Window.partitionBy(col("event_type")).orderBy(col("day_idx")))
          .cast("long"))
        .withColumn("s_k", sum(col("x")).over(w))
        .withColumn("q_k", sum(col("x") * col("x")).over(w))
      val tot = pre.groupBy(col("event_type"))
        .agg(max(col("k")).as("n"), max(col("s_k")).as("s_n"),
          max(col("q_k")).as("q_n"))
      // cost(k) = [Q_k − S_k²/k] + [(Q_n−Q_k) − (S_n−S_k)²/(n−k)];
      // exact decimal sums feed ONE mirrored IEEE tail per split
      val costs = pre.join(tot, Seq("event_type"))
        .filter(col("k") < col("n"))
        .select(col("event_type"), col("k"), col("day_idx"), col("n"),
          col("s_n"), col("q_n"),
          round((col("q_k").cast(DoubleType) -
            col("s_k").cast(DoubleType) * col("s_k").cast(DoubleType) /
              col("k").cast(DoubleType)) +
            ((col("q_n") - col("q_k")).cast(DoubleType) -
              (col("s_n") - col("s_k")).cast(DoubleType) *
              (col("s_n") - col("s_k")).cast(DoubleType) /
              (col("n") - col("k")).cast(DoubleType)), 8).as("cost"))
      val best = costs.groupBy(col("event_type"))
        .agg(min(struct(col("cost"), col("k"), col("day_idx"))).as("m"),
          first(col("n")).as("n"), first(col("s_n")).as("s_n"),
          first(col("q_n")).as("q_n"))
        .select(col("event_type"), col("m.k").as("split_k"),
          col("m.day_idx").as("split_day"), col("m.cost").as("cost_split"),
          col("n"),
          round(col("q_n").cast(DoubleType) -
            col("s_n").cast(DoubleType) * col("s_n").cast(DoubleType) /
              col("n").cast(DoubleType), 8).as("cost_none"))
      best.select(col("event_type"), col("n"), col("split_k"),
          col("split_day"), col("cost_none"), col("cost_split"),
          round(lit(1.0) - col("cost_split") / col("cost_none"), 8)
            .as("sse_reduction"))
        .orderBy(col("event_type"))
    },

    // ---- dataset mixture rebalancing plan --------------------------
    "x7_mixture_plan" -> { (s, d) =>
      val counts = documents(s, d).groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"))
      val tot = counts.agg(sum(col("n_docs")).as("n_total"),
        count(lit(1)).as("n_sources"))
      counts.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_total"),
          // uniform target share: every source gets 1/n_sources of
          // the corpus; target rows stay integer via DIV
          expr("n_total DIV n_sources").as("target_rows"))
        .select(col("source"), col("n_docs"), col("target_rows"),
          round(least(lit(1.0), col("target_rows").cast(DoubleType) /
            col("n_docs").cast(DoubleType)), 8).as("sample_rate"),
          least(col("target_rows"), col("n_docs")).as("expected_rows"),
          when(col("n_docs") < col("target_rows"), 1L).otherwise(0L)
            .as("deficit"))
        .orderBy(col("source"))
    },

    // ---- embedding-cosine decile calibration -----------------------
    "x3_cos_histogram" -> { (s, d) =>
      val pairs = Similarity.cosinePairsBlocked(embeddings(s, d),
        tau = -1.0, blockCol = "label")
      val binned = pairs.select(
        greatest(lit(-10L), least(lit(9L),
          floor(col("cosine_sim") * 10).cast("long"))).as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as("n_pairs"))
      // descending cumulative: pairs a tau at this bin edge keeps
      val cum = binned.withColumn("cum_ge", sum(col("n_pairs")).over(
        Window.orderBy(col("bin").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val tot = binned.agg(sum(col("n_pairs")).as("n_total"))
      cum.crossJoin(broadcast(tot))
        .select(col("bin"),
          round(col("bin").cast(DoubleType) / 10.0, 1).as("tau_edge"),
          col("n_pairs"), col("cum_ge"),
          round(col("cum_ge").cast(DoubleType) /
            col("n_total").cast(DoubleType), 8).as("share_ge"))
        .orderBy(col("bin"))
    })

  val oracles: Map[String, String] = Map(
    "x5_changepoint" ->
      s"""WITH daily AS (SELECT event_type,
             epoch_us(ts) * 1000 // $NsPerDay AS day_idx,
             CAST(round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) /
               CAST(count(*) AS DOUBLE), 6) AS DECIMAL(18,6)) AS x
           FROM events GROUP BY event_type, 2),
         pre AS (SELECT event_type, day_idx, x,
             CAST(row_number() OVER w AS BIGINT) AS k,
             sum(x) OVER w AS s_k,
             sum(x * x) OVER w AS q_k
           FROM daily
           WINDOW w AS (PARTITION BY event_type ORDER BY day_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         tot AS (SELECT event_type, max(k) AS n, max(s_k) AS s_n,
             max(q_k) AS q_n
           FROM pre GROUP BY event_type),
         costs AS (SELECT p.event_type, p.k, p.day_idx, t.n, t.s_n, t.q_n,
             round((CAST(p.q_k AS DOUBLE) -
               CAST(p.s_k AS DOUBLE) * CAST(p.s_k AS DOUBLE) /
                 CAST(p.k AS DOUBLE)) +
               (CAST(t.q_n - p.q_k AS DOUBLE) -
                 CAST(t.s_n - p.s_k AS DOUBLE) *
                 CAST(t.s_n - p.s_k AS DOUBLE) /
                 CAST(t.n - p.k AS DOUBLE)), 8) AS cost
           FROM pre p JOIN tot t ON p.event_type = t.event_type
           WHERE p.k < t.n),
         best AS (SELECT event_type, n, s_n, q_n,
             min(struct_pack(cost := cost, k := k, day_idx := day_idx)) AS m
           FROM costs GROUP BY event_type, n, s_n, q_n),
         ex AS (SELECT event_type, n,
             CAST(m.k AS BIGINT) AS split_k,
             CAST(m.day_idx AS BIGINT) AS split_day,
             m.cost AS cost_split,
             round(CAST(q_n AS DOUBLE) -
               CAST(s_n AS DOUBLE) * CAST(s_n AS DOUBLE) /
                 CAST(n AS DOUBLE), 8) AS cost_none
           FROM best)
         SELECT event_type, n, split_k, split_day, cost_none, cost_split,
           round(1.0 - cost_split / cost_none, 8) AS sse_reduction
         FROM ex ORDER BY event_type""",
    "x7_mixture_plan" ->
      """WITH counts AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
           FROM documents GROUP BY source),
         tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
             CAST(count(*) AS BIGINT) AS n_sources
           FROM counts)
         SELECT source, n_docs,
           CAST(n_total // n_sources AS BIGINT) AS target_rows,
           round(least(1.0, CAST(n_total // n_sources AS DOUBLE) /
             CAST(n_docs AS DOUBLE)), 8) AS sample_rate,
           least(n_total // n_sources, n_docs) AS expected_rows,
           CASE WHEN n_docs < n_total // n_sources
             THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS deficit
         FROM counts CROSS JOIN tot ORDER BY source""",
    "x3_cos_histogram" ->
      """WITH ex AS (SELECT vec_id, label,
             CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(18,6)) AS x,
             generate_subscripts(embedding, 1) AS i
           FROM embeddings),
         qx AS (SELECT vec_id, label, i, CAST(x * 1000000 AS BIGINT) AS q
           FROM ex),
         n2 AS (SELECT vec_id, CAST(sum(q * q) AS BIGINT) AS n2
           FROM qx GROUP BY vec_id),
         dots AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             CAST(sum(a.q * b.q) AS BIGINT) AS d
           FROM qx a JOIN qx b
             ON a.label = b.label AND a.i = b.i AND a.vec_id < b.vec_id
           GROUP BY a.vec_id, b.vec_id),
         cos AS (SELECT CAST(CAST(d AS DOUBLE) /
             (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
             AS DOUBLE) AS c
           FROM dots
           JOIN n2 na ON dots.id_a = na.vec_id
           JOIN n2 nb ON dots.id_b = nb.vec_id),
         binned AS (SELECT greatest(-10, least(9,
             CAST(floor(c * 10) AS BIGINT))) AS bin,
             CAST(count(*) AS BIGINT) AS n_pairs
           FROM cos GROUP BY 1),
         cum AS (SELECT bin, n_pairs,
             CAST(sum(n_pairs) OVER (ORDER BY bin DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_ge
           FROM binned),
         tot AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS n_total
           FROM binned)
         SELECT bin, round(CAST(bin AS DOUBLE) / 10.0, 1) AS tau_edge,
           n_pairs, cum_ge,
           round(CAST(cum_ge AS DOUBLE) / CAST(n_total AS DOUBLE), 8)
             AS share_ge
         FROM cum CROSS JOIN tot ORDER BY bin"""
  )
}
