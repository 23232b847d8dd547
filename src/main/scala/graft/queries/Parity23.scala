package graft.queries

import graft.Tables._
import graft.ops.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Round-10 batch 10: model fitting, rank statistics, lexical
  * diversity, and layout diagnostics — all FULL-equality DuckDB
  * oracles.
  *
  *  - `x6_ols_group`: per-group ordinary-least-squares fit
  *    (extendedprice ~ quantity per returnflag): slope, intercept,
  *    r² from exact decimal moment sums, one mirrored IEEE tail.
  *    The GROUPED model-fit primitive (the x6_corr_exact machinery,
  *    completed into a regression).
  *  - `x6_mannwhitney`: Mann–Whitney U rank-sum test between the
  *    click/view cohorts with exact midrank tie handling — the
  *    nonparametric sibling of x6_ab_welch (no normality assumption;
  *    the robust A/B test for skewed LLM-quality metrics).
  *  - `x4_entropy`: per-document token Shannon entropy + type-token
  *    ratio — the lexical-diversity quality signal (gibberish has
  *    low entropy per length; boilerplate has low TTR).
  *  - `x8_overlap_depth`: zone-map interval-overlap sweep — max
  *    number of files whose [min,max] clustering-key ranges overlap
  *    at any point. THE metric that decides whether a table needs
  *    re-clustering (depth 1 = perfectly sorted files; depth = n
  *    files = fully overlapping, every range query reads everything).
  *
  * Scale posture: OLS and Mann–Whitney reduce to keyed/grouped
  * aggregates (map-side partials) plus, for MW, one cumulative
  * window over DISTINCT values (same bounded shape as x6_ks_test —
  * quantize to bins at 100 TB). Entropy is one explode + two keyed
  * aggregates per doc, all map-local by doc_id. Overlap depth
  * aggregates per-file boundaries (file-count-sized — thousands of
  * rows for a 100 TB table) then one ordered prefix sum over them.
  */
object Parity23 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- grouped OLS fit ------------------------------------------
    "x6_ols_group" -> { (s, d) =>
      val x = Exact.dec2(col("l_quantity"))
      val y = Exact.dec2(col("l_extendedprice"))
      lineitem(s, d).groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).cast("double").as("n"),
          sum(x).cast("double").as("sx"),
          sum(y).cast("double").as("sy"),
          sum(x * x).cast("double").as("sxx"),
          sum(y * y).cast("double").as("syy"),
          sum(x * y).cast("double").as("sxy"))
        .select(col("l_returnflag"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")), 10).as("slope"),
          round((col("sy") - (col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")) * col("sx")) /
            col("n"), 10).as("intercept"),
          round(
            ((col("n") * col("sxy") - col("sx") * col("sy")) *
              (col("n") * col("sxy") - col("sx") * col("sy"))) /
              ((col("n") * col("sxx") - col("sx") * col("sx")) *
                (col("n") * col("syy") - col("sy") * col("sy"))), 10)
            .as("r2"),
          col("n").cast(LongType).as("n_rows"))
    },
    // ---- Mann-Whitney U rank-sum test -----------------------------
    "x6_mannwhitney" -> { (s, d) =>
      val pts = events(s, d)
        .filter(col("event_type").isin("click", "view"))
        .select(col("value").as("v"),
          when(col("event_type") === "click", 1L).otherwise(0L).as("isa"),
          when(col("event_type") === "view", 1L).otherwise(0L).as("isb"))
      val c = pts.groupBy(col("v"))
        .agg(sum(col("isa")).as("ca"), (sum(col("isa")) + sum(col("isb"))).as("ct"))
      // midrank = (#strictly-below) + (ties + 1) / 2
      val w = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val ranked = c.select(col("ca"), col("ct"),
        (coalesce(sum(col("ct")).over(w), lit(0L)).cast("double") +
          (col("ct").cast("double") + 1.0) / 2.0).as("midrank"))
      val tot = pts.agg(sum(col("isa")).as("na"), sum(col("isb")).as("nb"))
      ranked.crossJoin(broadcast(tot))
        .agg(
          round(sum(col("ca").cast("double") * col("midrank")) -
            first(col("na")).cast("double") *
              (first(col("na")).cast("double") + 1.0) / 2.0, 6).as("u_stat"),
          first(col("na")).as("na"), first(col("nb")).as("nb"))
    },
    // ---- lexical diversity ----------------------------------------
    "x4_entropy" -> { (s, d) =>
      val toks = documents(s, d)
        .select(col("doc_id"),
          explode(TextOps.tokens(lower(col("text")))).as("tok"))
      val perTok = toks.groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("c"))
      val wDoc = Window.partitionBy(col("doc_id"))
      val withP = perTok.withColumn("p",
        col("c").cast("double") / sum(col("c")).over(wDoc).cast("double"))
      withP.groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_tokens"),
          count(lit(1)).as("n_types"),
          round(-sum(col("p") * log2(col("p"))), 10).as("entropy"))
        .select(col("doc_id"), col("n_tokens"), col("n_types"),
          round(col("n_types").cast("double") /
            col("n_tokens").cast("double"), 10).as("ttr"),
          col("entropy"))
    },
    // ---- layout: interval-overlap depth ---------------------------
    "x8_overlap_depth" -> { (s, d) =>
      val files = lineitem(s, d)
        .select(expr("l_orderkey DIV 1024").as("file_id"), col("l_shipdate"))
        .groupBy(col("file_id"))
        .agg(min(col("l_shipdate")).as("mn"), max(col("l_shipdate")).as("mx"))
      // closed-interval sweep: +1 at mn, -1 at mx; at equal positions
      // the +1 sorts first so touching intervals count as overlapping
      val bounds = files.select(col("mn").as("pos"), lit(1L).as("delta"))
        .unionAll(files.select(col("mx").as("pos"), lit(-1L).as("delta")))
      val w = Window.orderBy(col("pos"), col("delta").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      bounds.select(sum(col("delta")).over(w).as("depth"))
        .agg(max(col("depth")).as("max_depth"))
        .crossJoin(files.agg(count(lit(1)).as("n_files")))
    }
  )

  val oracles: Map[String, String] = Map(
    "x6_ols_group" ->
      """WITH m AS (SELECT l_returnflag,
           CAST(count(*) AS DOUBLE) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
             * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
             * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 10) AS slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,
             10) AS intercept,
           round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 10) AS r2,
           CAST(n AS BIGINT) AS n_rows
         FROM m""",
    "x6_mannwhitney" ->
      """WITH pts AS (
           SELECT value AS v,
                  CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS isa,
                  CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS isb
           FROM events WHERE event_type IN ('click', 'view')),
         c AS (SELECT v, sum(isa) AS ca, sum(isa) + sum(isb) AS ct
               FROM pts GROUP BY v),
         r AS (SELECT ca, ct,
                 CAST(coalesce(sum(ct) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS DOUBLE)
                   + (CAST(ct AS DOUBLE) + 1.0) / 2.0 AS midrank
               FROM c),
         tot AS (SELECT CAST(sum(isa) AS BIGINT) AS na,
                        CAST(sum(isb) AS BIGINT) AS nb FROM pts)
         SELECT round(sum(CAST(ca AS DOUBLE) * midrank)
                  - any_value(CAST(na AS DOUBLE))
                    * (any_value(CAST(na AS DOUBLE)) + 1.0) / 2.0,
                  6) AS u_stat,
                any_value(na) AS na, any_value(nb) AS nb
         FROM r, tot""",
    "x4_entropy" ->
      """WITH toks AS (
           SELECT doc_id,
                  unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
           FROM documents),
         pt AS (SELECT doc_id, tok, count(*) AS c
                FROM toks GROUP BY doc_id, tok),
         pp AS (SELECT doc_id, c,
                  CAST(c AS DOUBLE) / CAST(sum(c) OVER
                    (PARTITION BY doc_id) AS DOUBLE) AS p
                FROM pt),
         agg AS (SELECT doc_id,
                   CAST(sum(c) AS BIGINT) AS n_tokens,
                   count(*) AS n_types,
                   round(-sum(p * log2(p)), 10) AS entropy
                 FROM pp GROUP BY doc_id)
         SELECT doc_id, n_tokens, n_types,
                round(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE),
                  10) AS ttr,
                entropy
         FROM agg""",
    "x8_overlap_depth" ->
      """WITH files AS (
           SELECT l_orderkey // 1024 AS file_id,
                  min(l_shipdate) AS mn, max(l_shipdate) AS mx
           FROM lineitem GROUP BY 1),
         bounds AS (
           SELECT mn AS pos, CAST(1 AS BIGINT) AS delta FROM files
           UNION ALL
           SELECT mx AS pos, CAST(-1 AS BIGINT) AS delta FROM files),
         sweep AS (
           SELECT CAST(sum(delta) OVER (ORDER BY pos, delta DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS depth
           FROM bounds)
         SELECT CAST((SELECT max(depth) FROM sweep) AS BIGINT) AS max_depth,
                (SELECT count(*) FROM files) AS n_files"""
  )
}
