package graft.queries

import graft.Tables._
import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Round-11 batch 19: pilot-run dedup extrapolation — FULL-equality
  * DuckDB oracle.
  *
  *  - `x2_sample_curve`: how much duplicate mass a PILOT run sees —
  *    near-dup pairs restricted to both-endpoints-sampled document
  *    subsets at nested md5 rates (1, 1/2, 1/4, 1/8), with the
  *    observed scale factor full/found per tier. The planning table
  *    behind "run dedup on 1% first": under uniform sampling a pair
  *    survives with probability rate², so found ≈ full·rate² — the
  *    table shows the measured factor AGAINST the rate⁻² prediction,
  *    and the divergence (clustered duplicates sample together when
  *    they share hash prefixes — they don't here; md5 is uniform) is
  *    the corpus's own answer, not an assumption. Nested samples
  *    (threshold prefixes) make tiers comparable: each tier is a
  *    subset of the previous.
  *
  * Scale posture: ONE pair relation (the dedup pipeline's own
  * inverted-index join) feeds every tier — the tiers are broadcast
  * membership filters, not re-runs; at 100 TB the pilot would
  * instead run on the sampled corpus directly and this table says
  * what to multiply by.
  */
object Parity50 {
  type Q = (SparkSession, String) => DataFrame

  /** nested md5-prefix thresholds: full, 1/2, 1/4, 1/8. */
  private val Tiers = Seq("g0" -> "ff", "g1" -> "7f", "g2" -> "3f",
    "g3" -> "1f")

  val queries: Map[String, Q] = Map(
    "x2_sample_curve" -> { (s, d) =>
      val docs = documents(s, d)
        .select(col("doc_id"), substring(md5(col("doc_id").cast("string")),
          1, 2).as("h"))
      val pairs = Dedup.ngramJaccardPairs(documents(s, d), tau = 0.5,
        blockCol = "lang")
        .join(docs.select(col("doc_id").as("id_a"), col("h").as("ha")),
          Seq("id_a"))
        .join(docs.select(col("doc_id").as("id_b"), col("h").as("hb")),
          Seq("id_b"))
      val tierRows = Tiers.map { case (name, thr) =>
        val nd = docs.filter(col("h") <= thr)
          .agg(count(lit(1)).as("n_docs"))
        val np = pairs.filter(col("ha") <= thr && col("hb") <= thr)
          .agg(count(lit(1)).as("n_pairs"))
        nd.crossJoin(np).select(lit(name).as("tier"),
          lit(thr).as("h_max"), col("n_docs"), col("n_pairs"))
      }
      val all = tierRows.reduce(_ unionAll _)
      val full = all.filter(col("tier") === "g0")
        .select(col("n_docs").as("nd_full"), col("n_pairs").as("np_full"))
      all.crossJoin(broadcast(full))
        .select(col("tier"), col("h_max"), col("n_docs"), col("n_pairs"),
          round(col("n_docs").cast(DoubleType) /
            col("nd_full").cast(DoubleType), 6).as("doc_rate"),
          when(col("n_pairs") > 0,
            round(col("np_full").cast(DoubleType) /
              col("n_pairs").cast(DoubleType), 6)).as("scale_factor"),
          when(col("n_pairs") > 0,
            round(col("np_full").cast(DoubleType) /
              col("n_pairs").cast(DoubleType) *
              (col("n_docs").cast(DoubleType) /
                col("nd_full").cast(DoubleType)) *
              (col("n_docs").cast(DoubleType) /
                col("nd_full").cast(DoubleType)), 6))
            .as("vs_rate2_prediction"))
        .orderBy(col("tier"))
    })

  val oracles: Map[String, String] = Map(
    "x2_sample_curve" -> {
      val tierSql = Tiers.map { case (name, thr) =>
        s"""SELECT '$name' AS tier, '$thr' AS h_max,
           (SELECT CAST(count(*) AS BIGINT) FROM dh
            WHERE h <= '$thr') AS n_docs,
           (SELECT CAST(count(*) AS BIGINT) FROM ph
            WHERE ha <= '$thr' AND hb <= '$thr') AS n_pairs"""
      }.mkString("\nUNION ALL\n")
      s"""WITH pairs AS (${ExtQueries.oracles("x2_ngram_jaccard")}),
      dh AS (SELECT doc_id,
          substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS h
        FROM documents),
      ph AS (SELECT p.id_a, p.id_b, a.h AS ha, b.h AS hb
        FROM pairs p
        JOIN dh a ON p.id_a = a.doc_id
        JOIN dh b ON p.id_b = b.doc_id),
      tiers AS ($tierSql),
      full_t AS (SELECT n_docs AS nd_full, n_pairs AS np_full
        FROM tiers WHERE tier = 'g0')
      SELECT t.tier, t.h_max, t.n_docs, t.n_pairs,
        round(CAST(t.n_docs AS DOUBLE) / CAST(f.nd_full AS DOUBLE), 6)
          AS doc_rate,
        CASE WHEN t.n_pairs > 0 THEN
          round(CAST(f.np_full AS DOUBLE) / CAST(t.n_pairs AS DOUBLE), 6)
        END AS scale_factor,
        CASE WHEN t.n_pairs > 0 THEN
          round(CAST(f.np_full AS DOUBLE) / CAST(t.n_pairs AS DOUBLE) *
            (CAST(t.n_docs AS DOUBLE) / CAST(f.nd_full AS DOUBLE)) *
            (CAST(t.n_docs AS DOUBLE) / CAST(f.nd_full AS DOUBLE)), 6)
        END AS vs_rate2_prediction
      FROM tiers t CROSS JOIN full_t f
      ORDER BY t.tier"""
    })
}
