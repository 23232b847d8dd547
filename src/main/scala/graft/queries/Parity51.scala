package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Round-11 batch 20: embedding-space drift monitoring —
  * FULL-equality DuckDB oracle.
  *
  *  - `x3_embed_drift`: mean-embedding (MMD-lite) distance between
  *    every pair of label groups — the embedding-space counterpart
  *    of the token-space drift rows (x6_kl_drift / x6_psi): when a
  *    new data batch's centroid walks away from the reference
  *    corpus's, retrieval and dedup thresholds silently rot, and the
  *    pairwise mean-distance matrix is the monitor that catches it.
  *    Per (label, dim): exact decimal component sums; the mean is
  *    ONE mirrored IEEE division quantized back to DECIMAL(18,9)
  *    (the established idiom), so the pairwise Σ(μa−μb)² is exact
  *    decimal again with a single rounded double at the end.
  *
  * Scale posture: one map-side-combined (label × dim) aggregate over
  * the exploded embedding stream (the only corpus-sized stage), then
  * everything runs on the (labels × dim) mean relation — metadata.
  * The pair join is labels²-sized. At 100 TB the same two-stage
  * shape holds; with milllions of groups the pair stage becomes the
  * ANN problem this repo's index family already covers.
  */
object Parity51 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "x3_embed_drift" -> { (s, d) =>
      val comp = embeddings(s, d)
        .select(col("label"), posexplode(col("embedding"))
          .as(Seq("dim", "x")))
        .select(col("label"), col("dim"),
          col("x").cast(DoubleType).cast("decimal(18,6)").as("xq"))
      val means = comp.groupBy(col("label"), col("dim"))
        .agg(sum(col("xq")).as("sx"), count(lit(1)).as("n"))
        .select(col("label"), col("dim"),
          round(col("sx").cast(DoubleType) / col("n").cast(DoubleType), 9)
            .cast("decimal(18,9)").as("mu"))
      val a = means.select(col("label").as("la"), col("dim"),
        col("mu").as("ma"))
      val b = means.select(col("label").as("lb"), col("dim"),
        col("mu").as("mb"))
      a.join(b, Seq("dim")).filter(col("la") < col("lb"))
        .groupBy(col("la"), col("lb"))
        .agg(sum((col("ma") - col("mb")) * (col("ma") - col("mb")))
          .as("d2"))
        .select(col("la"), col("lb"),
          round(col("d2").cast(DoubleType), 8).as("mean_dist2"))
        .orderBy(col("la"), col("lb"))
    })

  val oracles: Map[String, String] = Map(
    "x3_embed_drift" ->
      """WITH comp AS (SELECT label,
             generate_subscripts(embedding, 1) AS dim,
             CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(18,6))
               AS xq
           FROM embeddings),
         means AS (SELECT label, dim,
             CAST(round(CAST(sum(xq) AS DOUBLE) /
               CAST(count(*) AS DOUBLE), 9) AS DECIMAL(18,9)) AS mu
           FROM comp GROUP BY label, dim),
         p AS (SELECT a.label AS la, b.label AS lb,
             sum((a.mu - b.mu) * (a.mu - b.mu)) AS d2
           FROM means a JOIN means b
             ON a.dim = b.dim AND a.label < b.label
           GROUP BY a.label, b.label)
         SELECT la, lb, round(CAST(d2 AS DOUBLE), 8) AS mean_dist2
         FROM p ORDER BY la, lb"""
  )
}
