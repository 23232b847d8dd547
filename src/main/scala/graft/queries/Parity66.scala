package graft.queries

import graft.Tables._
import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-14: Matryoshka-style dimension-truncation retrieval audit.
  *
  * `x3_dim_truncation`: retrieval quality of PREFIX-dimension
  * embeddings — for each probe, exact top-K by scaled-integer inner
  * product over the first {8, 16, 32, 64} components, scored as
  * overlap against the full-dim (64) ground-truth top-K. This is THE
  * operating curve behind Matryoshka/truncation deployments (store
  * 64 dims, search the first 16, re-rank survivors at full width):
  * it prices how much retrieval signal the embedding prefix carries,
  * the same way x3_ann_recall_curve prices nProbe. Everything stays
  * in the quantized-long contract (micro-unit components, BIGINT
  * dots, vec_id tie-break), so ranks — and therefore overlaps —
  * replay bit-for-bit in SQL.
  *
  * Scale posture: probes are O(1) by construction; each dim budget is
  * one map-only slice+dot pass over the corpus (probe vectors
  * broadcast) feeding a per-(probe, dims) bounded top-K — the
  * x3_brute_topk shape × |budgets|. At 100 TB the same audit runs on
  * an md5-sampled corpus slice (the measurement needs a sample, not
  * the corpus), and the production SEARCH path for the chosen budget
  * is the existing IVF/PQ machinery over truncated vectors.
  */
object Parity66 {
  type Q = (SparkSession, String) => DataFrame

  private val K = 10
  private val Probes = 5
  private val DimBudgets = Seq(8, 16, 32, 64)

  /** Core audit over any (vec_id, embedding) frame — split out so the
    * spec can plant prefix-signal/suffix-signal corpora. */
  private[graft] def truncationAudit(emb: DataFrame): DataFrame = {
      val corpus = emb
        .select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
      val probes = corpus.filter(col("vec_id") < Probes)
        .select(col("vec_id").as("probe_id"), col("q").as("pq"))
      val pairs = corpus.crossJoin(broadcast(probes))
        .filter(col("vec_id") =!= col("probe_id"))
      val perDim = DimBudgets.map { dims =>
        pairs.select(col("probe_id"), col("vec_id"),
          lit(dims.toLong).as("dims"),
          Similarity.dotScaled(slice(col("q"), 1, dims),
            slice(col("pq"), 1, dims)).as("ip"))
      }.reduce(_ unionAll _)
      val top = perDim.withColumn("rk", row_number().over(
          Window.partitionBy(col("probe_id"), col("dims"))
            .orderBy(col("ip").desc, col("vec_id"))).cast("long"))
        .filter(col("rk") <= K)
      val truth = top.filter(col("dims") === DimBudgets.last)
        .select(col("probe_id"), col("vec_id"), lit(1L).as("hit"))
      top.join(truth, Seq("probe_id", "vec_id"), "left")
        .groupBy(col("probe_id"), col("dims"))
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_overlap"))
        .select(col("probe_id"), col("dims"), col("n_overlap"),
          expr(s"1000 * n_overlap DIV $K").as("recall_milli"))
        .orderBy(col("probe_id"), col("dims"))
  }

  val queries: Map[String, Q] = Map(
    "x3_dim_truncation" -> { (s, d) => truncationAudit(embeddings(s, d)) })

  val oracles: Map[String, String] = Map(
    "x3_dim_truncation" ->
      s"""WITH ex AS (SELECT vec_id,
              CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(18,6)) AS x,
              generate_subscripts(embedding, 1) AS i
            FROM embeddings),
          qx AS (SELECT vec_id, i, CAST(x * 1000000 AS BIGINT) AS q
            FROM ex),
          px AS (SELECT vec_id AS probe_id, i, q AS pq FROM qx
            WHERE vec_id < $Probes),
          dims AS (SELECT unnest([${DimBudgets.mkString(", ")}]) AS dims),
          dots AS (SELECT px.probe_id, e.vec_id, dims.dims,
              CAST(sum(CASE WHEN e.i <= dims.dims
                THEN e.q * px.pq ELSE 0 END) AS BIGINT) AS ip
            FROM qx e JOIN px ON e.i = px.i AND e.vec_id <> px.probe_id
            CROSS JOIN dims
            GROUP BY px.probe_id, e.vec_id, dims.dims),
          top AS (SELECT probe_id, vec_id, dims,
              CAST(row_number() OVER (PARTITION BY probe_id, dims
                ORDER BY ip DESC, vec_id) AS BIGINT) AS rk
            FROM dots QUALIFY rk <= $K),
          truth AS (SELECT probe_id, vec_id FROM top
            WHERE dims = ${DimBudgets.last})
          SELECT t.probe_id, CAST(t.dims AS BIGINT) AS dims,
            CAST(count(tr.vec_id) AS BIGINT) AS n_overlap,
            CAST(1000 * count(tr.vec_id) // $K AS BIGINT) AS recall_milli
          FROM top t LEFT JOIN truth tr
            ON t.probe_id = tr.probe_id AND t.vec_id = tr.vec_id
          GROUP BY t.probe_id, t.dims
          ORDER BY t.probe_id, t.dims"""
  )
}
