package graft.queries

import java.nio.file.{Files, Paths}

import graft.Tables._
import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 batch: steady-state ANN — the two index-amortized forms
  * the round-10 verdict asked for.
  *
  *  - `x3_knn_graph_ann`: the kNN GRAPH built with IVF lists
  *    ([[graft.ops.Similarity.ivfKnnGraph]]) instead of exact
  *    label-blocked all-pairs (`x3_knn_graph`). Every vector probes
  *    its nProbe nearest k-means lists; candidates join on the list
  *    id — n·nProbe·(n/nLists) candidate pairs, sub-quadratic with
  *    nLists ∝ √n, vs Θ(Σ block²) for the exact graph. Bounded
  *    oracle: exact k-th-neighbor cosine over the WHOLE corpus for a
  *    deterministic probe sample (vec_id % 97 == 0) as the DuckDB
  *    value assertion, plus a recall@k >= 0.8 boolean over that
  *    sample (RecallSpec pins the same floor against the full exact
  *    graph; measured 1.00 at the harness params).
  *  - `x3_ann_pq_search`: steady-state PQ search over a PERSISTED
  *    index — codebooks + encoded codes written once per corpus (the
  *    minhash-index pattern) and read back from parquet, so the
  *    measured cost is the probe-side work only: LUT build, slim
  *    (sub, code) ADC join, shortlist rerank. `x3_ann_pq` keeps
  *    measuring the end-to-end train+encode+search path; the pair
  *    separates one-time index build from the per-batch search cost a
  *    production loop actually pays. Same bounded oracle as
  *    x3_ann_pq (same probes, same recall floor).
  *
  * Scale posture: the graph build shuffles on cent_id/probe_id only
  * and its candidate space is list-size-bounded by construction; the
  * PQ index is n·m rows of three ints on disk — probes never touch
  * full vectors except for the shortlist rerank.
  */
object Parity32 {
  type Q = (SparkSession, String) => DataFrame

  /** nLists=8 tracks the corpus's ~10 natural label clusters; 16
    * splinters clusters across sibling lists the probe ranking never
    * reaches (measured recall wall: 0.70-0.87 at nLists=16 for ANY
    * nProbe <= 8, vs 0.92-1.0 at nLists=8/nProbe=6 across sf0.01 and
    * sf0.1). At corpus scale nLists grows ∝ √n with nProbe fixed —
    * the list count should track cluster count, which is the thing
    * that grows with a real corpus. */
  private val GraphK = 3
  private val GraphLists = 8
  private val GraphProbes = 6
  /** Deterministic probe sample for the graph's bounded oracle. */
  private val ProbeMod = 97L

  /** Per-corpus PQ index location (build-if-absent, then read-only —
    * Bench's min-of-2 passes therefore measure the steady state). */
  private[graft] def pqIndexDir(d: String): String =
    "target/pq_index_" + d.replaceAll("[^A-Za-z0-9.]+", "_")

  val queries: Map[String, Q] = Map(
    // ---- ANN-backed kNN graph --------------------------------------
    "x3_knn_graph_ann" -> { (s, d) =>
      val emb = embeddings(s, d)
      val cents = Similarity.kmeansCentroids(emb, k = GraphLists, iters = 3)
      val graph = Similarity.ivfKnnGraph(emb, k = GraphK,
        nLists = GraphLists, nProbe = GraphProbes, centroids = Some(cents))
      val probes = emb.filter(col("vec_id") % ProbeMod === 0)
      Similarity.recallChecked(graph, emb, probes, k = GraphK, floor = 0.8)
    },

    // ---- steady-state PQ search over a persisted index -------------
    "x3_ann_pq_search" -> { (s, d) =>
      val emb = embeddings(s, d)
      val probes = emb.filter(col("vec_id") < 3)
      val idxDir = pqIndexDir(d)
      if (!Files.exists(Paths.get(s"$idxDir/codes.parquet"))) {
        Similarity.pqCodebooks(emb, dim = 64, m = 8, ksub = 16, iters = 2)
          .write.mode("overwrite").parquet(s"$idxDir/codebooks.parquet")
        Similarity.pqEncode(emb, dim = 64,
            s.read.parquet(s"$idxDir/codebooks.parquet"), m = 8)
          .write.mode("overwrite").parquet(s"$idxDir/codes.parquet")
      }
      val books = s.read.parquet(s"$idxDir/codebooks.parquet")
      val codes = s.read.parquet(s"$idxDir/codes.parquet")
      val ann = Similarity.pqSearch(codes, books, emb, probes,
        dim = 64, m = 8, k = 5, shortlist = 100)
      Similarity.recallChecked(ann, emb, probes, k = 5, floor = 0.8)
    })

  /** annRecallOracle with a parametrized probe predicate and k. */
  private def recallOracle(probeWhere: String, k: Int): String =
    s"""WITH ex AS (SELECT vec_id,
             CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(18,6)) AS x,
             generate_subscripts(embedding, 1) AS i
           FROM embeddings),
      n2 AS (SELECT vec_id, sum(x * x) AS n2 FROM ex GROUP BY vec_id),
      px AS (SELECT vec_id AS probe_id, i, x AS p FROM ex
             WHERE $probeWhere),
      dots AS (SELECT px.probe_id, e.vec_id AS id, sum(e.x * px.p) AS d
           FROM ex e JOIN px ON e.i = px.i AND e.vec_id <> px.probe_id
           GROUP BY px.probe_id, e.vec_id),
      scored AS (SELECT dots.probe_id, dots.id,
             CAST(CAST(d AS DOUBLE) /
                  (sqrt(CAST(nb.n2 AS DOUBLE)) * sqrt(CAST(np.n2 AS DOUBLE)))
               AS DOUBLE) AS cosine_sim
           FROM dots
           JOIN n2 nb ON nb.vec_id = dots.id
           JOIN n2 np ON np.vec_id = dots.probe_id),
      ranked AS (SELECT *, row_number() OVER (PARTITION BY probe_id
             ORDER BY cosine_sim DESC, id ASC) AS rk FROM scored)
      SELECT probe_id, cosine_sim AS kth_exact_cos, TRUE AS recall_ok
      FROM ranked WHERE rk = $k ORDER BY probe_id"""

  val oracles: Map[String, String] = Map(
    "x3_knn_graph_ann" ->
      recallOracle(s"vec_id % $ProbeMod = 0", GraphK),
    "x3_ann_pq_search" -> ExtQueries.annRecallOracle
  )
}
