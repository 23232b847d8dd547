package graft.queries

import graft.Tables._
import graft.ops.{Connect, Dedup, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Round-12 batch 7: soft dedup and the ANN operating curve.
  *
  *  - `x2_soft_dedup`: duplication-aware example REWEIGHTING (the
  *    SoftDeDup idea — arXiv:2407.06654 — and the `1/cluster_size`
  *    weighting RedPajama-v2/DataComp pipelines apply): instead of
  *    DROPPING near-duplicates (x2_cc_dedup's compaction), every doc
  *    keeps a training weight of 1e6 DIV near-dup-cluster-size, so
  *    each duplicated CONTENT contributes ~one doc's worth of
  *    gradient while tail documents keep weight 1.0. The pair stage
  *    here is `Dedup.ngramJaccardPairs` — the UNCAPPED exact variant
  *    (banded by lang block, all qualifying grams), because the
  *    recursive-CTE DuckDB oracle replays exact pair semantics; at
  *    corpus scale swap in `ngramJaccardPairsCapped` (the df-capped
  *    skew-hardened twin, pinned by its own x2 rows) — one argument,
  *    same downstream CC → size → weight path. Then: connected
  *    components (min-label) → cluster sizes → integer weights.
  *    FULL DuckDB oracle (recursive CTE over the same pair relation).
  *
  *  - `x3_ann_recall_curve`: the IVF OPERATING CURVE — recall@5
  *    against exact top-k as nProbe sweeps 1→16 over k-means-trained
  *    lists. This is the table an ANN deployment is tuned from
  *    (recall vs probe cost), produced in ONE query: the exact top-k
  *    (the ground truth) is computed once, each sweep point is an
  *    equi-join-on-list-id search sharing the same trained centroids,
  *    and the curve rows union. Two structural facts make the row
  *    assertable without pretending float determinism across engines
  *    (the recallChecked bounded-oracle pattern): recall is provably
  *    MONOTONE in nProbe (probing a superset of lists only adds
  *    candidates, and any candidate outranking a true top-k hit is
  *    itself a true top-k hit — both sides break ties identically),
  *    and at nProbe = nLists the search IS exact (recall ≡ 1000). The
  *    driver row carries those assertions + data-derived floors;
  *    Parity58Spec pins the measured per-point recall.
  *
  * Scale posture: soft_dedup adds one csize aggregate + one broadcast
  * join to the pinned CC path (pair generation stays banded/df-capped,
  * never all-pairs). The recall curve's sweep shares one centroid
  * training and one exact-truth pass; each point is an equi-join on
  * list id — cost O(n/nLists · nProbe) per probe, the IVF claim
  * itself.
  */
object Parity58 {
  type Q = (SparkSession, String) => DataFrame

  private val CurveK = 5
  private val CurveLists = 16
  private val CurveProbeIds = 20
  val CurveNProbes = Seq(1, 2, 4, 8, 16)
  /** Conservative measured-floor per sweep point (milli recall).
    * MEASURED PROPERTY of the harness corpora (the usual bounded-
    * oracle caveat — x3_multiprobe's recall pin has the same shape):
    * observed recall on the driver's seed-42 embeddings was
    * 933/933/933/1000/1000 at sf0.01 and ≥ the floors with ~2×
    * headroom at sf0.001/sf0.1; the floors sit far below those so
    * partition-order variation never flakes them. A REGENERATED
    * corpus could legitimately dip a point under its floor without
    * any engine regression — re-measure (Parity58Spec prints the
    * per-point curve) and relax the floor, don't patch the engine.
    * The two assertions that are corpus-free stay load-bearing:
    * monotone in nProbe, and recall ≡ 1000 at nProbe = nLists. */
  val CurveFloors = Map(1 -> 250L, 2 -> 400L, 4 -> 600L, 8 -> 800L,
    16 -> 1000L)

  /** The curve with raw recall values — shared by the driver row
    * (which reduces it to bounded assertions) and the spec (which
    * pins the measured points). One candidate pass serves every tier
    * ([[Similarity.ivfTopKSweep]]); the exact truth is a slim
    * (probe, id) relation recomputed per use, never cached into the
    * shared session. */
  def recallCurve(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val probes = emb.filter(col("vec_id") < CurveProbeIds)
    val cents = Similarity.kmeansCentroids(emb, k = CurveLists, iters = 3)
    val exact = Similarity.exactTopK(emb, probes, CurveK)
      .select(col("probe_id"), col("id"))
    val hits = Similarity.ivfTopKSweep(emb, probes, k = CurveK,
        nLists = CurveLists, nProbes = CurveNProbes,
        centroids = Some(cents))
      .select(col("n_probe"), col("probe_id"), col("id"))
      .join(exact, Seq("probe_id", "id"), "left_semi")
      .groupBy("n_probe").agg(count(lit(1)).as("n_hits"))
    // a tier with zero hits must still report (recall 0), so the
    // sweep anchors on the tier table
    import s.implicits._
    val tiers = CurveNProbes.map(_.toLong).toDF("n_probe")
    tiers.join(hits, Seq("n_probe"), "left")
      .crossJoin(exact.agg(count(lit(1)).as("n_exact")))
      .select(col("n_probe"), col("n_exact"),
        expr("CAST((COALESCE(n_hits, 0) * 1000) DIV n_exact AS BIGINT)")
          .as("recall_milli"))
  }

  val queries: Map[String, Q] = Map(
    // ---- duplication-aware soft reweighting ------------------------
    "x2_soft_dedup" -> { (s, d) =>
      val pairs = Dedup.ngramJaccardPairs(documents(s, d), tau = 0.5,
        blockCol = "lang")
      val comp = Connect.connectedComponents(pairs, "id_a", "id_b")
      val docs = documents(s, d)
        .join(comp, col("doc_id") === col("id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("comp"), col("doc_id")).as("comp"))
      val sizes = docs.groupBy("comp").agg(count(lit(1)).as("csize"))
      docs.join(broadcast(sizes), Seq("comp"))
        .select(col("doc_id"), col("comp"),
          col("csize").cast(LongType).as("csize"),
          expr("1000000 DIV csize").as("w_micro"))
        .orderBy("doc_id")
    },

    // ---- IVF recall-vs-nProbe operating curve ----------------------
    "x3_ann_recall_curve" -> { (s, d) =>
      val floors = CurveFloors.toSeq.sortBy(_._1)
        .map { case (np, f) => (np.toLong, f) }
      val fl = s.createDataFrame(floors).toDF("n_probe", "floor_milli")
      recallCurve(s, d)
        .join(broadcast(fl), Seq("n_probe"))
        .withColumn("prev",
          lag(col("recall_milli"), 1).over(Window.orderBy(col("n_probe"))))
        .select(col("n_probe"), col("n_exact").cast(LongType).as("n_exact"),
          (col("recall_milli") >= col("floor_milli")).cast(LongType)
            .as("floor_ok"),
          (col("recall_milli") >= coalesce(col("prev"), lit(0L)))
            .cast(LongType).as("mono_ok"),
          (col("n_probe") =!= lit(16L) ||
            col("recall_milli") === lit(1000L)).cast(LongType)
            .as("exact_at_full"))
        .orderBy("n_probe")
    })

  val oracles: Map[String, String] = Map(
    "x2_soft_dedup" -> s"""
      WITH RECURSIVE pairs AS (${ExtQueries.oracles("x2_ngram_jaccard")}),
      edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                UNION SELECT id_b, id_a FROM pairs),
      nodes AS (SELECT DISTINCT a AS id FROM edges),
      reach(id, lbl) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.id),
      comp AS (SELECT id, min(lbl) AS comp FROM reach GROUP BY id),
      dc AS (SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS comp
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
      sz AS (SELECT comp, CAST(count(*) AS BIGINT) AS csize
        FROM dc GROUP BY comp)
      SELECT dc.doc_id, dc.comp, sz.csize,
        1000000 // sz.csize AS w_micro
      FROM dc JOIN sz USING (comp) ORDER BY dc.doc_id""",
    // bounded oracle (the recallChecked pattern): n_exact is
    // data-derived (every probe has >= k neighbors in this corpus, so
    // exact top-k carries probes*k rows); the booleans are required
    // TRUE by the monotonicity/exhaustive-probe arguments above plus
    // measured floors with margin
    "x3_ann_recall_curve" -> """
      WITH p AS (SELECT count(*) AS np FROM embeddings WHERE vec_id < 20),
      sweep AS (SELECT unnest([1, 2, 4, 8, 16]) AS n_probe)
      SELECT CAST(n_probe AS BIGINT) AS n_probe,
        CAST(np * 5 AS BIGINT) AS n_exact,
        CAST(1 AS BIGINT) AS floor_ok,
        CAST(1 AS BIGINT) AS mono_ok,
        CAST(1 AS BIGINT) AS exact_at_full
      FROM sweep CROSS JOIN p ORDER BY n_probe"""
  )
}
