package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType}

/** Embedding similarity search (SURVEY.md §2.8 X3).
  *
  * Numeric determinism: float components are quantized to
  * decimal(18,6) (exact — floats in the data carry < 6 fractional
  * digits of meaning) and dot products accumulate in decimal, which is
  * associative and exact, so the result is independent of partitioning
  * and accumulation order and bit-matches the DuckDB oracle. Only the
  * final cosine is computed in double (one sqrt + one divide, fixed
  * formula both sides).
  *
  * Scale design: brute-force is a broadcast of the (tiny) probe set
  * against a map-only scan — linear, no shuffle. The ANN path buckets
  * vectors by random-hyperplane LSH sign bits (deterministic
  * pseudo-planes derived from xxhash64) so candidate generation is an
  * equi-join on bucket id.
  */
object Similarity {
  // Accumulator type sized so Add never exceeds Spark's precision cap
  // of 38: (25,12)+(25,12) -> (26,12), no precision loss, scale 12 is
  // preserved exactly. (A (38,12) accumulator would make Add overflow
  // to precision 39 and Catalyst would silently drop the scale —
  // ~1e-11 drift over a 64-term dot product.)
  private val AccT = DecimalType(25, 12)

  // Cast floats through DOUBLE before quantizing: Spark's FLOAT->DECIMAL
  // rounds the float's 7-digit shortest string, DuckDB rounds the full
  // binary expansion — they disagree near .5 boundaries. A float-widened
  // double's 17-digit expansion never sits on a scale-6 boundary, so
  // DOUBLE->DECIMAL(18,6) is identical in both engines.
  private def dec6(c: Column): Column =
    c.cast(DoubleType).cast(DecimalType(18, 6))

  /** Exact decimal dot product of two float/double array columns. */
  def dotExact(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (dec6(x) * dec6(y)).cast(AccT)),
      lit(java.math.BigDecimal.ZERO).cast(AccT),
      (acc, v) => (acc + v).cast(AccT))

  /** Exact decimal squared norm. */
  def norm2Exact(a: Column): Column = dotExact(a, a)

  /** Quantize a vector ONCE into exact micro-unit longs: each
    * component becomes `cast(x as decimal(18,6)) * 1e6` — an integer,
    * so all downstream dot products are plain long arithmetic (fast,
    * codegen-friendly) while staying exactly equal to the decimal
    * formulation: dotExact(a,b) == dotScaled(qa,qb) / 1e12.
    * Range: safe while sum(|x_i*y_i|) < 9.2e6 (long) and each partial
    * < 2^53 for the exact double conversion — embeddings are O(1). */
  def quantize(vec: Column): Column =
    transform(vec, x => (dec6(x) * lit(1000000)).cast("long"))

  /** Long dot product over micro-unit vectors (exact integer).
    * Native one-loop expression — this sits on the pair side of every
    * similarity join, so it runs O(pairs) times; the HOF fallback
    * below exists for the bit-compatibility cross-check in OpsSpec. */
  def dotScaled(qa: Column, qb: Column): Column =
    graft.functions.DotLongs.dot_longs(qa, qb)

  /** Built-in-functions fallback of `dotScaled` (same semantics). */
  def dotScaledHof(qa: Column, qb: Column): Column =
    aggregate(zip_with(qa, qb, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** cosine from scaled-long parts. Each operand below is the
    * correctly-rounded double of the same exact rational the decimal
    * oracle computes (longs < 2^53 are exact in double; one division
    * by 1e12 rounds once, as does DuckDB's CAST(decimal AS DOUBLE)),
    * and the final op tree matches the oracle's formula — so results
    * are bit-identical to the decimal path. */
  def cosineFromScaled(dotL: Column, naL: Column, nbL: Column): Column =
    ((dotL.cast(DoubleType) / lit(1e12)) /
      (sqrt(naL.cast(DoubleType) / lit(1e12)) *
        sqrt(nbL.cast(DoubleType) / lit(1e12)))).cast(DoubleType)

  /** cosine from precomputed parts: exact decimal dot + squared
    * norms, one double sqrt/divide at the end. */
  def cosineFromParts(dot: Column, na2: Column, nb2: Column): Column =
    (dot.cast(DoubleType) /
      (sqrt(na2.cast(DoubleType)) * sqrt(nb2.cast(DoubleType))))
      .cast(DoubleType)

  /** Cosine similarity, deterministic across engines/partitionings.
    * Prefer the precomputed-norm paths below in pair queries — this
    * recomputes both norms per invocation. */
  def cosine(a: Column, b: Column): Column =
    cosineFromParts(dotExact(a, b), norm2Exact(a), norm2Exact(b))

  /** Brute-force top-k nearest neighbours of one probe vector.
    * The probe is joined as a 1-row broadcast (crossJoin) — the scan
    * side never shuffles; global top-k is a TakeOrdered, not a sort.
    * Norms are computed once per row (scan side) / once total (probe),
    * not per comparison. */
  def knnBruteForce(emb: DataFrame, probeId: Long, k: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val probe = broadcast(
      emb.filter(col(idCol) === probeId)
        .select(quantize(col(vecCol)).as("probe_q")))
      .withColumn("probe_n2", dotScaled(col("probe_q"), col("probe_q")))
    emb.filter(col(idCol) =!= probeId)
      .select(col(idCol), quantize(col(vecCol)).as("q"))
      .crossJoin(probe)
      .select(col(idCol),
        cosineFromScaled(
          dotScaled(col("q"), col("probe_q")),
          dotScaled(col("q"), col("q")),
          col("probe_n2")).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** All pairs within a blocking column with cosine >= tau (exact,
    * oracle-checkable; the block join bounds the pair count). Norms
    * are computed once per vector before the pair join — at n rows
    * that is n norm evaluations instead of O(pairs). */
  def cosinePairsBlocked(emb: DataFrame, tau: Double, blockCol: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val t = emb.select(col(idCol).as("id"), col(blockCol).as("blk"),
      quantize(col(vecCol)).as("q"))
      .withColumn("n2", dotScaled(col("q"), col("q")))
    val a = t.select(col("id").as("id_a"), col("blk"),
      col("q").as("q_a"), col("n2").as("n2_a"))
    val b = t.select(col("id").as("id_b"), col("blk"),
      col("q").as("q_b"), col("n2").as("n2_b"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("blk"), col("id_a"), col("id_b"),
        cosineFromScaled(dotScaled(col("q_a"), col("q_b")),
          col("n2_a"), col("n2_b")).as("cosine_sim"))
      .filter(col("cosine_sim") >= tau)
  }

  /** SemDeDup-style embedding dedup with NO natural blocking column
    * (the "semantic deduplication" pipeline shape: cluster, then
    * dedup within clusters): assign every vector to its nearest of
    * `k` deterministic seed centroids (the k smallest-id vectors —
    * reproducible in any engine, unlike trained centroids), find
    * in-cluster pairs with exact cosine >= tau, connect them into
    * components, and report each vector's cluster and min-id
    * component representative (`comp == id` means the vector
    * survives dedup).
    *
    * Scale: the centroid set is k rows -> broadcast; assignment is a
    * map-only broadcast argmax folded into ONE map-side-combinable
    * aggregate (max over (cosine, -centroid) structs — no n×k-row
    * window shuffle). The quadratic pair stage is confined within
    * clusters (sum of c_i² work, the whole point of clustering
    * first), and the component pass is the same O(log d)
    * min-label/large-star machinery as the text CC dedup. All
    * arithmetic is the exact scaled-long cosine, so the full
    * pipeline — assignment, edges, components — replays bit-exactly
    * in the DuckDB oracle. */
  def semDedup(emb: DataFrame, k: Int, tau: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = emb.select(col(idCol).as("id"), quantize(col(vecCol)).as("q"))
      .withColumn("n2", dotScaled(col("q"), col("q")))
    val cent = broadcast(q.filter(col("id") < k)
      .select(col("id").as("cid"), col("q").as("cq"), col("n2").as("cn2")))
    // nearest centroid, ties to the smaller centroid id: one
    // aggregate, no per-vector window
    val assignment = q.crossJoin(cent)
      .select(col("id"), struct(
        cosineFromScaled(dotScaled(col("q"), col("cq")),
          col("n2"), col("cn2")).as("cos"),
        (-col("cid")).as("negcid")).as("sc"))
      .groupBy(col("id"))
      .agg(max(col("sc")).as("m"))
      .select(col("id"), (-col("m.negcid")).as("cluster"))
    val assigned = q.join(assignment, Seq("id"))
    val a = assigned.select(col("cluster"), col("id").as("id_a"),
      col("q").as("q_a"), col("n2").as("n2_a"))
    val b = assigned.select(col("cluster"), col("id").as("id_b"),
      col("q").as("q_b"), col("n2").as("n2_b"))
    val edges = a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .filter(cosineFromScaled(dotScaled(col("q_a"), col("q_b")),
        col("n2_a"), col("n2_b")) >= tau)
      .select(col("id_a"), col("id_b"))
    val comp = Connect.connectedComponents(edges, "id_a", "id_b")
    assignment
      .join(comp, Seq("id"), "left_outer")
      .select(col("id").as(idCol), col("cluster"),
        coalesce(col("comp"), col("id")).as("comp"))
  }

  /** Deterministic pseudo-random hyperplane component for plane j,
    * dimension i: xxhash64 mapped to [-1, 1]. */
  private def planeComponent(j: Column, i: Column): Column =
    (xxhash64(lit("plane"), j, i).cast(DoubleType) /
      lit(Long.MaxValue.toDouble)).cast(DoubleType)

  /** Random-hyperplane LSH bucket id: `nBits` sign bits of dot
    * products against deterministic pseudo-planes. Map-only; native
    * one-loop expression (the HOF fallback below interprets
    * nBits x dim lambda evaluations per row). */
  def lshBucket(vec: Column, dim: Int, nBits: Int = 12): Column =
    graft.functions.LshBucket.lsh_bucket(vec, nBits)

  /** Built-in-functions fallback of `lshBucket` (same buckets,
    * bit-for-bit — pinned in OpsSpec). */
  def lshBucketHof(vec: Column, dim: Int, nBits: Int = 12): Column =
    aggregate(
      sequence(lit(0), lit(nBits - 1)),
      lit(0L),
      (acc, j) => {
        val dot = aggregate(
          sequence(lit(0), lit(dim - 1)),
          lit(0.0),
          (a, i) => a + element_at(vec, i + 1).cast(DoubleType) *
            planeComponent(j, i))
        acc.bitwiseOR(
          when(dot >= 0, call_function("shiftleft", lit(1L), j))
            .otherwise(lit(0L)))
      })

  /** Spherical k-means (Lloyd's) centroid builder for the IVF index:
    * deterministic seeding (the k lowest-id vectors), cosine
    * assignment, per-dimension mean recentering, `iters` rounds.
    *
    * Scale: each round is one broadcast-argmax assignment (map-only;
    * the per-id rank window shuffles on id, same family as the IVF
    * assignment itself) plus a (k·dim)-sized mean aggregate — the
    * centroid table is broadcast state by definition, exactly the
    * k-means shape every ANN build pipeline (FAISS-style IVF
    * training) runs at scale. Lineage is truncated per round so the
    * iterated plan does not grow. An emptied cluster keeps its
    * previous centroid (k never silently shrinks).
    *
    * 100 TB note: pass a deterministic hash sample
    * (`emb.filter(pmod(xxhash64(col(id)), m) === 0)`) as the training
    * frame so training cost is sample-bounded, not corpus-bounded —
    * encoding/search still cover every vector; RecallSpec pins that
    * sampled training keeps the recall floor. */
  def kmeansCentroids(emb: DataFrame, k: Int, iters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding",
      checkpointDir: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    var cents: DataFrame = Iter.truncate(
      emb.orderBy(col(idCol).asc).limit(k)
        .select(col(idCol).as("seed_id"), col(vecCol).as("centroid"))
        .withColumn("cent_id",
          row_number().over(Window.orderBy(col("seed_id"))) - 1)
        .select(col("cent_id"), col("centroid")), checkpointDir)
    val base = emb.select(col(idCol).as("id"),
        quantize(col(vecCol)).as("q"), col(vecCol).as("v"))
      .withColumn("n2", dotScaled(col("q"), col("q")))
    for (_ <- 1 to iters) {
      val cq = broadcast(cents
        .select(col("cent_id"), quantize(col("centroid")).as("cq"))
        .withColumn("cn2", dotScaled(col("cq"), col("cq"))))
      // argmax as a hash aggregate (map-side combine, no per-id sort):
      // max of (sim, -cent_id, payload) structs — the unique -cent_id
      // makes the tie-break deterministic before any array compare
      val assigned = base.crossJoin(cq)
        .withColumn("cent_sim",
          cosineFromScaled(dotScaled(col("q"), col("cq")),
            col("n2"), col("cn2")))
        .groupBy(col("id"))
        .agg(max(struct(col("cent_sim"), (-col("cent_id")).as("nci"),
          col("v"))).as("m"))
        .select((-col("m.nci")).as("cent_id"), col("m.v").as("v"))
      val recentered = assigned
        .select(col("cent_id"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cent_id"), col("pos"))
        .agg(avg(col("x").cast(DoubleType)).as("m"))
        .groupBy(col("cent_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
          .as("pm"))
        .select(col("cent_id"),
          transform(col("pm"), p => p.getField("m")).as("centroid"))
      cents = Iter.truncate(cents.alias("o")
        .join(recentered.alias("n"), Seq("cent_id"), "left")
        .select(col("cent_id"),
          coalesce(col("n.centroid"), col("o.centroid")).as("centroid")),
        checkpointDir)
    }
    cents
  }

  /** IVF-style ANN: partition vectors into `nLists` inverted lists by
    * nearest centroid; probes search only their `nProbe` nearest
    * lists, candidates ranked by exact cosine.
    *
    * Centroids come from `centroids` (schema: cent_id, centroid —
    * typically [[kmeansCentroids]]); when absent, a deterministic
    * sample (the lowest-id vectors) seeds the lists, which is only
    * adequate for ad-hoc probes — trained centroids balance list
    * sizes and recall (RecallSpec measures both).
    *
    * Scale: assignment is a map-only broadcast argmax; the search is
    * an equi-join on list id — cost O(n/nLists · nProbe) per probe
    * instead of O(n).
    *
    * Implemented as the single-tier case of [[ivfTopKSweep]] (one
    * assignment/probe-list/ranking code path — a tie-break fix lands
    * in both, so the sweep-vs-single-tier equivalence the recall
    * curve relies on holds by construction): with one tier every
    * candidate's prk <= nProbe, the tier fan-out is the identity, and
    * the per-(tier, probe) rank degenerates to the per-probe rank. */
  def ivfTopK(emb: DataFrame, probes: DataFrame, k: Int = 10,
      nLists: Int = 16, nProbe: Int = 4,
      centroids: Option[DataFrame] = None, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    ivfTopKSweep(emb, probes, k, nLists, Seq(nProbe), centroids,
      idCol, vecCol)
      .drop("n_probe")

  /** The [[ivfTopK]] SWEEP: top-k at EVERY nProbe tier in one
    * candidate pass. A candidate reached through the probe's p-th
    * nearest list contributes to every tier np >= p, so the sweep
    * materializes the vector assignment and the probe-list ranking
    * ONCE at max(nProbes), tags each candidate with its list's
    * probe-rank, fans the candidate stream out to the tiers it
    * belongs to (a <= |nProbes|-way multiplier on the slim candidate
    * rows, never on the corpus), and ranks per (probe, tier). This is
    * how an operating curve is measured at corpus scale — 5 separate
    * searches would re-assign and re-scan per point. Returns
    * (n_probe, probe_id, id, cosine_sim, rk). */
  def ivfTopKSweep(emb: DataFrame, probes: DataFrame, k: Int,
      nLists: Int, nProbes: Seq[Int], centroids: Option[DataFrame] = None,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val maxProbe = nProbes.max
    val centSrc = centroids.getOrElse(
      emb.orderBy(col(idCol).asc).limit(nLists)
        .select(col(idCol).as("cent_id"), col(vecCol).as("centroid")))
    val cents = broadcast(centSrc
      .select(col("cent_id"), quantize(col("centroid")).as("cq"))
      .withColumn("cn2", dotScaled(col("cq"), col("cq"))))
    val assigned = emb
      .select(col(idCol).as("id"), quantize(col(vecCol)).as("q"))
      .withColumn("n2", dotScaled(col("q"), col("q")))
      .crossJoin(cents)
      .withColumn("cent_sim",
        cosineFromScaled(dotScaled(col("q"), col("cq")), col("n2"), col("cn2")))
      .groupBy(col("id"))
      .agg(max(struct(col("cent_sim"), (-col("cent_id")).as("nci"),
        col("q"), col("n2"))).as("m"))
      .select(col("id"), col("m.q").as("q"), col("m.n2").as("n2"),
        (-col("m.nci")).as("cent_id"))
    val probeW = Window.partitionBy(col("probe_id"))
      .orderBy(col("cent_sim").desc, col("cent_id").asc)
    val probeLists = broadcast(
      probes.select(col(idCol).as("probe_id"), quantize(col(vecCol)).as("pq"))
        .withColumn("pn2", dotScaled(col("pq"), col("pq")))
        .crossJoin(cents)
        .withColumn("cent_sim",
          cosineFromScaled(dotScaled(col("pq"), col("cq")),
            col("pn2"), col("cn2")))
        .withColumn("prk", row_number().over(probeW))
        .filter(col("prk") <= maxProbe)
        .select(col("probe_id"), col("pq"), col("pn2"), col("cent_id"),
          col("prk")))
    val tiers = array(nProbes.sorted.map(np => lit(np.toLong)): _*)
    val rankW = Window.partitionBy(col("n_probe"), col("probe_id"))
      .orderBy(col("cosine_sim").desc, col("id").asc)
    assigned.join(probeLists, Seq("cent_id"))
      .filter(col("id") =!= col("probe_id"))
      .select(col("probe_id"), col("id"), col("prk"),
        cosineFromScaled(dotScaled(col("q"), col("pq")),
          col("n2"), col("pn2")).as("cosine_sim"))
      .withColumn("n_probe",
        explode(filter(tiers, np => np >= col("prk"))))
      .withColumn("rk", row_number().over(rankW))
      .filter(col("rk") <= k)
      .select(col("n_probe"), col("probe_id"), col("id"),
        col("cosine_sim"), col("rk").cast(IntegerType).as("rk"))
  }

  /** IVF k-nearest-neighbor GRAPH: EVERY vector is a probe, so unlike
    * [[ivfTopK]] the probe side cannot broadcast — both sides of the
    * candidate join are corpus-sized, and the join is a plain shuffle
    * equi-join on the list id. Each vector is (a) assigned to its
    * nearest list (broadcast-centroid argmax, map-side hash agg) and
    * (b) given its `nProbe` nearest lists as a probe (rank window
    * partitioned by id — one keyed shuffle); candidates are the
    * vectors in any probed list, ranked by exact cosine with a
    * per-probe top-k window.
    *
    * Scale: candidate pairs are n · nProbe · (n / nLists) — keep
    * nLists ∝ √n (the standard IVF sizing) and the graph build is
    * O(n^1.5 · nProbe / c), sub-quadratic, vs the Θ(Σ block²) of
    * exact label-blocked all-pairs ([[cosinePairsBlocked]], the
    * x3_knn_graph oracle form). Everything shuffles on cent_id /
    * probe_id only; the full vectors travel once as quantized longs.
    * Recall floor vs the exact graph is pinned in RecallSpec and the
    * x3_knn_graph_ann harness row (bounded oracle over a
    * deterministic probe sample). */
  def ivfKnnGraph(emb: DataFrame, k: Int = 10, nLists: Int = 16,
      nProbe: Int = 4, centroids: Option[DataFrame] = None,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centSrc = centroids.getOrElse(
      emb.orderBy(col(idCol).asc).limit(nLists)
        .select(col(idCol).as("cent_id"), col(vecCol).as("centroid")))
    val cents = broadcast(centSrc
      .select(col("cent_id"), quantize(col("centroid")).as("cq"))
      .withColumn("cn2", dotScaled(col("cq"), col("cq"))))
    val base = emb.select(col(idCol).as("id"), quantize(col(vecCol)).as("q"))
      .withColumn("n2", dotScaled(col("q"), col("q")))
    val scoredLists = base.crossJoin(cents)
      .withColumn("cent_sim",
        cosineFromScaled(dotScaled(col("q"), col("cq")), col("n2"), col("cn2")))
    // index side: argmax list per vector (map-side combinable hash agg)
    val assigned = scoredLists
      .groupBy(col("id"))
      .agg(max(struct(col("cent_sim"), (-col("cent_id")).as("nci"),
        col("q"), col("n2"))).as("m"))
      .select(col("id"), col("m.q").as("q"), col("m.n2").as("n2"),
        (-col("m.nci")).as("cent_id"))
    // probe side: top-nProbe lists per vector (keyed rank window —
    // NOT broadcast; this is the difference from ivfTopK)
    val probeW = Window.partitionBy(col("id"))
      .orderBy(col("cent_sim").desc, col("cent_id").asc)
    val probeLists = scoredLists
      .withColumn("prk", row_number().over(probeW))
      .filter(col("prk") <= nProbe)
      .select(col("id").as("probe_id"), col("q").as("pq"),
        col("n2").as("pn2"), col("cent_id"))
    // candidate stream is n · nProbe · listSize scored pairs — far
    // larger than the n·k survivors. Two-phase bounded-heap top-k
    // (graft.plans.TopKPerKey) caps the exchange at k rows per
    // (probe, map partition); the rank window then runs over the
    // n·k-sized result, never the candidate stream. Cosines are
    // exact-integer-derived, so the two-phase reduction is
    // deterministic (total order via the id tie-break).
    val scored = assigned.join(probeLists, Seq("cent_id"))
      .filter(col("id") =!= col("probe_id"))
      .select(col("probe_id"), col("id"),
        cosineFromScaled(dotScaled(col("q"), col("pq")),
          col("n2"), col("pn2")).as("cosine_sim"))
    val top = graft.plans.TopKPerKey.topKPerKeyTwoPhase(scored,
      Seq("probe_id"), Seq(("cosine_sim", true), ("id", false)), k)
    val rankW = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine_sim").desc, col("id").asc)
    top.withColumn("rk", row_number().over(rankW))
      .select(col("probe_id"), col("id"), col("cosine_sim"),
        col("rk").cast(IntegerType).as("rk"))
  }

  /** Explode a (quantized or raw) vector column into `m` contiguous
    * subvector rows: struct(sub, subv). Static unroll — the slice
    * positions are literals, so the explode is codegen'd. */
  private def subSlices(vec: Column, dim: Int, m: Int): Column = {
    val d = dim / m
    explode(array((0 until m).map(sub =>
      struct(lit(sub).as("sub"),
        slice(vec, sub * d + 1, d).as("subv"))): _*))
  }

  /** Product-quantization codebooks: an independent k-means per
    * subspace, all `m` trained in ONE iterated pipeline (the subspace
    * id is just one more grouping key — no per-subspace job).
    * Assignment minimizes exact L2 via the integer form
    * `argmin(||c||^2 - 2 x·c)` on micro-unit longs; recentering is a
    * per-(sub, cent, dim) mean. Deterministic seeding: subvectors of
    * the `ksub` lowest-id vectors. Empty cells keep their previous
    * centroid. Returns (sub, cent_id, centroid: array<double>).
    *
    * Scale: each round is one broadcast join (codebook is m·ksub
    * rows) + two hash aggregates over n·m slim rows; lineage is
    * truncated per round. This is the FAISS-style PQ training shape —
    * the codebook is broadcast state by construction. Like
    * [[kmeansCentroids]], train on a deterministic hash sample at
    * corpus scale (RecallSpec pins the sampled-training floor). */
  def pqCodebooks(emb: DataFrame, dim: Int, m: Int = 4, ksub: Int = 16,
      iters: Int = 2, idCol: String = "vec_id",
      vecCol: String = "embedding",
      checkpointDir: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subs = emb
      .select(col(idCol).as("id"), subSlices(col(vecCol), dim, m).as("s"))
      .select(col("id"), col("s.sub").as("sub"), col("s.subv").as("v"))
      .withColumn("q", quantize(col("v")))
    var books: DataFrame = Iter.truncate(
      emb.orderBy(col(idCol).asc).limit(ksub)
      .select(col(idCol).as("seed_id"), subSlices(col(vecCol), dim, m).as("s"))
      .select(col("seed_id"), col("s.sub").as("sub"),
        col("s.subv").as("centroid"))
      .withColumn("cent_id", row_number().over(
        Window.partitionBy(col("sub")).orderBy(col("seed_id"))) - 1)
      .select(col("sub"), col("cent_id"), col("centroid")), checkpointDir)
    for (_ <- 1 to iters) {
      val cb = broadcast(books
        .select(col("sub"), col("cent_id"), quantize(col("centroid")).as("cq"))
        .withColumn("cn2", dotScaled(col("cq"), col("cq"))))
      // argmin L2 == argmax -(cn2 - 2 dot); ties -> lowest cent_id
      val assigned = subs.join(cb, Seq("sub"))
        .withColumn("negd",
          lit(2L) * dotScaled(col("q"), col("cq")) - col("cn2"))
        .groupBy(col("id"), col("sub"))
        .agg(max(struct(col("negd"), (-col("cent_id")).as("nci"),
          col("v"))).as("m"))
        .select(col("sub"), (-col("m.nci")).as("cent_id"), col("m.v").as("v"))
      val recentered = assigned
        .select(col("sub"), col("cent_id"),
          posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("sub"), col("cent_id"), col("pos"))
        .agg(avg(col("x").cast(DoubleType)).as("mn"))
        .groupBy(col("sub"), col("cent_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("mn"))))
          .as("pm"))
        .select(col("sub"), col("cent_id"),
          transform(col("pm"), p => p.getField("mn")).as("centroid"))
      books = Iter.truncate(books.alias("o")
        .join(recentered.alias("n"), Seq("sub", "cent_id"), "left")
        .select(col("sub"), col("cent_id"),
          coalesce(col("n.centroid"), col("o.centroid")).as("centroid")),
        checkpointDir)
    }
    books
  }

  /** IVF-PQ-style ANN (asymmetric distance computation + exact
    * rerank): vectors are PQ-encoded once into `m` small codes; each
    * probe builds an m·ksub lookup table of exact partial dot
    * products; the approximate inner product of probe and vector is
    * the sum of m LUT hits — computed by a slim equi-join on
    * (sub, code) and a hash aggregate, never touching the full
    * vectors. The top `shortlist` per probe then rerank by EXACT
    * cosine (broadcast of the shortlist ids back onto the vectors).
    *
    * Scale: the encoded index is n·m rows of three ints — the classic
    * PQ memory win (full vectors are read only for the shortlist);
    * assignment/LUT joins broadcast only codebook/probe-sized tables;
    * every aggregate is map-side combinable. All arithmetic is exact
    * integer (micro-unit longs), so shortlists and ranks are
    * partition-order independent. */
  def pqTopK(emb: DataFrame, probes: DataFrame, dim: Int,
      codebooks: DataFrame, m: Int = 4, k: Int = 10, shortlist: Int = 50,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    pqSearch(pqEncode(emb, dim, codebooks, m, idCol, vecCol), codebooks,
      emb, probes, dim, m, k, shortlist, idCol, vecCol)

  /** PQ index build: nearest codebook centroid per (vector, subspace)
    * → m small codes per vector. This is the ONE corpus-sized pass of
    * the PQ pipeline; persist its output (n·m rows of three ints —
    * the classic PQ memory win) next to the codebooks and every later
    * probe batch pays only [[pqSearch]]'s probe-side cost, exactly
    * like the minhash signature index
    * ([[graft.ops.Dedup.minhashIndex]]). */
  def pqEncode(emb: DataFrame, dim: Int, codebooks: DataFrame,
      m: Int = 4, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    // a codebook trained with a different m would silently slice the
    // vectors wrong — the subspace ids are the cheap cross-check
    val cbSubs = codebooks.select(max(col("sub"))).head().getInt(0) + 1
    require(cbSubs == m,
      s"codebooks carry $cbSubs subspaces but m = $m")
    val cb = broadcast(codebooks
      .select(col("sub"), col("cent_id"), quantize(col("centroid")).as("cq"))
      .withColumn("cn2", dotScaled(col("cq"), col("cq"))))
    emb
      .select(col(idCol).as("id"), subSlices(col(vecCol), dim, m).as("s"))
      .select(col("id"), col("s.sub").as("sub"),
        quantize(col("s.subv")).as("q"))
      .join(cb, Seq("sub"))
      .withColumn("negd",
        lit(2L) * dotScaled(col("q"), col("cq")) - col("cn2"))
      .groupBy(col("id"), col("sub"))
      .agg(max(struct(col("negd"), (-col("cent_id")).as("nci"))).as("m"))
      .select(col("id"), col("sub"), (-col("m.nci")).as("code"))
  }

  /** Steady-state PQ search over a PRE-ENCODED index (`codes`: the
    * (id, sub, code) frame [[pqEncode]] emits, typically read back
    * from parquet): per-probe LUT of exact partial dots, ADC scoring
    * via the slim (sub, code) equi-join + hash agg, exact-cosine
    * rerank of the `shortlist`. `emb` is consulted ONLY for the
    * shortlist rerank (and the probe vectors) — the full-vector scan
    * column-prunes to (id, vec), and the candidate set it joins
    * against is shortlist-bounded. */
  def pqSearch(codes: DataFrame, codebooks: DataFrame, emb: DataFrame,
      probes: DataFrame, dim: Int, m: Int = 4, k: Int = 10,
      shortlist: Int = 50, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val cb = broadcast(codebooks
      .select(col("sub"), col("cent_id"), quantize(col("centroid")).as("cq"))
      .withColumn("cn2", dotScaled(col("cq"), col("cq"))))
    val enc = codes
    // per-probe LUT: exact partial dots against every codebook entry
    val lut = broadcast(probes
      .select(col(idCol).as("probe_id"), subSlices(col(vecCol), dim, m).as("s"))
      .select(col("probe_id"), col("s.sub").as("sub"),
        quantize(col("s.subv")).as("pq"))
      .join(cb, Seq("sub"))
      .select(col("probe_id"), col("sub"), col("cent_id").as("code"),
        dotScaled(col("pq"), col("cq")).as("contrib")))
    val approx = enc.join(lut, Seq("sub", "code"))
      .groupBy(col("probe_id"), col("id"))
      .agg(sum(col("contrib")).as("adc"))
      .filter(col("id") =!= col("probe_id"))
    val shortW = Window.partitionBy(col("probe_id"))
      .orderBy(col("adc").desc, col("id").asc)
    val cand = approx.withColumn("srk", row_number().over(shortW))
      .filter(col("srk") <= shortlist)
      .select(col("probe_id"), col("id"))
    // exact rerank of the shortlist only
    val vecs = emb.select(col(idCol).as("id"), quantize(col(vecCol)).as("q"))
      .withColumn("n2", dotScaled(col("q"), col("q")))
    val pvecs = broadcast(
      probes.select(col(idCol).as("probe_id"), quantize(col(vecCol)).as("pq"))
        .withColumn("pn2", dotScaled(col("pq"), col("pq"))))
    val rankW = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine_sim").desc, col("id").asc)
    broadcast(cand).join(vecs, Seq("id"))
      .join(pvecs, Seq("probe_id"))
      .select(col("probe_id"), col("id"),
        cosineFromScaled(dotScaled(col("q"), col("pq")),
          col("n2"), col("pn2")).as("cosine_sim"))
      .withColumn("rk", row_number().over(rankW))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("id"), col("cosine_sim"),
        col("rk").cast(IntegerType).as("rk"))
  }

  /** Exact brute-force top-k for a (small) probe SET — the multi-probe
    * generalization of [[knnBruteForce]]: probes broadcast against one
    * map-only scan, per-probe top-k via rank window (ties by id, so
    * the result is total). This is the recall TRUTH the approximate
    * paths are measured against. */
  def exactTopK(emb: DataFrame, probes: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val prb = broadcast(probes
      .select(col(idCol).as("probe_id"), quantize(col(vecCol)).as("pq"))
      .withColumn("pn2", dotScaled(col("pq"), col("pq"))))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine_sim").desc, col("id").asc)
    emb.select(col(idCol).as("id"), quantize(col(vecCol)).as("q"))
      .withColumn("n2", dotScaled(col("q"), col("q")))
      .crossJoin(prb)
      .filter(col("id") =!= col("probe_id"))
      .select(col("probe_id"), col("id"),
        cosineFromScaled(dotScaled(col("q"), col("pq")),
          col("n2"), col("pn2")).as("cosine_sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("id"), col("cosine_sim"),
        col("rk").cast(IntegerType).as("rk"))
  }

  /** Bounded-oracle wrapper for an approximate top-k result (the
    * x6_approx_sketch pattern, X3 edition): emits one row per probe
    * with the probe's EXACT k-th-neighbor cosine (real value
    * assertion — a DuckDB oracle recomputes it brute-force with the
    * same decimal arithmetic) and a `recall_ok` boolean pinning the
    * ann result's overall recall@k against the exact top-k at
    * `floor`. An ANN regression (bucketing bug, broken rerank, lost
    * table) drops hits below the floor, flips the boolean, and the
    * harness row goes red — so the approximate queries get a value
    * oracle without pretending determinism they don't have. */
  def recallChecked(ann: DataFrame, emb: DataFrame, probes: DataFrame,
      k: Int, floor: Double, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val exact = exactTopK(emb, probes, k, idCol, vecCol)
    val hits = ann.select(col("probe_id"), col("id"))
      .join(exact.select(col("probe_id"), col("id")),
        Seq("probe_id", "id"), "left_semi")
    val ok = hits.agg(count(lit(1)).as("n_hits"))
      .crossJoin(exact.agg(count(lit(1)).as("n_exact")))
      .select((col("n_hits").cast(DoubleType) >=
        col("n_exact").cast(DoubleType) * lit(floor)).as("recall_ok"))
    exact.filter(col("rk") === k)
      .select(col("probe_id"), col("cosine_sim").as("kth_exact_cos"))
      .crossJoin(broadcast(ok))
      .orderBy(col("probe_id"))
  }

  /** ANN top-k for a probe set: multi-table random-hyperplane LSH —
    * both sides hash once into `nTables · nBits` sign bits (ONE native
    * kernel call), the signature is sliced into `nTables` independent
    * `nBits`-bit bucket keys, and a vector is a candidate if it shares
    * a bucket with the probe in ANY table. Candidates dedup and rank
    * by exact cosine.
    *
    * Recall engineering (the standard LSH trade): a single table's
    * per-neighbor hit rate is p^nBits (p = 1 − θ/π for angle θ), which
    * collapses for moderate-similarity neighbors — measured 0.07
    * recall@5 on the sf0.01 gate data at nBits=6. Multi-table lifts it
    * to 1 − (1 − p^nBits)^nTables; RecallSpec pins the measured floor.
    * At 100 TB the cost model: index explodes nTables rows per vector
    * (slim — id + one long each), the join stays an equi-join on
    * (table, bucket), candidates are deduped BEFORE the exact-cosine
    * rank so each (probe, id) pair is scored once.
    *
    * `multiprobe` additionally searches every Hamming-1 bucket variant
    * on the PROBE side only (nTables·(nBits+1) slim broadcast rows per
    * probe; the billion-row index is untouched) — per-table hit rate
    * rises from p^b to p^b + b·p^(b−1)(1−p), which is what makes
    * moderate-similarity neighbors reachable without exploding the
    * table count. */
  def annTopK(emb: DataFrame, probes: DataFrame, dim: Int, k: Int = 10,
      nBits: Int = 8, nTables: Int = 1, multiprobe: Boolean = false,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nBits * nTables <= 63,
      s"nBits*nTables = ${nBits * nTables} exceeds the 63-bit signature")
    val mask = (1L << nBits) - 1
    // one signature holding all tables' bits; slice per table with a
    // static unroll (explode of a literal-struct array, codegen'd)
    def tableBuckets(sig: Column, flips: Boolean = false): Column =
      explode(array((for {
        t <- 0 until nTables
        base = shiftrightunsigned(sig, t * nBits).bitwiseAND(lit(mask))
        b <- -1 until (if (flips) nBits else 0)
      } yield struct(lit(t).as("tbl"),
        (if (b < 0) base else base.bitwiseXOR(lit(1L << b)))
          .as("bucket"))): _*))
    val base = emb.select(col(idCol).as("id"),
      quantize(col(vecCol)).as("q"),
      lshBucket(col(vecCol), dim, nBits * nTables).as("sig"))
      .withColumn("n2", dotScaled(col("q"), col("q")))
      .select(col("id"), col("q"), col("n2"),
        tableBuckets(col("sig")).as("tb"))
      .select(col("id"), col("q"), col("n2"),
        col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val prb = broadcast(
      probes.select(col(idCol).as("probe_id"),
        quantize(col(vecCol)).as("pq"),
        lshBucket(col(vecCol), dim, nBits * nTables).as("sig"))
        .withColumn("pn2", dotScaled(col("pq"), col("pq")))
        .select(col("probe_id"), col("pq"), col("pn2"),
          tableBuckets(col("sig"), flips = multiprobe).as("tb"))
        .select(col("probe_id"), col("pq"), col("pn2"),
          col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine_sim").desc, col("id").asc)
    base.join(prb, Seq("tbl", "bucket"))
      .filter(col("id") =!= col("probe_id"))
      // a pair matching in several tables must score once
      .dropDuplicates("probe_id", "id")
      .select(col("probe_id"), col("id"),
        cosineFromScaled(dotScaled(col("q"), col("pq")),
          col("n2"), col("pn2")).as("cosine_sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("id"), col("cosine_sim"),
        col("rk").cast(IntegerType).as("rk"))
  }

  /** Oracle-replayable LSH ANN twin (the poly-twin pattern, X3
    * edition): the production [[annTopK]] pipeline — sign-projection
    * buckets → candidate equi-join → exact-cosine verify → top-k —
    * with every non-SQL ingredient replaced by replayable
    * arithmetic. Hyperplane "randomness" is the ±1 parity of
    * `polyHash60(bit + ":" + dim)`; projections accumulate in exact
    * micro-unit longs (sign decisions are integer comparisons, no
    * float order-dependence); ties break on id. A DuckDB oracle
    * replays signs, projections, buckets, candidates, and the final
    * cosine ranking step for step (`x3_ann_poly`), so the driver
    * hash-checks an END-TO-END ANN pipeline rather than counting
    * rows. The xxhash64 production path stays the fast variant
    * (single native-kernel signature, no per-(bit,dim) hash table).
    *
    * Scale shape: the sign matrix is nBits×dim rows — broadcast by
    * construction; projection is one explode + two hash aggregates;
    * candidates are an equi-join on bucket. Same posture as annTopK.
    */
  def annTopKPoly(emb: DataFrame, probes: DataFrame, dim: Int,
      nBits: Int = 8, k: Int = 5, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nBits <= 63, s"nBits $nBits exceeds the 63-bit bucket")
    val spark = emb.sparkSession
    // deterministic ±1 sign matrix from md5 parity: data-independent,
    // nBits*dim rows, broadcast
    val signs = broadcast(
      spark.range(nBits.toLong).toDF("j")
        .crossJoin(spark.range(dim.toLong).toDF("i"))
        .select(col("j").cast(IntegerType).as("j"),
          col("i").cast(IntegerType).as("i"),
          when(pmod(TextOps.polyHash60(
            concat(col("j").cast("string"), lit(":"),
              col("i").cast("string"))), lit(2)) === 1, lit(1L))
            .otherwise(lit(-1L)).as("sgn")))
    def withBuckets(df: DataFrame, idAs: String, qAs: String,
        n2As: String): DataFrame = {
      val q = df.select(col(idCol).as(idAs), quantize(col(vecCol)).as(qAs))
        .withColumn(n2As, dotScaled(col(qAs), col(qAs)))
      val bkt = q
        .select(col(idAs), posexplode(col(qAs)).as(Seq("i", "qx")))
        .join(signs, Seq("i"))
        .groupBy(col(idAs), col("j"))
        .agg(sum(col("sgn") * col("qx")).as("p"))
        .groupBy(col(idAs))
        .agg(sum(when(col("p") > 0,
          call_function("shiftleft", lit(1L), col("j")))
          .otherwise(lit(0L))).as("bucket"))
      q.join(bkt, Seq(idAs))
    }
    val idx = withBuckets(emb, "id", "q", "n2")
    val prb = broadcast(withBuckets(probes, "probe_id", "pq", "pn2"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine_sim").desc, col("id").asc)
    idx.join(prb, Seq("bucket"))
      .filter(col("id") =!= col("probe_id"))
      .select(col("probe_id"), col("id"),
        cosineFromScaled(dotScaled(col("q"), col("pq")),
          col("n2"), col("pn2")).as("cosine_sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("id"), col("cosine_sim"),
        col("rk").cast(IntegerType).as("rk"))
  }
}
