package graft.queries

import graft.Tables._
import graft.functions.TDigest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Round-10 batch 12: mergeable quantile sketches, distribution
  * drift, and link prediction.
  *
  *  - `x6_tdigest`: t-digest quantile sketch (custom
  *    `TypedImperativeAggregate`, functions/TDigest.scala) — per-group
  *    digests of events.value, p50/p95 estimates, AND a union digest
  *    re-aggregated FROM the group digests (the persist-then-merge
  *    path: per-day/per-partition digests rolled up without touching
  *    raw data again). Correctness is a BOUNDED oracle, the HLL/KMV
  *    pattern: the emitted rank-error checks
  *    |rank(est_q) - q·n| <= slack·n must all be true (t-digest
  *    estimates legitimately vary with partition merge order inside
  *    that bound; rank error, not value error, is the guarantee).
  *  - `x6_kl_drift`: per-source token-distribution KL divergence
  *    against the whole corpus (add-one smoothing over the corpus
  *    vocabulary) — the "which source drifted" ranking that decides
  *    retraining and mixture reweighting.
  *  - `x9_common_neighbors`: link prediction over the co-purchase
  *    graph — common-neighbor count and neighborhood Jaccard for
  *    non-adjacent candidate pairs from a deterministic md5 node
  *    sample, scored with the native sorted-merge intersect kernel.
  *
  * Scale posture: digests build map-side and merge associatively
  * (the whole point — no global sort for percentiles at 100 TB);
  * group digests are KB-sized arrays. KL is two keyed aggregates +
  * one vocab×source join (vocab-sized, partitionable). Common
  * neighbors enumerates WEDGES through shared neighbors (the same
  * orientation-bounded stream as x9_triangles) restricted to sampled
  * endpoints, so candidate pairs are Σ deg² -bounded and grow
  * linearly with disjoint graph growth — see the query comment for
  * the hub-cap (d_max) skew knob.
  */
object Parity25 {
  type Q = (SparkSession, String) => DataFrame

  private val Delta = 100
  /** Rank-error slack: 4·q(1-q)/delta is ~0.01 at the median for
    * delta=100; triple it so partition-order variation never flakes
    * the bounded oracle. */
  private val Slack = 0.03

  val queries: Map[String, Q] = Map(
    // ---- t-digest quantiles ---------------------------------------
    "x6_tdigest" -> { (s, d) =>
      val ev = events(s, d).select(col("event_type"), col("value"))
      val dig = ev.groupBy(col("event_type"))
        .agg(TDigest.tdigest(s, col("value"), Delta).as("dg"),
          count(lit(1)).as("n"))
      val est = dig.select(col("event_type"), col("n"),
        TDigest.tdigest_quantile(s, col("dg"), 0.5).as("p50"),
        TDigest.tdigest_quantile(s, col("dg"), 0.95).as("p95"))
      // union digest re-aggregated FROM the per-group digests
      val union = dig.agg(
        TDigest.tdigest_quantile(s,
          TDigest.tdigest_merge(s, col("dg"), Delta), 0.5).as("up50"),
        sum(col("n")).as("un"))
      val uRank = ev.crossJoin(broadcast(union))
        .agg((sum(when(col("value") <= col("up50"), 1L).otherwise(0L)) -
          first(col("un")) * 0.5).as("udev"),
          first(col("un")).as("un2"))
        .select((abs(col("udev")) <= col("un2") * Slack).as("union_p50_in_bound"))
      ev.join(broadcast(est), "event_type")
        .groupBy(col("event_type"))
        .agg(first(col("n")).as("n_rows"),
          sum(when(col("value") <= col("p50"), 1L).otherwise(0L)).as("r50"),
          sum(when(col("value") <= col("p95"), 1L).otherwise(0L)).as("r95"))
        .select(col("event_type"), col("n_rows"),
          (abs(col("r50") - col("n_rows") * 0.5) <= col("n_rows") * Slack)
            .as("p50_in_bound"),
          (abs(col("r95") - col("n_rows") * 0.95) <= col("n_rows") * Slack)
            .as("p95_in_bound"))
        .crossJoin(broadcast(uRank))
    },
    // ---- per-source KL drift --------------------------------------
    "x6_kl_drift" -> { (s, d) =>
      val tok = documents(s, d).select(col("source"),
        explode(graft.ops.TextOps.tokens(lower(col("text")))).as("tok"))
      val perSt = tok.groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).as("cs"))
      val perT = tok.groupBy(col("tok")).agg(count(lit(1)).as("call"))
      val totals = tok.agg(count(lit(1)).as("n_all"),
        countDistinct(col("tok")).as("vocab"))
      val perS = tok.groupBy(col("source")).agg(count(lit(1)).as("ns"))
      // full vocab × source grid (smoothed p is nonzero for unseen
      // tokens), then the observed counts fill in
      val grid = perT.crossJoin(broadcast(perS))
      grid.join(perSt, Seq("source", "tok"), "left")
        .crossJoin(broadcast(totals))
        .select(col("source"), col("ns"),
          ((coalesce(col("cs"), lit(0L)) + 1).cast("double") /
            (col("ns") + col("vocab")).cast("double")).as("p"),
          ((col("call") + 1).cast("double") /
            (col("n_all") + col("vocab")).cast("double")).as("q"))
        .groupBy(col("source"))
        .agg(first(col("ns")).as("n_tokens"),
          round(sum(col("p") * log2(col("p") / col("q"))), 8).as("kl"))
    },
    // ---- link prediction ------------------------------------------
    // Shared-neighbor equi-join formulation (round-11): explode the
    // SAMPLED adjacency (only rows whose endpoint is a sampled node),
    // self-join on the shared neighbor w, group by the (u, v) pair —
    // so only pairs with cn >= 1 ever materialize and the candidate
    // stream is Σ_w deg_s(w)² -bounded (deg_s = w's SAMPLED degree),
    // not |sample|²: disjoint growth (more nodes, same density) adds
    // wedges linearly, where the old samp.crossJoin(samp) grew
    // quadratically at a fixed sample rate (ScaleBench measures the
    // ratio). This row runs UNCAPPED so the DuckDB oracle stays the
    // plain exact replay; the d_max production twin is next.
    "x9_common_neighbors" -> (commonNeighborsQ(_, _, dMax = None)),
    // The 100 TB skew knob, IN CODE (round-12 verdict item 3): a hub
    // center w with deg_s(w) ~ 10^5 alone contributes 10^10 wedge
    // rows, so production runs cap centers at d_max — wedges through
    // hubs above the cap are dropped (standard link-prediction
    // practice: a shared mega-hub neighbor carries ~no signal, and
    // the cap only ever UNDERcounts cn through those hubs, never
    // fabricates). d_max = 12 bites on this corpus (sampled center
    // degrees run 1..20, p99 = 16), and the oracle replays the SAME
    // cap in SQL, so the row stays exact. ScaleBench's `wedge_cap`
    // block plants a mega-hub and measures the candidate bound.
    "x9_common_neighbors_capped" ->
      (commonNeighborsQ(_, _, dMax = Some(CapDMax)))
  )

  /** Production hub cap for the capped twin (sampled-degree units). */
  private[graft] val CapDMax = 12L

  /** Wedge pair stream over a (node, nb) adjacency: self-join on the
    * shared neighbor `nb`, one row per unordered (u, v) pair with its
    * common-neighbor count. `dMax` is the hub cap: wedge CENTERS
    * whose degree in THIS adjacency exceeds it are dropped before the
    * self-join, bounding the stream at Σ min(deg, d_max)². The
    * over-cap center list is tiny by definition (hubs are rare), so
    * it broadcasts as an anti-join — the adjacency itself never
    * collects. */
  private[graft] def wedgePairs(sadj: DataFrame,
      dMax: Option[Long]): DataFrame = {
    val capped = dMax match {
      case Some(m) =>
        val overCap = sadj.groupBy(col("nb"))
          .agg(count(lit(1)).as("cd")).filter(col("cd") > m)
          .select(col("nb"))
        sadj.join(broadcast(overCap), Seq("nb"), "left_anti")
      case None => sadj
    }
    capped.select(col("node").as("u"), col("nb"))
      .join(capped.select(col("node").as("v"), col("nb")), Seq("nb"))
      .filter(col("u") < col("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("cn"))
  }

  private def commonNeighborsQ(s: SparkSession, d: String,
      dMax: Option[Long]): DataFrame = {
    val pairs = Parity24.edges(s, d)
    val adjAll = pairs.select(col("u").as("node"), col("v").as("nb"))
      .unionAll(pairs.select(col("v").as("node"), col("u").as("nb")))
    val deg = adjAll.groupBy(col("node")).agg(count(lit(1)).as("dg"))
    val sampDeg = deg.filter(
      substring(md5(col("node").cast("string")), 1, 2) <= "0f")
    // adjacency restricted to sampled endpoints (node-count-sized
    // sample list — broadcast semi-join keeps the restrict map-side)
    val sadj = adjAll.join(broadcast(sampDeg.select(col("node"))),
      Seq("node"), "left_semi")
    val wedges = wedgePairs(sadj, dMax)
    // the adjacency anti-join only has to remove SAMPLED-endpoint
    // edges (wedge pairs are sampled by construction), so restrict
    // the edge list to both-endpoints-sampled first — sample²-
    // bounded and broadcastable at any corpus size, where the full
    // edge list is not (a broadcast(pairs) hint here collected the
    // 100×-tier edge list to the driver and died on maxResultSize)
    val sampledEdges = pairs
      .join(broadcast(sampDeg.select(col("node").as("u"))),
        Seq("u"), "left_semi")
      .join(broadcast(sampDeg.select(col("node").as("v"))),
        Seq("v"), "left_semi")
    wedges
      // non-adjacent pairs only (true link-prediction candidates)
      .join(broadcast(sampledEdges), Seq("u", "v"), "left_anti")
      .join(broadcast(sampDeg.select(col("node").as("u"),
        col("dg").as("du"))), Seq("u"))
      .join(broadcast(sampDeg.select(col("node").as("v"),
        col("dg").as("dv"))), Seq("v"))
      .select(col("u"), col("v"), col("cn"),
        round(col("cn").cast("double") /
          (col("du") + col("dv") - col("cn")).cast("double"), 10)
          .as("jaccard"))
      .orderBy(col("cn").desc, col("u"), col("v"))
      .limit(50)
  }

  val oracles: Map[String, String] = Map(
    "x6_tdigest" ->
      """SELECT event_type, count(*) AS n_rows,
                TRUE AS p50_in_bound, TRUE AS p95_in_bound,
                TRUE AS union_p50_in_bound
         FROM events GROUP BY event_type""",
    "x6_kl_drift" ->
      """WITH tok AS (
           SELECT source,
                  unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
           FROM documents),
         per_st AS (SELECT source, tok, count(*) AS cs
                    FROM tok GROUP BY source, tok),
         per_t AS (SELECT tok, count(*) AS call FROM tok GROUP BY tok),
         totals AS (SELECT CAST(count(*) AS BIGINT) AS n_all,
                           CAST(count(DISTINCT tok) AS BIGINT) AS vocab
                    FROM tok),
         per_s AS (SELECT source, CAST(count(*) AS BIGINT) AS ns
                   FROM tok GROUP BY source),
         grid AS (SELECT s.source, s.ns, t.tok, t.call FROM per_t t, per_s s),
         terms AS (
           SELECT g.source, g.ns,
                  CAST(coalesce(p.cs, 0) + 1 AS DOUBLE)
                    / CAST(g.ns + tt.vocab AS DOUBLE) AS p,
                  CAST(g.call + 1 AS DOUBLE)
                    / CAST(tt.n_all + tt.vocab AS DOUBLE) AS q
           FROM grid g
           LEFT JOIN per_st p ON p.source = g.source AND p.tok = g.tok
           CROSS JOIN totals tt)
         SELECT source, any_value(ns) AS n_tokens,
                round(sum(p * log2(p / q)), 8) AS kl
         FROM terms GROUP BY source""",
    "x9_common_neighbors" ->
      """WITH pairs AS MATERIALIZED (
           SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
           FROM lineitem a JOIN lineitem b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         adj AS MATERIALIZED (
           SELECT u AS node, v AS nb FROM pairs
           UNION ALL SELECT v AS node, u AS nb FROM pairs),
         deg AS MATERIALIZED (
           SELECT node, count(*) AS dg FROM adj GROUP BY node),
         samp AS MATERIALIZED (
           SELECT node, dg FROM deg
           WHERE substring(md5(CAST(node AS VARCHAR)), 1, 2) <= '0f'),
         cand AS MATERIALIZED (
           SELECT s1.node AS u, s1.dg AS du, s2.node AS v, s2.dg AS dv
           FROM samp s1 JOIN samp s2 ON s1.node < s2.node
           WHERE NOT EXISTS (SELECT 1 FROM pairs p
                             WHERE p.u = s1.node AND p.v = s2.node)),
         cn AS (
           SELECT c.u, c.v, any_value(c.du) AS du, any_value(c.dv) AS dv,
                  count(*) AS cn
           FROM cand c
           JOIN adj a1 ON a1.node = c.u
           JOIN adj a2 ON a2.node = c.v AND a2.nb = a1.nb
           GROUP BY c.u, c.v)
         SELECT u, v, cn,
                round(CAST(cn AS DOUBLE) / CAST(du + dv - cn AS DOUBLE), 10)
                  AS jaccard
         FROM cn WHERE cn >= 1
         ORDER BY cn DESC, u, v LIMIT 50""",
    // the capped twin replays the SAME CapDMax center cap, so the
    // comparison stays exact (cn undercounts through capped hubs on
    // BOTH sides; jaccard still uses full sampled degrees)
    "x9_common_neighbors_capped" ->
      s"""WITH pairs AS MATERIALIZED (
           SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
           FROM lineitem a JOIN lineitem b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         adj AS MATERIALIZED (
           SELECT u AS node, v AS nb FROM pairs
           UNION ALL SELECT v AS node, u AS nb FROM pairs),
         deg AS MATERIALIZED (
           SELECT node, count(*) AS dg FROM adj GROUP BY node),
         samp AS MATERIALIZED (
           SELECT node, dg FROM deg
           WHERE substring(md5(CAST(node AS VARCHAR)), 1, 2) <= '0f'),
         sadj AS MATERIALIZED (
           SELECT a.node, a.nb FROM adj a
           JOIN samp s ON a.node = s.node),
         okc AS MATERIALIZED (
           SELECT nb FROM sadj GROUP BY nb HAVING count(*) <= $CapDMax),
         capped AS MATERIALIZED (
           SELECT sa.node, sa.nb FROM sadj sa JOIN okc ON okc.nb = sa.nb),
         wedges AS (
           SELECT s1.node AS u, s2.node AS v, count(*) AS cn
           FROM capped s1 JOIN capped s2
             ON s1.nb = s2.nb AND s1.node < s2.node
           GROUP BY s1.node, s2.node),
         cand AS (
           SELECT w.u, w.v, w.cn FROM wedges w
           WHERE NOT EXISTS (SELECT 1 FROM pairs p
                             WHERE p.u = w.u AND p.v = w.v))
         SELECT c.u, c.v, c.cn,
                round(CAST(c.cn AS DOUBLE)
                  / CAST(s1.dg + s2.dg - c.cn AS DOUBLE), 10) AS jaccard
         FROM cand c
         JOIN samp s1 ON s1.node = c.u
         JOIN samp s2 ON s2.node = c.v
         ORDER BY cn DESC, u, v LIMIT 50"""
  )
}
