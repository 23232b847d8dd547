package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 batch 3: sampled-source harmonic centrality — the
  * closeness-family member the x9 inventory lacked (next to degree,
  * PageRank/HITS, k-core, triangles/clustering, LPA, CC, BFS).
  *
  * `x9_harmonic`: harmonic centrality of each SAMPLED source over the
  * co-purchase graph, H(s) = Σ_{v≠s, d(s,v)≤D} 1/d(s,v) — the
  * standard Eppstein–Wang move at scale: exact per-node closeness is
  * all-pairs-shortest-paths (hopeless at 100 TB), but a deterministic
  * source sample with a hop bound D gives the centrality ranking the
  * applications (influence scoring, hub triage) actually consume.
  * Unlike `x9_bfs_hops` (ONE multi-source frontier — distance to the
  * NEAREST seed), this runs a per-source BFS: the state is a
  * (src, node, min-dist) relation, grown one hop per round with an
  * anti-join so first-visit = min-dist by construction. 1/d is summed
  * in milli-units (1000 DIV d — exact integers, engine-portable), so
  * the oracle replays bit-for-bit via a recursive CTE.
  *
  * Scale posture: per-round state is (sources × reached)-bounded —
  * the sample rate is the knob that keeps the product linear in the
  * corpus (sources stay ~constant as the graph grows; each round is
  * one keyed equi-join frontier⋈adj plus one (src, node) anti-join,
  * both plain shuffles, lineage-truncated per round like every x9
  * iterative). The hop bound D is the second knob — the last hop
  * dominates (see HarmDepth) — and sparse graphs raise D with the
  * same per-round shape.
  */
object Parity64 {
  type Q = (SparkSession, String) => DataFrame

  /** Hop bound. The LAST hop dominates: round r's join volume is
    * Σ_{(s,v) in frontier_r} deg(v), and on this dense co-purchase
    * graph the depth-2 frontier already spans most nodes per source —
    * the depth-3 round alone was ~37 M join rows (12 s at sf0.1) for
    * distances that contribute ≤ 333 milli each. D=2 keeps the row at
    * its siblings' cost; D is a parameter (Parity64Spec pins depth-3
    * geometry on planted graphs), and sparser graphs raise it with
    * linearly growing rounds. */
  private val HarmDepth = 2
  /** md5-prefix source sample: 3 hex chars ≤ "007" = 1/512 of nodes.
    * The other cost knob: each source is its own bounded BFS
    * (Σ_src O(E) work). */
  private val SeedHex = "007"

  /** Per-source bounded BFS → harmonic sums. `seeds` is a 1-column
    * (src) frame; `adj` a both-directions (node, nb) edge list.
    * First-visit = min-dist by the per-round anti-join. */
  private[graft] def harmonic(seeds: DataFrame, adj: DataFrame,
      depth: Int): DataFrame = {
    var dist = graft.ops.Iter.truncate(
      seeds.select(col("src"), col("src").as("node"),
        lit(0L).as("dist")), None)
    var frontier = dist.select(col("src"), col("node"))
    for (r <- 1 to depth) {
      val reached = graft.ops.Iter.truncate(
        frontier.join(adj, Seq("node"))
          .select(col("src"), col("nb").as("node")).distinct()
          .join(dist.select(col("src"), col("node")),
            Seq("src", "node"), "left_anti")
          .withColumn("dist", lit(r.toLong)), None)
      dist = dist.unionAll(reached)
      frontier = reached.select(col("src"), col("node"))
    }
    dist.filter(col("dist") > 0)
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n_reached"),
        sum(expr("1000 DIV dist")).as("harm_milli"))
      .orderBy(col("src"))
  }

  /** The full x9_harmonic pipeline with both knobs exposed —
    * ScaleBench's `harmonic` block sweeps (depth, sample) over the
    * replication tiers; the query runs the defaults. */
  private[graft] def harmonicRun(s: SparkSession, d: String,
      depth: Int, seedHex: String): DataFrame = {
    val pairs = Parity24.edges(s, d)
    // adjacency derived ONCE, lineage cut — every BFS round rescans
    // THIS, not the lineitem⋈orders pair derivation (the
    // x9_pagerank finding; un-truncated, the row cost 13 s at sf0.1
    // re-running the co-purchase self-join per hop — 3.5 s after)
    val adj = graft.ops.Iter.truncate(
      pairs.select(col("u").as("node"), col("v").as("nb"))
        .unionAll(pairs.select(col("v").as("node"), col("u").as("nb"))),
      None)
    val seeds = adj.select(col("node")).distinct()
      .filter(substring(md5(col("node").cast("string")), 1, 3)
        <= seedHex)
      .select(col("node").as("src"))
    harmonic(seeds, adj, depth)
  }

  val queries: Map[String, Q] = Map(
    "x9_harmonic" -> (harmonicRun(_, _, HarmDepth, SeedHex)))

  val oracles: Map[String, String] = Map(
    "x9_harmonic" ->
      s"""WITH RECURSIVE pairs AS MATERIALIZED (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
          adj AS MATERIALIZED (
            SELECT u AS node, v AS nb FROM pairs
            UNION ALL SELECT v AS node, u AS nb FROM pairs),
          seeds AS MATERIALIZED (
            SELECT DISTINCT node AS src FROM adj
            WHERE substring(md5(CAST(node AS VARCHAR)), 1, 3)
              <= '$SeedHex'),
          bfs AS (
            SELECT src, src AS node, 0 AS dist FROM seeds
            UNION
            SELECT b.src, a.nb AS node, b.dist + 1 AS dist
            FROM bfs b JOIN adj a ON a.node = b.node
            WHERE b.dist < $HarmDepth),
          md AS (
            SELECT src, node, min(dist) AS dd
            FROM bfs GROUP BY src, node)
          SELECT src, CAST(count(*) AS BIGINT) AS n_reached,
            CAST(sum(1000 // dd) AS BIGINT) AS harm_milli
          FROM md WHERE dd > 0 GROUP BY src ORDER BY src"""
  )
}
