package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 batch 9: sampled-source BETWEENNESS centrality — the
  * path-COUNTING member of the centrality family (x9_harmonic ranks
  * by distance; betweenness ranks by how much shortest-path traffic
  * flows THROUGH a node — broker/bottleneck detection).
  *
  * `x9_betweenness`: Brandes' dependency accumulation from a
  * deterministic md5 source sample, hop-bounded at D=2 (the same
  * Eppstein–Wang move as x9_harmonic: exact betweenness is all-pairs
  * Brandes, hopeless at corpus scale; a source sample with a hop
  * bound ranks the brokers the applications consume). For D=2 the
  * accumulation closes in ONE backward step: only distance-1 nodes
  * can sit inside a shortest path, and their dependency is
  * δ(v) = Σ_{w ∈ L2, v~w} σ(v)/σ(w) with σ(v) = 1, so
  * bc(v) = Σ_src Σ_w 1000 DIV σ(w) in exact integer milli — fully
  * replayable as unrolled SQL. σ(w) (shortest-path multiplicity) is
  * a per-(src, w) COUNT of its distance-1 predecessors — the one
  * aggregation Brandes needs beyond the BFS itself.
  *
  * Directed-source convention: every sampled source contributes its
  * own dependency mass (an undirected pair reached from both of its
  * sampled endpoints counts twice, as in per-source Brandes before
  * the final halving — a constant factor that cancels in ranking).
  *
  * Scale posture: identical to x9_harmonic's — per-round state is
  * (sources × frontier)-bounded, every stage is a keyed equi-join or
  * count against the once-derived adjacency (lineage-cut), the
  * sample rate is the linear knob and the hop bound the round knob.
  * The dependency join adds one more frontier-sized join-agg pass,
  * so the row prices at ~1.5× its harmonic sibling.
  */
object Parity75 {
  type Q = (SparkSession, String) => DataFrame

  /** md5-prefix source sample: 3 hex chars <= "007" = 1/512. */
  private val SeedHex = "007"

  /** Depth-2 Brandes from `seeds` over a both-directions unique
    * (node, nb) adjacency: per-source σ for the distance-2 frontier,
    * one backward dependency step, summed per interior node. */
  private[graft] def betweenness(seeds: DataFrame,
      adj0: DataFrame): DataFrame = {
    val adj = graft.ops.Iter.truncate(adj0, None)
    // L1: distance-1 nodes per source (σ = 1 each)
    val d1 = graft.ops.Iter.truncate(
      seeds.join(adj, seeds("src") === adj("node"))
        .filter(col("nb") =!= col("src"))
        .select(col("src"), col("nb").as("v")).distinct(), None)
    // the (src, v, w) one-hop expansion of L1 feeds BOTH the σ count
    // and the dependency step — materialize it once instead of
    // re-running the frontier⋈adjacency join (the row's only
    // corpus-volume stage) twice
    val exp = graft.ops.Iter.truncate(
      d1.join(adj, d1("v") === adj("node"))
        .select(col("src"), col("v"), col("nb").as("w"))
        .filter(col("w") =!= col("src")), None)
    // L2 + σ: distance-2 nodes with their predecessor counts — the
    // expansion minus anything already at distance <= 1
    val d2 = graft.ops.Iter.truncate(
      exp
        .join(d1.select(col("src"), col("v").as("w")),
          Seq("src", "w"), "left_anti")
        .groupBy(col("src"), col("w"))
        .agg(count(lit(1)).as("sigma")), None)
    // backward step: δ(v) = Σ_{w ∈ L2, v~w} 1000 DIV σ(w); then
    // bc(v) = Σ_src δ(v)
    exp
      .join(d2, Seq("src", "w"))
      .groupBy(col("v"))
      .agg(sum(expr("1000 DIV sigma")).as("bc_milli"),
        count(lit(1)).as("n_paths"))
      .select(col("v").as("node"), col("bc_milli"), col("n_paths"))
      .orderBy(col("node"))
  }

  val queries: Map[String, Q] = Map(
    "x9_betweenness" -> { (s, d) =>
      val pairs = Parity24.edges(s, d)
      val adj = pairs.select(col("u").as("node"), col("v").as("nb"))
        .unionAll(pairs.select(col("v").as("node"), col("u").as("nb")))
      val seeds = adj.select(col("node")).distinct()
        .filter(substring(md5(col("node").cast("string")), 1, 3)
          <= SeedHex)
        .select(col("node").as("src"))
      betweenness(seeds, adj)
    })

  val oracles: Map[String, String] = Map(
    "x9_betweenness" -> s"""
      WITH pairs AS MATERIALIZED (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      adj AS MATERIALIZED (
        SELECT u AS node, v AS nb FROM pairs
        UNION ALL SELECT v AS node, u AS nb FROM pairs),
      seeds AS (SELECT DISTINCT node AS src FROM adj
                WHERE substring(md5(CAST(node AS VARCHAR)), 1, 3)
                  <= '$SeedHex'),
      d1 AS (SELECT DISTINCT s.src, a.nb AS v
             FROM seeds s JOIN adj a ON a.node = s.src
             WHERE a.nb <> s.src),
      d2 AS (SELECT d1.src, a.nb AS w, count(*) AS sigma
             FROM d1 JOIN adj a ON a.node = d1.v
             WHERE a.nb <> d1.src
               AND NOT EXISTS (SELECT 1 FROM d1 x
                               WHERE x.src = d1.src AND x.v = a.nb)
             GROUP BY d1.src, a.nb),
      dep AS (SELECT d1.src, d1.v, a.nb AS w
              FROM d1 JOIN adj a ON a.node = d1.v)
      SELECT d.v AS node,
        CAST(sum(1000 // d2.sigma) AS BIGINT) AS bc_milli,
        CAST(count(*) AS BIGINT) AS n_paths
      FROM dep d JOIN d2 ON d2.src = d.src AND d2.w = d.w
      GROUP BY d.v ORDER BY node""")
}
