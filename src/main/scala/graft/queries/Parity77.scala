package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 batch 10: k-truss decomposition — the EDGE-peeling
  * companion of `x9_kcore`'s node peeling (reference: the co-purchase
  * graph the warehouse's basket queries induce; truss cores are the
  * standard community-density primitive one level stronger than
  * k-core). An edge survives the k-truss iff it closes ≥ k-2
  * triangles among surviving edges; peeling repeats until fixpoint.
  *
  *  - `x9_ktruss`: 3 synchronous peel rounds at k = 5 (support ≥ 3)
  *    over the co-purchase graph, then one final support measurement
  *    on the surviving subgraph — emitted per edge. Fixed round
  *    count keeps the DuckDB oracle replayable as unrolled CTEs
  *    (the x9_kcore/x4_bpe_train convention); Parity77Spec pins
  *    convergence semantics on planted graphs (a 5-clique is a
  *    5-truss and survives unchanged; a chordless cycle dies in one
  *    round; a clique with a pendant triangle sheds exactly the
  *    pendant).
  *
  * Scale posture: support is computed by degree-ORIENTED adjacency
  * intersection (the x9_triangles plan): the oriented out-lists are
  * bounded O(√m) by the orientation, the per-edge intersection
  * explodes to the TRIANGLE stream (size 3T), never the wedge stream
  * (size Σ deg² — the thing that kills naive truss at 100×). Each
  * round is edges-sized shuffles + one node-count-sized broadcast
  * adjacency (beyond broadcast the same plan becomes two shuffled
  * joins on s and t — still edges on the wire, never wedges);
  * lineage is truncated per round. SCALE.md's ktruss_tiers block
  * measures the per-round law.
  */
object Parity77 {
  type Q = (SparkSession, String) => DataFrame

  private val TrussK = 5
  private val TrussRounds = 3

  private def degrees(e: DataFrame): DataFrame =
    e.select(col("u").as("node")).unionAll(e.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("dg"))

  /** Per-edge triangle support within `e` (distinct u<v edges):
    * orient away from the lower-(degree, id) endpoint, intersect
    * oriented out-neighbor lists per oriented edge, explode the
    * intersection to the triangle stream (apex s; s→t, s→w, t→w all
    * oriented), then credit all THREE undirected edges of each
    * triangle. Edges closing no triangle are absent (join back with
    * coalesce 0). */
  private[graft] def edgeSupport(e: DataFrame): DataFrame = {
    val deg = degrees(e)
    val ori = e
      .join(broadcast(deg.select(col("node").as("un"), col("dg").as("du"))),
        col("u") === col("un"))
      .join(broadcast(deg.select(col("node").as("vn"), col("dg").as("dv"))),
        col("v") === col("vn"))
      .select(
        when(col("du") <= col("dv"), col("u")).otherwise(col("v")).as("s"),
        when(col("du") <= col("dv"), col("v")).otherwise(col("u")).as("t"))
    val adj = ori.groupBy(col("s")).agg(collect_list(col("t")).as("nbrs"))
    val tris = ori
      .join(broadcast(adj.select(col("s").as("an1"), col("nbrs").as("n1"))),
        col("s") === col("an1"))
      .join(broadcast(adj.select(col("s").as("an2"), col("nbrs").as("n2"))),
        col("t") === col("an2"), "left")
      .select(col("s"), col("t"),
        explode(array_intersect(col("n1"),
          coalesce(col("n2"), array().cast("array<bigint>")))).as("w"))
    def edgeOf(a: Column, b: Column) =
      Seq(least(a, b).as("u"), greatest(a, b).as("v"))
    tris.select(edgeOf(col("s"), col("t")): _*)
      .unionAll(tris.select(edgeOf(col("s"), col("w")): _*))
      .unionAll(tris.select(edgeOf(col("t"), col("w")): _*))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("sup"))
  }

  /** `rounds` synchronous peel rounds (keep edges with support
    * ≥ k-2), then the final per-edge support of the surviving
    * subgraph. Exposed for the spec's planted-graph pins. */
  private[graft] def ktruss(e0: DataFrame, k: Int,
      rounds: Int): DataFrame = {
    var e = graft.ops.Iter.truncate(e0, None)
    for (_ <- 1 to rounds) {
      // inner join: a no-triangle edge has no support row, and
      // 0 < k-2 drops it — identical to coalesce-0-filter
      e = graft.ops.Iter.truncate(
        e.join(edgeSupport(e).filter(col("sup") >= k - 2),
          Seq("u", "v")).select(col("u"), col("v")), None)
    }
    e.join(edgeSupport(e), Seq("u", "v"), "left")
      .select(col("u"), col("v"),
        coalesce(col("sup"), lit(0L)).as("sup"))
  }

  val queries: Map[String, Q] = Map(
    "x9_ktruss" -> { (s, d) =>
      ktruss(Parity24.edges(s, d), TrussK, TrussRounds)
        .orderBy(col("u"), col("v"))
    })

  /** Support CTEs for edge set `e$i`: degrees → orientation →
    * apex-enumerated triangles (closure join on the ORIENTED b→c
    * edge, so each triangle appears exactly once) → 3-way edge
    * credit. Mirrors [[edgeSupport]] exactly. */
  private def supSql(i: Int): String =
    s"""d$i AS MATERIALIZED (SELECT node, count(*) AS dg FROM (
           SELECT u AS node FROM e$i UNION ALL SELECT v FROM e$i)
         GROUP BY node),
       o$i AS MATERIALIZED (SELECT
           CASE WHEN du.dg <= dv.dg THEN e.u ELSE e.v END AS s,
           CASE WHEN du.dg <= dv.dg THEN e.v ELSE e.u END AS t
         FROM e$i e
         JOIN d$i du ON du.node = e.u
         JOIN d$i dv ON dv.node = e.v),
       t$i AS MATERIALIZED (SELECT e1.s AS a, e1.t AS b, e2.t AS c
         FROM o$i e1
         JOIN o$i e2 ON e2.s = e1.s AND e2.t <> e1.t
         JOIN o$i e3 ON e3.s = e1.t AND e3.t = e2.t),
       sup$i AS MATERIALIZED (SELECT u, v, count(*) AS sup FROM (
           SELECT least(a, b) AS u, greatest(a, b) AS v FROM t$i
           UNION ALL SELECT least(a, c), greatest(a, c) FROM t$i
           UNION ALL SELECT least(b, c), greatest(b, c) FROM t$i)
         GROUP BY u, v)"""

  private def peelSql(i: Int, keep: Int): String =
    s"""e${i + 1} AS MATERIALIZED (SELECT e.u, e.v FROM e$i e
         JOIN sup$i s ON s.u = e.u AND s.v = e.v
         WHERE s.sup >= $keep)"""

  val oracles: Map[String, String] = Map(
    "x9_ktruss" -> {
      val keep = TrussK - 2
      val rounds = (0 until TrussRounds)
        .map(i => supSql(i) + ",\n" + peelSql(i, keep)).mkString(",\n")
      val f = TrussRounds // final support pass over the survivors
      s"""WITH e0 AS MATERIALIZED (
           SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
           FROM lineitem a JOIN lineitem b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         $rounds,
         ${supSql(f)}
         SELECT e.u, e.v, coalesce(s.sup, 0) AS sup
         FROM e$f e LEFT JOIN sup$f s ON s.u = e.u AND s.v = e.v
         ORDER BY e.u, e.v"""
    })
}
