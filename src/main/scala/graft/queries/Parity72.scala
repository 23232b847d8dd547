package graft.queries

import graft.Tables._
import graft.ops.Scc
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-14 batch 8: GENERAL directed strongly connected components —
  * the one graph-algorithm family still absent after
  * PageRank/LPA/HITS/k-core/CC/BFS/harmonic (`ops/Connect` handles
  * the undirected case, `ListRank.cycleLabels` the functional case;
  * this is the arbitrary-out-degree directed case).
  *
  *  - `x9_scc`: plant 16 strongly connected 16-rings (binary chord
  *    steps +1/+2/+4/+8 keep each component's diameter ≤ 4; the
  *    bigger tiers live in SCALE.md `scc_tiers`) over the first
  *    256 customer keys, plus ONE one-way DAG edge between two
  *    components — which must NOT merge them (direction matters: the
  *    exact mistake an undirected CC would make). The operator
  *    consumes only the opaque (u, w) edge pairs;
  *    [[graft.ops.Scc.components]]' forward–backward min-label
  *    peeling must label every node with its component's minimum key,
  *    hash-checked against the oracle's per-group window MIN.
  *
  * Scale shape: each reach-min is a fixpoint of one keyed join + one
  * min-aggregate per round (rounds = component diameter), identical
  * to the CC/LPA shuffle family; the DAG edge forces a second peel
  * round, exercising the outer loop. SccSpec pins mixed SCC sizes,
  * DAG-depth peel rounds (via maxOuter), direction sensitivity, and
  * the singleton case.
  */
object Parity72 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "x9_scc" -> { (s, d) =>
      val nodes = customer(s, d).filter(col("c_custkey") <= 256)
        .select(col("c_custkey").as("v"))
      val gw = Window.partitionBy(col("g")).orderBy(col("v"))
      val gr = nodes.withColumn("g", col("v") % 16)
        .withColumn("r", row_number().over(gw) - 1)
      val sz = gr.groupBy(col("g")).agg(count(lit(1)).as("sz"))
      val grs = gr.join(sz, Seq("g"))
      // ring + binary chords: r -> (r + step) % sz within each group;
      // powers of two reach any offset in ≤ log2(sz) hops, so each
      // component's diameter (= fixpoint round count) stays ≤ 5
      val edges = Seq(1, 2, 4, 8).map { step =>
        grs.as("s").join(grs.as("t"),
            col("s.g") === col("t.g") &&
              col("t.r") === (col("s.r") + step) % col("s.sz"))
          .select(col("s.v").as("u"), col("t.v").as("w"))
      }.reduce(_ unionByName _)
      // one one-way DAG edge: group 2's r=0 node -> group 3's r=0 node
      val dag = grs.filter(col("g") === 2 && col("r") === 0)
        .select(col("v").as("u"))
        .crossJoin(grs.filter(col("g") === 3 && col("r") === 0)
          .select(col("v").as("w")))
      Scc.components(nodes, edges.unionByName(dag))
        .orderBy(col("v"))
    })

  val oracles: Map[String, String] = Map(
    "x9_scc" ->
      """SELECT c_custkey AS v,
           MIN(c_custkey) OVER (PARTITION BY c_custkey % 16) AS scc_id
         FROM customer WHERE c_custkey <= 256 ORDER BY v"""
  )
}
