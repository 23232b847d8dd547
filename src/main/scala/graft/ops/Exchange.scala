package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.broadcast

/** The iterative-graph exchange strategy (PageRank / LPA / HITS —
  * round-12 verdict item 4): every round joins a node-sized score
  * vector against the edge relation, and the join's exchange choice
  * IS the scalability posture.
  *
  *  - `msg = false` (broadcast arm): the vector ships to every
  *    executor; each round is a map-side join plus one aggregate
  *    shuffle. Wins while the vector fits comfortably in executor
  *    memory (up to ~10⁸ nodes at a few bytes each).
  *  - `msg = true` (message arm): billion-node graphs outgrow the
  *    broadcast — instead the EDGES are pre-partitioned on the join
  *    key once (lineage truncation preserves the partitioning), and
  *    each round shuffle-hash-joins with the vector as build side:
  *    per-round network volume is node-bounded (the vector moves to
  *    the edge partitions; the edge relation never moves again). The
  *    kcorePeelMsg posture generalized to weighted rank vectors.
  *
  * Both arms compute identical results; PlanShapeSpec pins the join
  * operators, ScaleBench's `rank_arms` block measures the slopes.
  */
object Exchange {

  /** vector × edges with an explicit join condition. */
  def vecJoin(vec: DataFrame, edges: DataFrame, cond: Column,
      msg: Boolean): DataFrame =
    if (msg) vec.hint("shuffle_hash").join(edges, cond)
    else broadcast(vec).join(edges, cond)

  /** vector × edges on shared key columns (the key survives once). */
  def vecJoinUsing(vec: DataFrame, edges: DataFrame, keys: Seq[String],
      msg: Boolean): DataFrame =
    if (msg) vec.hint("shuffle_hash").join(edges, keys)
    else broadcast(vec).join(edges, keys)

  /** Modeled bytes per rank-vector row: (node: long, value: long) in
    * unsafe-row layout plus broadcast-map overhead. A size MODEL like
    * x8_join_advisor's, shared by the advisor query and its oracle. */
  val VectorBytesPerNode = 24L

  /** The measured rank-arm crossover (SCALE.md `rank_arms` +
    * BASELINE.md, round-13): at ~20 k nodes (0.5 MB vector) the
    * broadcast arm wins (x9_pagerank 3.1 s vs msg 4.1 s at sf0.1);
    * at ~200 k nodes (4.8 MB) the msg arm wins (17.5 s vs 30.3 s at
    * the 10× tier). The switch point is pinned at the bracket's
    * geometric midpoint, ~62.5 k nodes = 1.5 MB of vector — well
    * under the 10 MB autoBroadcastJoinThreshold, because the arm
    * flips on per-round REBROADCAST cost (the vector is rebuilt and
    * re-shipped every iteration), not on whether one broadcast fits. */
  val RankArmCrossoverBytes = 1500000L

  /** "Broadcast until it breaks", executable (round-13 verdict item
    * 4): pick the message arm once the estimated per-round vector
    * outgrows the measured crossover. `x9_rank_advisor` emits this
    * verdict as an oracle-checked row; x9_pagerank routes through it. */
  def adviseMsg(nNodesEstimate: Long): Boolean =
    nNodesEstimate * VectorBytesPerNode >= RankArmCrossoverBytes
}
