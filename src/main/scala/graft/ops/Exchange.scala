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
}
