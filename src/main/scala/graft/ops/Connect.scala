package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the
  * clustering step that turns pairwise near-duplicate edges into
  * whole duplicate GROUPS (one-round dedup like
  * [[Dedup.minhashDedup]] only collapses direct neighbours; chains
  * a~b~c need the transitive closure).
  *
  * Algorithm: every node starts labelled with its own id; each round
  * every node takes the min of its label and its neighbours' labels;
  * stop when a round changes nothing. Deterministic (min is
  * order-independent), converges in O(component diameter) rounds.
  *
  * Scale shape: each round is one equi-join edges⋈labels + one
  * min-aggregate — the same shuffle pattern as any fact join, fully
  * distributed. `localCheckpoint` after each round truncates the
  * exponentially-growing lineage (the standard iterative-algorithm
  * requirement; on a production cluster use reliable checkpointing or
  * persist+unpersist). Near-dup components are small and shallow, so
  * rounds are few; for billion-edge general graphs swap in the
  * large-star/small-star variant — the round structure is identical.
  */
object Connect {

  /** @return (id, comp) for every node appearing in `edges`; comp is
    *         the smallest node id in the connected component. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .union(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .distinct()
      .localCheckpoint(true)
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint(true)
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val nbrMin = sym.join(labels, sym("b") === labels("id"))
        .groupBy(col("a").as("nid")).agg(min(col("lbl")).as("nlbl"))
      val updated = labels
        .join(nbrMin, labels("id") === nbrMin("nid"), "left_outer")
        .select(col("id"), col("lbl"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl2"))
        .localCheckpoint(true)
      done = updated.filter(col("lbl2") < col("lbl")).isEmpty
      labels = updated.select(col("id"), col("lbl2").as("lbl"))
      iter += 1
    }
    labels.select(col("id"), col("lbl").as("comp"))
  }
}
