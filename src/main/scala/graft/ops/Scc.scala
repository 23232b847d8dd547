package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Strongly connected components of a GENERAL directed graph by
  * forward–backward min-label peeling (the FW-BW idea specialized to
  * min labels): for the current vertex set compute
  *
  *   F(v) = min label forward-reachable from v (v included)
  *   B(v) = min label that can reach v (v included)
  *
  * Every v with F(v) == B(v) == m is in the SCC of m (v reaches m and
  * m reaches v), and that set IS the whole SCC of m — assign those,
  * remove them, repeat. Progress is guaranteed: the globally minimal
  * remaining label m always has F(m) = B(m) = m, so each outer round
  * peels at least one SCC (in practice every SCC that is the minimum
  * of its reachability class — a DAG-of-SCCs of depth d costs ≤ d
  * outer rounds).
  *
  * Each reach-min is a plain fixpoint: one keyed join + min-aggregate
  * per round, rounds = graph diameter, lineage truncated per round —
  * the same shuffle shape as the CC/label-prop family, with direction
  * (B runs the identical loop on flipped edges). At 100 TB this stays
  * one n-row relation + one m-row relation per round; the closure-
  * squaring shortcut (log-diameter rounds) is deliberately NOT used —
  * transitive-closure relations explode quadratically on dense
  * components, the fixpoint never exceeds the input size.
  *
  * Functional graphs (out-degree 1) should use the cheaper
  * [[ListRank.cycleLabels]] doubling form instead.
  */
object Scc {

  /** BOTH reach-min fixpoints (forward f, backward b) interleaved in
    * one loop over one (v, f, b) relation: the two directions are
    * independent, so running them together halves the per-round fixed
    * cost (one lineage truncation + one convergence count per round,
    * not per direction) and the loop ends at max(diamF, diamB) rounds
    * instead of their sum. */
  private def reachMins(nodes: DataFrame, edges: DataFrame,
      checkpointDir: Option[String]): DataFrame = {
    var lab = nodes.select(col("v"), col("v").as("f"), col("v").as("b"))
    var changed = 1L
    while (changed > 0) {
      val candF = edges.join(lab.select(col("v"), col("f")),
          col("w") === col("v"))
        .groupBy(col("u").as("cv")).agg(min(col("f")).as("cf"))
      val candB = edges.join(lab.select(col("v"), col("b")),
          col("u") === col("v"))
        .groupBy(col("w").as("dv")).agg(min(col("b")).as("cb"))
      val next = lab
        .join(candF, col("v") === col("cv"), "left")
        .join(candB, col("v") === col("dv"), "left")
        .select(col("v"),
          least(col("f"), coalesce(col("cf"), col("f"))).as("f"),
          least(col("b"), coalesce(col("cb"), col("b"))).as("b"),
          (col("cf") < col("f") || col("cb") < col("b")).as("moved"))
      val t = Iter.truncate(next, checkpointDir)
      changed = t.filter(col("moved")).count()
      lab = t.select(col("v"), col("f"), col("b"))
    }
    lab
  }

  /** @param edges (u, w) directed pairs over `nodes` (v). Returns
    * (v, scc_id) with scc_id = the minimum label of v's SCC. */
  def components(nodes: DataFrame, edges: DataFrame,
      checkpointDir: Option[String] = None,
      maxOuter: Int = 64): DataFrame = {
    // truncate the INPUTS once: the fixpoint re-reads these relations
    // every round, and an expensive upstream plan (window-built
    // fixtures, joins) must not re-execute per round
    var remaining = Iter.truncate(nodes.select(col("v")), checkpointDir)
    var es = Iter.truncate(edges.select(col("u"), col("w")), checkpointDir)
    var acc: Option[DataFrame] = None
    var outer = 0
    var left = remaining.count()
    while (left > 0) {
      require(outer < maxOuter, s"SCC peeling exceeded $maxOuter rounds")
      val assigned = reachMins(remaining, es, checkpointDir)
        .filter(col("f") === col("b"))
        .select(col("v"), col("f").as("scc_id"))
      acc = Some(acc.map(_.unionByName(assigned)).getOrElse(assigned))
      remaining = Iter.truncate(
        remaining.join(assigned.select(col("v")), Seq("v"), "left_anti"),
        checkpointDir)
      // keep only edges with BOTH endpoints still unassigned
      es = Iter.truncate(
        es.join(remaining.select(col("v").as("u")), Seq("u"), "left_semi")
          .join(remaining.select(col("v").as("w")), Seq("w"), "left_semi")
          .select(col("u"), col("w")),
        checkpointDir)
      left = remaining.count()
      outer += 1
    }
    acc.getOrElse(nodes.select(col("v"), col("v").as("scc_id")).limit(0))
  }
}
