package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted pins for filtered vector search (queries/Parity74):
  * predicate exclusion on the exact arm, and the exhaustive-probe
  * identity on the filter-during-search ANN arm. */
class Parity74Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Vectors on axes: id i gets a one-hot-ish vector so cosines are
    * hand-computable. */
  private def emb(rows: (Long, Int, Seq[Double])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "label", "embedding")
  }

  test("filtered exact top-k: the GLOBAL best neighbor is excluded " +
      "when it fails the predicate; every hit satisfies it") {
    // probe = (1,0,0,0). id 10 is nearly parallel (cos ~ 1) but has
    // label 0; ids 12/14 pass the filter with lower cosine
    val e = emb(
      (0L, 1, Seq(1.0, 0.0, 0.0, 0.0)),          // probe
      (10L, 0, Seq(0.99, 0.1, 0.0, 0.0)),        // best, filtered OUT
      (12L, 1, Seq(0.8, 0.6, 0.0, 0.0)),
      (14L, 1, Seq(0.5, 0.8, 0.0, 0.0)),
      (16L, 1, Seq(0.0, 1.0, 0.0, 0.0)))
    val pred = col("label") === 1 && col("vec_id") % 2 === 0
    val got = Similarity.exactTopK(
        e.filter(pred), e.filter(col("vec_id") === 0), k = 2)
      .collect().map(r => (r.getLong(1), r.getInt(3))).toSeq
    assert(got == Seq((12L, 1), (14L, 2)))
  }

  test("filter-during-search at the probe cap (nProbe = nLists) " +
      "equals the filtered exact top-k — exhaustive probing is exact") {
    import spark.implicits._
    // 32 vectors in 4 rough direction clusters, even ids filtered in
    val rows = (0L until 32L).map { i =>
      val c = (i % 4).toInt
      val base = Array.fill(4)(0.05)
      base(c) = 1.0
      // small deterministic wiggle so vectors are distinct
      base((c + 1) % 4) += 0.01 * (i / 4 % 5)
      (i, c, base.toSeq)
    }
    val e = rows.toDF("vec_id", "label", "embedding")
    val flt = e.filter(col("vec_id") % 2 === 0)
    val prb = e.filter(col("vec_id") < 2)
    val cents = Similarity.kmeansCentroids(e, k = 4, iters = 2)
    val ann = Similarity.ivfTopK(flt, prb, k = 3, nLists = 4,
        nProbe = 4, centroids = Some(cents))
      .select(col("probe_id"), col("id"), col("rk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val exact = Similarity.exactTopK(flt, prb, k = 3)
      .select(col("probe_id"), col("id"), col("rk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(ann == exact)
    assert(ann.forall(_._2 % 2 == 0))
  }
}
