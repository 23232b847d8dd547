package graft

import graft.queries.Parity66
import org.scalatest.funsuite.AnyFunSuite

/** Pins x3_dim_truncation's audit semantics on planted corpora: a
  * prefix that carries the whole signal scores full recall at every
  * budget; a suffix-only signal is INVISIBLE to truncated retrieval
  * until the budget covers it; the ground-truth row is exact. */
class Parity66Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** 64-dim embedding with `v` at the 1-based positions in `at`. */
  private def vec(at: Map[Int, Float]): Array[Float] = {
    val a = Array.fill(64)(0.0f)
    at.foreach { case (i, v) => a(i - 1) = v }
    a
  }

  private def run(rows: (Long, Array[Float])*)
      : Map[(Long, Long), (Long, Long)] = {
    import spark.implicits._
    Parity66.truncationAudit(rows.toDF("vec_id", "embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("prefix-only signal: every budget sees the full ranking -> " +
      "recall 1000 at 8/16/32/64; ground-truth row exact by identity") {
    // probe 0 + 12 corpus vectors whose similarity to the probe is
    // entirely in dimension 1 (graded), nothing past dimension 8
    val corpus = (1L to 12L).map { i =>
      i -> vec(Map(1 -> (1.0f + i), 2 -> 0.5f))
    }
    val out = run((0L -> vec(Map(1 -> 1.0f, 2 -> 0.5f))) +: corpus: _*)
    for (dims <- Seq(8L, 16L, 32L, 64L)) {
      assert(out((0L, dims)) == ((10L, 1000L)),
        s"prefix signal must give full recall at dims=$dims")
    }
  }

  test("suffix-only signal: truncated budgets cannot see it — " +
      "recall collapses below the signal dimension and recovers at 64") {
    // the probe matches corpus vectors ONLY via dimensions 33..64;
    // dimensions 1..32 carry an ANTI-correlated decoy ordering
    // (reversed grading), so the 8/16/32-dim rankings invert the truth
    val corpus = (1L to 20L).map { i =>
      i -> vec(Map(3 -> (30.0f - i), 40 -> (100.0f + 10 * i)))
    }
    val probe = 0L -> vec(Map(3 -> 1.0f, 40 -> 1.0f))
    val out = run(probe +: corpus: _*)
    assert(out((0L, 64L)) == ((10L, 1000L)), "truth row is identity")
    // with 20 candidates and K=10, the reversed decoy ordering picks
    // exactly the complement of the true top-10 at every truncated
    // budget: overlap 0
    for (dims <- Seq(8L, 16L, 32L)) {
      assert(out((0L, dims)) == ((0L, 0L)),
        s"suffix signal must be invisible at dims=$dims: " +
          s"${out((0L, dims))}")
    }
  }
}
