package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-geometry pins for the sampled-source harmonic centrality
  * (queries/Parity64): exact 1/d milli sums on a path, the hop bound,
  * and min-dist-on-first-visit over a shortcut. */
class Parity64Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def undirected(edges: (Long, Long)*) = {
    import spark.implicits._
    val e = edges.toDF("node", "nb")
    e.unionAll(e.select(col("nb").as("node"), col("node").as("nb")))
  }

  private def seeds(ss: Long*) = {
    import spark.implicits._
    ss.toDF("src")
  }

  private def run(s: org.apache.spark.sql.DataFrame,
      adj: org.apache.spark.sql.DataFrame, depth: Int) =
    graft.queries.Parity64.harmonic(s, adj, depth)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq

  test("path 1-2-3-4 from source 1: exact milli harmonic " +
      "1000 + 500 + 333") {
    val got = run(seeds(1L), undirected(1L -> 2L, 2L -> 3L, 3L -> 4L), 3)
    assert(got == Seq((1L, 3L, 1833L)))
  }

  test("hop bound truncates: depth 2 on the same path reaches only " +
      "2 nodes") {
    val got = run(seeds(1L), undirected(1L -> 2L, 2L -> 3L, 3L -> 4L), 2)
    assert(got == Seq((1L, 2L, 1500L)))
  }

  test("shortcut wins: first visit records the MIN distance, not a " +
      "longer later path") {
    // 1-2-3 path plus a direct 1-3 edge: d(1,3) must be 1, not 2
    val got = run(seeds(1L),
      undirected(1L -> 2L, 2L -> 3L, 1L -> 3L), 3)
    assert(got == Seq((1L, 2L, 2000L)))
  }

  test("multiple sources run independently (per-source distances)") {
    val adj = undirected(1L -> 2L, 2L -> 3L)
    val got = run(seeds(1L, 3L), adj, 3).sortBy(_._1)
    // from 1: d(2)=1, d(3)=2 -> 1500; from 3 symmetric
    assert(got == Seq((1L, 2L, 1500L), (3L, 2L, 1500L)))
  }
}
