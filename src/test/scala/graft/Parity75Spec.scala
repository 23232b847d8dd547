package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-geometry pins for sampled-source betweenness
  * (queries/Parity75): exact milli dependency sums on a path, a
  * star, and the σ=2 diamond. */
class Parity75Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def undirected(edges: (Long, Long)*) = {
    import spark.implicits._
    val e = edges.toDF("node", "nb")
    e.unionAll(e.select(col("nb").as("node"), col("node").as("nb")))
  }

  private def run(srcs: Seq[Long], edges: (Long, Long)*) = {
    import spark.implicits._
    graft.queries.Parity75.betweenness(srcs.toDF("src"),
        undirected(edges: _*))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
  }

  test("path 1-2-3: only the middle node carries betweenness — " +
      "1000 milli from each endpoint source") {
    val got = run(Seq(1L, 2L, 3L), 1L -> 2L, 2L -> 3L)
    assert(got == Seq((2L, 2000L, 2L)))
  }

  test("star: the center brokers every leaf pair — 2000 milli per " +
      "leaf source, leaves carry nothing") {
    val got = run(Seq(0L, 1L, 2L, 3L),
      1L -> 0L, 2L -> 0L, 3L -> 0L)
    assert(got == Seq((0L, 6000L, 6L)))
  }

  test("diamond s-{a,b}-t: two shortest paths split the dependency " +
      "(sigma = 2 -> 500 milli per side), all four nodes symmetric") {
    val got = run(Seq(1L, 2L, 3L, 4L),
      1L -> 2L, 1L -> 3L, 2L -> 4L, 3L -> 4L)
    assert(got == Seq((1L, 1000L, 2L), (2L, 1000L, 2L),
      (3L, 1000L, 2L), (4L, 1000L, 2L)))
  }

  test("source sampling is additive: the path score from one " +
      "endpoint source alone is half the both-endpoints score") {
    val got = run(Seq(1L), 1L -> 2L, 2L -> 3L)
    assert(got == Seq((2L, 1000L, 1L)))
  }
}
