package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** k-truss peeling semantics on planted graphs: clique fixpoints,
  * triangle-free death, pendant shedding, and cascade behavior the
  * fixed unroll must reproduce. */
class Parity77Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def edges(es: (Long, Long)*): DataFrame = {
    import spark.implicits._
    es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("u", "v")
  }

  private def clique(nodes: Seq[Long]): Seq[(Long, Long)] =
    for {
      i <- nodes.indices
      j <- (i + 1) until nodes.size
    } yield (nodes(i), nodes(j))

  private def result(e: DataFrame, k: Int, rounds: Int) =
    graft.queries.Parity77.ktruss(e, k, rounds)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap

  test("a 5-clique is a 5-truss: survives k=5 peeling unchanged, " +
      "every edge closing exactly 3 triangles") {
    val r = result(edges(clique(1L to 5L): _*), k = 5, rounds = 3)
    assert(r.size == 10, "all 10 clique edges survive")
    assert(r.values.forall(_ == 3L), s"every edge supports 3: $r")
  }

  test("a chordless cycle has zero triangles: k=4 peeling empties " +
      "it in one round") {
    val cyc = edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L,
      5L -> 6L, 6L -> 1L)
    assert(result(cyc, k = 4, rounds = 1).isEmpty)
  }

  test("pendant triangle sheds, core clique survives: k=4 keeps the " +
      "4-clique (support 2) and drops the attached triangle " +
      "(support 1)") {
    val e = edges(clique(1L to 4L) ++
      Seq(4L -> 5L, 4L -> 6L, 5L -> 6L): _*)
    val r = result(e, k = 4, rounds = 2)
    assert(r.keySet == clique(1L to 4L).toSet,
      s"exactly the 4-clique survives: ${r.keySet}")
    assert(r.values.forall(_ == 2L))
  }

  test("peeling CASCADES: removing weak edges drops neighbors' " +
      "support below threshold in the NEXT round (fixed unroll must " +
      "show the multi-round wave, and a converged graph is a " +
      "fixpoint under further rounds)") {
    // two 4-cliques sharing edge (1,2), plus a bridge triangle
    // hanging off node 4: round 1 kills the bridge triangle only;
    // the cliques are stable at k=4
    val e = edges(clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(1L, 2L, 5L, 6L)) ++
      Seq(4L -> 7L, 4L -> 8L, 7L -> 8L): _*)
    val r1 = result(e, k = 4, rounds = 1)
    val r3 = result(e, k = 4, rounds = 3)
    assert(r1 == r3, "round 1 already converged here")
    assert(r3.keySet ==
      (clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(1L, 2L, 5L, 6L))).toSet)
    // shared edge (1,2) sits in BOTH cliques: support 4
    assert(r3((1L, 2L)) == 4L)
    // a genuinely cascading case: triangle chain 1-2-3, 2-3-4 at
    // k=4 — edge (1,2) has support 1, dies round 1; that drops
    // (2,3) to support 1, which dies round 2
    val chain = edges(1L -> 2L, 1L -> 3L, 2L -> 3L, 2L -> 4L,
      3L -> 4L)
    val c1 = result(chain, k = 4, rounds = 1)
    val c2 = result(chain, k = 4, rounds = 2)
    assert(c1.nonEmpty && c2.isEmpty,
      s"the wave takes two rounds: after r1 $c1, after r2 $c2")
  }
}
