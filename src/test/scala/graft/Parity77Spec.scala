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

  import org.apache.spark.sql.functions.{col, count, lit, sum}

  /** Symmetrized unit-weight (src, dst, w, wout) edge relation. */
  private def e2of(es: (Long, Long)*): DataFrame = {
    import spark.implicits._
    val und = es.toDF("src", "dst")
      .unionAll(es.map(_.swap).toDF("src", "dst"))
    val e = und.groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("w"))
    e.join(e.groupBy(col("src")).agg(sum(col("w")).as("wout")),
      Seq("src"))
  }

  private def pprOf(e2: DataFrame,
      seed: org.apache.spark.sql.Column): Map[Long, Long] =
    graft.queries.Parity77.ppr(e2, seed)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("r")).toMap

  test("personalized PageRank: rank is proximity to the seed — " +
      "monotone along a path, zero beyond the seed's component, " +
      "mass near-conserved") {
    val r = pprOf(e2of(1L -> 2L, 2L -> 3L, 3L -> 4L),
      col("node") === 1L)
    // the path is BIPARTITE: without a lazy step, mass oscillates
    // between the parity classes each push, so decay-with-distance
    // holds WITHIN a parity side after any fixed round count (the
    // real order graph has odd cycles and no such oscillation)
    assert(r(2L) > r(4L) && r(1L) > r(3L),
      s"rank must decay with distance within a parity side: $r")
    // symmetric neighbors are exchangeable: equal rank by symmetry
    val st = pprOf(e2of(0L -> 1L, 0L -> 2L, 0L -> 3L),
      col("node") === 0L)
    assert(st(1L) == st(2L) && st(2L) == st(3L),
      s"symmetric leaves must tie: $st")
    val d = pprOf(e2of(1L -> 2L, 3L -> 4L), col("node") === 1L)
    assert(d(3L) == 0L && d(4L) == 0L,
      s"the seed's teleport never reaches the other component: $d")
    val total = d(1L) + d(2L)
    assert(total > 990000000000L && total <= 1000000000000L,
      s"mass stays in the seed component, minus DIV truncation: $total")
  }

  test("Luby MIS: independent (no edge inside the set), maximal " +
      "(every outside node has a set neighbor), converged on planted " +
      "graphs; a triangle yields exactly one member in round 0") {
    def misOf(es: Seq[(Long, Long)]): Map[Long, (String, Int)] =
      graft.queries.Parity77.luby(edges(es: _*), rounds = 4)
        .collect().map(r => r.getLong(0) ->
          (r.getString(1), r.getInt(2))).toMap
    def check(es: Seq[(Long, Long)]): Map[Long, (String, Int)] = {
      val m = misOf(es)
      val mis = m.collect { case (n, ("mis", _)) => n }.toSet
      assert(!m.values.exists(_._1 == "undecided"),
        s"planted graphs must converge inside the unroll: $m")
      es.foreach { case (a, b) =>
        assert(!(mis(a) && mis(b)),
          s"edge ($a,$b) inside the independent set: $m")
      }
      val adj = (es ++ es.map(_.swap)).groupBy(_._1)
        .map { case (k, v) => k -> v.map(_._2).toSet }
      m.collect { case (n, (st, _)) if st == "removed" => n }
        .foreach { n =>
          assert(adj(n).exists(mis),
            s"removed node $n has no MIS neighbor (not maximal): $m")
        }
      m
    }
    val tri = check(Seq(1L -> 2L, 2L -> 3L, 1L -> 3L))
    assert(tri.values.count(_._1 == "mis") == 1 &&
      tri.values.forall(_._2 == 0),
      s"a triangle decides entirely in round 0 with one winner: $tri")
    check(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L))
    check(Seq(0L -> 1L, 0L -> 2L, 0L -> 3L, 0L -> 4L))
  }

  test("Luby MIS message arm is bit-equal to the broadcast arm " +
      "(node, status, round) on planted graphs — the shared-oracle " +
      "contract x9_mis routes on") {
    def both(es: Seq[(Long, Long)]): Unit = {
      def run(msg: Boolean): Set[(Long, String, Int)] =
        graft.queries.Parity77.luby(edges(es: _*), rounds = 4, msg = msg)
          .collect()
          .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
      assert(run(msg = true) == run(msg = false),
        s"arms diverge on $es")
    }
    both(Seq(1L -> 2L, 2L -> 3L, 1L -> 3L))
    both(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L))
    both(Seq(0L -> 1L, 0L -> 2L, 0L -> 3L, 0L -> 4L))
    // a denser planted graph: two cliques sharing a bridge
    both(Seq(1L -> 2L, 1L -> 3L, 2L -> 3L, 3L -> 4L,
      4L -> 5L, 4L -> 6L, 5L -> 6L))
  }
}
