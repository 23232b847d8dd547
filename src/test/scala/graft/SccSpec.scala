package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Scc

/** FW-BW min-label SCC contract: mixed component sizes, direction
  * sensitivity (a one-way edge never merges), singleton components,
  * and the DAG-depth peel-round law (pinned via maxOuter).
  */
class SccSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def run(ns: Seq[Long], es: Seq[(Long, Long)],
      maxOuter: Int = 64): Map[Long, Long] = {
    import spark.implicits._
    Scc.components(ns.toDF("v"), es.toDF("u", "w"), maxOuter = maxOuter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("mixed sizes: a 3-cycle, a 2-cycle, and a singleton; one-way " +
      "bridges between them do NOT merge (direction matters)") {
    val ns = Seq(1L, 2L, 3L, 7L, 8L, 9L)
    val es = Seq(
      1L -> 2L, 2L -> 3L, 3L -> 1L, // SCC {1,2,3}
      7L -> 8L, 8L -> 7L,           // SCC {7,8}
      3L -> 7L, 8L -> 9L)           // one-way bridges; 9 singleton
    assert(run(ns, es) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      7L -> 7L, 8L -> 7L, 9L -> 9L))
  }

  test("a back edge DOES merge: adding the reverse bridge fuses the " +
      "two cycles into one component") {
    val ns = Seq(1L, 2L, 3L, 7L, 8L)
    val es = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 7L -> 8L, 8L -> 7L,
      3L -> 7L, 7L -> 1L) // bridge + back edge
    assert(run(ns, es) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L, 8L -> 1L))
  }

  test("DAG chain of singletons peels one component per round: " +
      "depth 3 needs 3 outer rounds, refuses at 2") {
    val ns = Seq(1L, 2L, 3L)
    val es = Seq(3L -> 2L, 2L -> 1L)
    assert(run(ns, es, maxOuter = 3) ==
      Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
    intercept[IllegalArgumentException] {
      run(ns, es, maxOuter = 2)
    }
  }

  test("isolated nodes (no edges at all) are their own components") {
    assert(run(Seq(5L, 6L), Seq.empty) == Map(5L -> 5L, 6L -> 6L))
  }
}
