package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted pins for the round-14 batch-7 stages (queries/Parity73):
  * blocklist gate arithmetic on hand-built docs, record-linkage twin
  * merging + the multi-pass blocking guarantee, and random-walk
  * validity (edges only, deterministic, exact length). */
class Parity73Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // ---- x4_blocklist_gate -------------------------------------------

  private def gate(rows: (Long, String)*) = {
    import spark.implicits._
    graft.queries.Parity73.blocklistGate(rows.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(_._1).toSeq
  }

  test("blocklist gate: hard term blocks regardless of ratio; soft " +
      "ratio blocks at >= 120 milli; clean doc passes") {
    val got = gate(
      1L -> "fast scan dup fast scan fast scan fast",          // 1 hard hit
      2L -> "slow slow big fast scan fast scan fast",          // 3/8 bad
      3L -> "fast scan fast scan fast scan fast scan fast")    // clean
    assert(got == Seq(
      (1L, 8L, 0L, 0L, 1L, 1L),
      (2L, 8L, 3L, 375L, 0L, 1L),
      (3L, 9L, 0L, 0L, 0L, 0L)))
  }

  test("blocklist gate: tokenization strips punctuation/case and an " +
      "empty doc is safe (no division by zero)") {
    val got = gate(
      1L -> "SLOW, slow; Big!",   // 3/3 bad after normalization
      2L -> "... !!")             // zero tokens
    assert(got == Seq(
      (1L, 3L, 3L, 1000L, 0L, 1L),
      (2L, 0L, 0L, 0L, 0L, 0L)))
  }

  // ---- x2_record_linkage -------------------------------------------

  private def link(rows: (Long, String, Int, Double, String)*) = {
    import spark.implicits._
    graft.queries.Parity73.recordLinkage(
        rows.toDF("rec_id", "name", "nat", "bal", "seg"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
  }

  test("record linkage: a one-edit twin with close balance merges; " +
      "an unrelated same-block record does not") {
    val got = link(
      (1L, "Acme Corp", 7, 120.0, "BUILDING"),
      (2L, "Acme CorX", 7, 121.5, "BUILDING"),   // twin of 1
      (3L, "Zeta Systems", 7, 125.0, "BUILDING")) // same block, far name
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 3L)))
  }

  test("record linkage: multi-pass blocking catches a pair straddling " +
      "a balance-band boundary") {
    // 99.9 and 100.8 fall in different floor(bal/100) bands but the
    // +50-shifted pass co-blocks them; they must still merge
    val got = link(
      (1L, "Acme Corp", 7, 99.9, "BUILDING"),
      (2L, "Acme CorX", 7, 100.8, "BUILDING"))
    assert(got == Seq((1L, 1L), (2L, 1L)))
  }

  test("record linkage: transitive chain a~b~c collapses into one " +
      "entity even when a and c disagree on two fields") {
    // a-b one edit apart, b-c one edit apart, a-c two edits (750 + 300
    // + 200 = 1250 each adjacent pair; a-c alone scores 1000 < gate)
    val got = link(
      (1L, "Acme Corp", 7, 120.0, "BUILDING"),
      (2L, "Acme CorX", 7, 121.0, "BUILDING"),
      (3L, "Acme CorXY", 7, 122.0, "BUILDING"))
    assert(got.map(_._2).distinct == Seq(1L))
  }

  // ---- x9_random_walk ----------------------------------------------

  private def walks(seedHex: String, steps: Int,
      edges: (Long, Long)*) = {
    import spark.implicits._
    val e = edges.toDF("node", "nb")
    val adj = e.unionAll(e.select(col("nb").as("node"),
      col("node").as("nb")))
    graft.queries.Parity73.randomWalks(adj, seedHex, steps)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
  }

  test("random walks: every consecutive step is a graph edge and " +
      "every walk has exactly steps+1 positions") {
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L, 2L -> 4L)
    val es = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    val got = walks("fff", 4, edges: _*) // all nodes seeded
    val byWalk = got.groupBy(_._1)
    assert(byWalk.size == 4 && byWalk.values.forall(_.length == 5))
    for ((_, tr) <- byWalk) {
      val path = tr.sortBy(_._2).map(_._3)
      assert(path.zip(path.tail).forall(es.contains),
        s"non-edge transition in $path")
      assert(tr.sortBy(_._2).map(_._2).toSeq == (0L to 4L))
    }
  }

  test("random walks: deterministic — two runs produce identical " +
      "trajectories, and the seed filter selects walk = start node") {
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L)
    val a = walks("fff", 3, edges: _*).sortBy(t => (t._1, t._2)).toSeq
    val b = walks("fff", 3, edges: _*).sortBy(t => (t._1, t._2)).toSeq
    assert(a == b)
    assert(a.filter(_._2 == 0L).forall(t => t._1 == t._3))
  }

  test("random walks: the message arm produces bit-equal " +
      "trajectories to the broadcast arm — the shared-oracle " +
      "contract x9_random_walk routes on") {
    import spark.implicits._
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L, 2L -> 4L)
    val e = edges.toDF("node", "nb")
    val adj = e.unionAll(e.select(col("nb").as("node"),
      col("node").as("nb")))
    def run(msg: Boolean): Set[(Long, Long, Long)] =
      graft.queries.Parity73.randomWalks(adj, "fff", 4, msg = msg)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(msg = true) == run(msg = false))
  }
}
