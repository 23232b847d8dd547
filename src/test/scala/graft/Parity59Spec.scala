package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for batch 8 (round 12): the composed curation pipeline. */
class Parity59Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("x7_curation_e2e: every stage bites, supplies shrink " +
      "monotonically, and the allocator invariants hold end to end") {
    val rows = graft.queries.Parity59.queries("x7_curation_e2e")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val docs = graft.Tables.documents(spark, sf)
    val nTotal = docs.count()
    val nGated = graft.queries.Parity56.gopherRules(docs)
      .filter(col("pass") === 1).count()
    val nKept = rows.map(_.getAs[Long]("n_docs")).sum
    // stage bite: the gate rejects docs, and dedup+composition keep
    // at most the gated survivors
    assert(nGated < nTotal, "gate rejected nothing — dead stage")
    assert(nKept <= nGated, "pipeline kept more docs than the gate passed")
    assert(nKept > 0)
    // effective supply never exceeds the raw curated token mass
    val rawToks = graft.queries.Parity56.gopherRules(docs)
      .filter(col("pass") === 1)
      .agg(sum(col("wc"))).collect()(0).getLong(0)
    val effToks = rows.map(_.getAs[Long]("toks_eff")).sum
    assert(effToks <= rawToks,
      "soft weighting must never inflate the token supply")
    // allocator invariants on the curated supply
    rows.foreach { r =>
      val toks = r.getAs[Long]("toks_eff")
      val fin = r.getAs[Long]("final_alloc")
      assert(fin <= 4 * toks, "repeat ceiling")
      assert(r.getAs[Long]("epochs_milli") <= 4000L)
      assert(r.getAs[Long]("capped") ==
        (if (r.getAs[Long]("alloc") > 4 * toks) 1L else 0L))
    }
    val budget = 3L * rows.map(_.getAs[Long]("toks_eff")).sum
    assert(rows.map(_.getAs[Long]("final_alloc")).sum <= budget)
  }
}
