package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for batch 19 (round 11): the sample curve's structural
  * invariants — nesting, the full tier as identity, and the rate²
  * prediction landing near 1 on uniform duplicates.
  */
class Parity50Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("x2_sample_curve: tiers nest, the full tier is the identity, " +
      "and found pairs shrink monotonically") {
    val d = "/root/testdata/sf0.01"
    val rows = graft.queries.Parity50.queries("x2_sample_curve")(spark, d)
      .collect().sortBy(_.getAs[String]("tier"))
    val g0 = rows.head
    assert(g0.getAs[String]("tier") == "g0")
    assert(g0.getAs[Double]("doc_rate") == 1.0)
    assert(g0.getAs[Double]("scale_factor") == 1.0)
    val docs = rows.map(_.getAs[Long]("n_docs"))
    val pairs = rows.map(_.getAs[Long]("n_pairs"))
    assert(docs.sliding(2).forall(w => w.length < 2 || w(0) >= w(1)),
      "nested thresholds -> monotone doc counts")
    assert(pairs.sliding(2).forall(w => w.length < 2 || w(0) >= w(1)),
      "a pair present at a tier is present at every larger tier")
    // with md5-uniform sampling and uniform duplicates the rate^-2
    // model should land within a small factor of 1 at the 1/2 tier
    val g1 = rows(1)
    val pred = g1.getAs[Double]("vs_rate2_prediction")
    assert(pred > 0.3 && pred < 3.0,
      s"half-rate tier should be within 3x of the rate^2 model: $pred")
  }
}
