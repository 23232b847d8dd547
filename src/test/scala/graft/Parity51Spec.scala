package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pin for batch 20 (round 11): the drift matrix's closed form on
  * planted group means.
  */
class Parity51Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("x3_embed_drift: planted groups give the exact squared " +
      "mean distance; identical groups give 0") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p51ed").toString
    // A: mean [1,0]; B: mean [4,1] -> dist2 = 9 + 1 = 10
    // C: copies of A's vectors -> dist2(A,C) = 0
    Seq((1L, Array(0.0f, 0.0f), "a"), (2L, Array(2.0f, 0.0f), "a"),
      (3L, Array(4.0f, 0.0f), "b"), (4L, Array(4.0f, 2.0f), "b"),
      (5L, Array(0.0f, 0.0f), "c"), (6L, Array(2.0f, 0.0f), "c"))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val m = graft.queries.Parity51.queries("x3_embed_drift")(spark, dir)
      .collect().map(r => (r.getAs[String]("la"), r.getAs[String]("lb"))
        -> r.getAs[Double]("mean_dist2")).toMap
    assert(m(("a", "b")) == 10.0)
    assert(m(("a", "c")) == 0.0, "identical distributions: no drift")
    assert(m(("b", "c")) == 10.0)
  }
}
