package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the drift/lineage/embedding-compression batch
  * beyond their DuckDB oracles. */
class Parity16Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("x6_source_drift: chi is non-negative and directions are consistent") {
    val out = SparkEntry.queries("x6_source_drift")(spark, sf)
    assert(out.count() > 0)
    assert(out.filter(col("chi") < 0).isEmpty)
    // direction must agree with the o-vs-e comparison chi encodes:
    // an 'over' row has o*N >= rt*ct (integer form of o >= e)
    assert(out.filter(!col("direction").isin("over", "under")).isEmpty)
  }

  test("x1_dedup_lineage: keepers absorb, never appear as dropped") {
    val out = SparkEntry.queries("x1_dedup_lineage")(spark, sf)
    assert(out.count() > 0, "gate corpus must contain prefix duplicates")
    // keeper is the min id of its group: always below what it absorbs
    assert(out.filter(col("keeper_id") >= col("dropped_id")).isEmpty)
    // no doc is both dropped and a keeper
    val both = out.select(col("dropped_id").as("id"))
      .join(out.select(col("keeper_id").as("id")), Seq("id"))
    assert(both.isEmpty)
  }

  test("x3_vector_quantize: reconstruction stays within half-step error") {
    val emb = Tables.embeddings(spark, sf)
    val out = SparkEntry.queries("x3_vector_quantize")(spark, sf)
    // |x_i - q_i * scale| <= scale/2 for every component: verify on a
    // sample row by recomputing in the driver
    val row = out.orderBy(col("vec_id")).limit(1)
      .join(emb, Seq("vec_id")).head()
    val scale = row.getAs[Double]("q_scale")
    val q = row.getAs[String]("q_vec").split(",").map(_.toInt)
    val x = row.getSeq[Float](row.fieldIndex("embedding"))
    assert(q.length == x.length)
    x.indices.foreach { i =>
      assert(math.abs(x(i) - q(i) * scale) <= scale / 2 + 1e-12,
        s"component $i out of quantization bound")
    }
    // int8 range respected
    assert(q.forall(v => v >= -127 && v <= 127))
  }

  test("x3_embed_cluster_dedup: exactly one keeper per cluster") {
    val out = SparkEntry.queries("x3_embed_cluster_dedup")(spark, sf)
    val perComp = out.groupBy(col("comp"))
      .agg(sum(col("is_keeper")).as("k"), count(lit(1)).as("n"),
        max(col("n_members")).as("m"))
    assert(perComp.filter(col("k") =!= 1).isEmpty)
    assert(perComp.filter(col("n") =!= col("m")).isEmpty)
    // clustering is transitive: some cluster must exceed 2 members on
    // the planted corpus (chains collapse)
    assert(out.filter(col("n_members") >= 2).count() > 0)
  }
}
