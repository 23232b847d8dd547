package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for batch 9 (round 11): changepoint lands exactly on a
  * planted step, mixture arithmetic on skewed sources, and the
  * cosine histogram's clamped top bin.
  */
class Parity40Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("x5_changepoint: a clean level shift is localized exactly and " +
      "absorbs ALL the variance") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p40cp").toString
    // days 0..4 at 1.0, days 5..9 at 9.0 -> split after k=5,
    // cost_none = 410 - 50^2/10 = 160, cost_split = 0, reduction 1
    val rows = (0 until 5).map(d => (d, 1.0)) ++
      (5 until 10).map(d => (d, 9.0))
    rows.zipWithIndex.map { case ((day, v), i) =>
      (i.toLong, java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(day.toLong)
          .atTime(12, 0)), 1L, "click", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.queries.Parity40.queries("x5_changepoint")(spark, dir)
      .collect()(0)
    assert(r.getAs[Long]("split_k") == 5L, "break after the 5th day")
    assert(r.getAs[Double]("cost_none") == 160.0)
    assert(r.getAs[Double]("cost_split") == 0.0)
    assert(r.getAs[Double]("sse_reduction") == 1.0)
  }

  test("x7_mixture_plan: {10,20,30} docs with uniform target 20 -> " +
      "deficit source capped at 1.0, surplus source downsampled") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p40mx").toString
    val docs = (0 until 10).map(i => (i.toLong, "a")) ++
      (10 until 30).map(i => (i.toLong, "b")) ++
      (30 until 60).map(i => (i.toLong, "c"))
    docs.toDF("doc_id", "source")
      .withColumn("text", lit("x y z")).withColumn("lang", lit("en"))
      .withColumn("n_chars", lit(5))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val m = graft.queries.Parity40.queries("x7_mixture_plan")(spark, dir)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(m("a").getAs[Double]("sample_rate") == 1.0)
    assert(m("a").getAs[Long]("deficit") == 1L)
    assert(m("a").getAs[Long]("expected_rows") == 10L)
    assert(m("b").getAs[Long]("deficit") == 0L)
    assert(m("c").getAs[Double]("sample_rate") == 0.66666667)
    assert(m("c").getAs[Long]("expected_rows") == 20L)
  }

  test("x3_cos_histogram: identical pair lands in the clamped top " +
      "bin; orthogonal pairs at bin 0; shares telescope") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p40ch").toString
    Seq((1L, Array(1.0f, 0.0f), "l"), (2L, Array(1.0f, 0.0f), "l"),
      (3L, Array(0.0f, 1.0f), "l"))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val m = graft.queries.Parity40.queries("x3_cos_histogram")(spark, dir)
      .collect().map(r => r.getAs[Long]("bin") -> r).toMap
    assert(m(9L).getAs[Long]("n_pairs") == 1L,
      "cos=1.0 clamps into bin 9, not a phantom bin 10")
    assert(m(0L).getAs[Long]("n_pairs") == 2L)
    assert(m(0L).getAs[Double]("share_ge") == 1.0,
      "tau=0 keeps every pair")
    assert(m(9L).getAs[Long]("cum_ge") == 1L)
  }
}
