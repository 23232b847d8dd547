package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for batch 14: clustering coefficient (triangle+tail = 0.6),
  * assortativity (a star is perfectly disassortative, r = -1),
  * burst detection (planted spike fires, flat stream doesn't), and
  * the dataset card (hand-countable planted stats). */
class Parity27Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("x9_clustering_coeff: triangle with a tail gives 3*1/5") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p27cc").toString
    // triangle {1,2,3} + edge 3-4: wedges 1+1+3+0 = 5, triangles 1
    Seq((10L, 1L), (10L, 2L), (10L, 3L), (11L, 3L), (11L, 4L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = graft.queries.Parity27.queries("x9_clustering_coeff")(
      spark, dir).collect().head
    assert(r.getAs[Long]("n_wedges") == 5L)
    assert(r.getAs[Long]("n_triangles") == 1L)
    assert(r.getAs[Double]("global_cc") == 0.6)
  }

  test("x9_assortativity: a star is perfectly disassortative") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p27as").toString
    Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 3L), (12L, 1L), (12L, 4L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = graft.queries.Parity27.queries("x9_assortativity")(
      spark, dir).collect().head
    assert(r.getAs[Double]("assortativity") == -1.0)
    assert(r.getAs[Long]("n_directed_edges") == 6L)
  }

  test("x5_burst_detect: planted spike fires; flat stream stays quiet") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p27bu").toString
    def ts(min: Int, sec: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-10 10:$min%02d:$sec%02d")
    // click: 20 quiet minutes of 1 event + minute 20 with 50 events
    // (mu=3.33, sigma=10.4 -> threshold 34.6 < 50). view: constant.
    val click = (0 until 20).map(m => (ts(m, 0), "click")) ++
      (0 until 50).map(i => (ts(20, i), "click"))
    val view = (0 until 10).map(m => (ts(m, 0), "view"))
    (click ++ view).zipWithIndex.map { case ((t, et), i) =>
      (i.toLong, t, 1L, et, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = graft.queries.Parity27.queries("x5_burst_detect")(
      spark, dir).collect()
    assert(rows.length == 1, rows.mkString(","))
    assert(rows.head.getAs[String]("event_type") == "click")
    assert(rows.head.getAs[Long]("cnt") == 50L)
  }

  test("x7_dataset_card: planted per-source stats are exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p27dc").toString
    Seq((1L, "a b c", "en", "s1", 5L), (2L, "d e", "fr", "s1", 3L),
      (3L, "x", "en", "s2", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val m = graft.queries.Parity27.queries("x7_dataset_card")(spark, dir)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val s1 = m("s1")
    assert(s1.getAs[Long]("n_docs") == 2L)
    assert(s1.getAs[Long]("n_tokens") == 5L)
    assert(s1.getAs[Double]("mean_tokens") == 2.5)
    assert(s1.getAs[Long]("n_langs") == 2L)
    assert(s1.getAs[Long]("n_en") == 1L)
    assert(m("s2").getAs[Long]("n_tokens") == 1L)
  }
}
