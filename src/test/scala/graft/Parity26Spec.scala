package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for batch 13: source-overlap Jaccard (planted shared/disjoint
  * vocabularies), BFS hop distances (planted chain with a known seed
  * and an out-of-budget tail), and PSI (identical halves = 0, shifted
  * halves > 0). */
class Parity26Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("x4_source_overlap: shared pair scores 0.5, disjoint pair is absent") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p26ov").toString
    Seq((1L, "a b c", "en", "srcA", 5L),
      (2L, "b c d", "en", "srcB", 5L),
      (3L, "x", "en", "srcC", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.Parity26.queries("x4_source_overlap")(
      spark, dir).collect()
    assert(rows.length == 1, "only the pair sharing vocabulary appears")
    val r = rows.head
    assert(r.getAs[String]("s1") == "srcA" && r.getAs[String]("s2") == "srcB")
    assert(r.getAs[Long]("n_shared") == 2L)
    assert(r.getAs[Double]("jaccard") == 0.5, "|{b,c}| / |{a,b,c,d}|")
  }

  test("x9_bfs_hops: planted chain distances; 5th hop is out of budget") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p26bfs").toString
    // 27 passes the md5 <= '02' seed gate; 100..105 do not.
    // Chain 27-100-101-102-103-104-105: dist(100)=1 .. dist(104)=4? no:
    // dist(103)=4 is the last inside BfsRounds=4; 104 and 105 are
    // beyond the hop budget and must be absent.
    val chain = Seq((10L, 27L), (10L, 100L), (11L, 100L), (11L, 101L),
      (12L, 101L), (12L, 102L), (13L, 102L), (13L, 103L),
      (14L, 103L), (14L, 104L), (15L, 104L), (15L, 105L))
    chain.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val m = graft.queries.Parity26.queries("x9_bfs_hops")(spark, dir)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("dist"))
      .toMap
    assert(m == Map(27L -> 0L, 100L -> 1L, 101L -> 2L, 102L -> 3L,
      103L -> 4L), s"got $m")
  }

  private def eventsDf(rows: Seq[(String, Double)]) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((day, v), i) =>
      (i.toLong, java.sql.Timestamp.valueOf(s"$day 01:00:00"), 1L,
        "click", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("x6_psi: identical halves give exactly 0") {
    val dir = java.nio.file.Files.createTempDirectory("p26psi1").toString
    eventsDf(Seq(("2024-01-05", 10.0), ("2024-01-06", 120.0),
      ("2024-01-20", 10.0), ("2024-01-21", 120.0)))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.queries.Parity26.queries("x6_psi")(spark, dir)
      .collect().head
    assert(r.getAs[Double]("psi") == 0.0)
    assert(r.getAs[Long]("n_bins") == 2L)
  }

  test("x6_psi: a distribution shift scores positive") {
    val dir = java.nio.file.Files.createTempDirectory("p26psi2").toString
    eventsDf(Seq(("2024-01-05", 10.0), ("2024-01-06", 10.0),
      ("2024-01-20", 420.0), ("2024-01-21", 420.0)))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.queries.Parity26.queries("x6_psi")(spark, dir)
      .collect().head
    // add-one smoothing on 2-point cohorts caps the planted score at
    // 2 * (0.25 - 1/12) * ln(3) = 0.366; industry "major shift" is 0.25
    assert(r.getAs[Double]("psi") > 0.3, s"shift must score high: $r")
  }
}
