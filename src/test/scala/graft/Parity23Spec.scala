package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the round-10 batch-10 operators on hand-provable planted
  * inputs: a perfect line (OLS), disjoint + fully-tied cohorts
  * (Mann-Whitney midranks), uniform/degenerate token distributions
  * (entropy/TTR), and known interval layouts (overlap depth). */
class Parity23Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("x6_ols_group: perfect line fits slope/intercept exactly, r2 = 1") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p23ols").toString
    // y = 2x + 3, one group
    Seq.tabulate(10)(i => ("A", (i + 1).toDouble, 2.0 * (i + 1) + 3.0))
      .toDF("l_returnflag", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = graft.queries.Parity23.queries("x6_ols_group")(spark, dir)
      .collect().head
    assert(r.getAs[Double]("slope") == 2.0)
    assert(r.getAs[Double]("intercept") == 3.0)
    assert(r.getAs[Double]("r2") == 1.0)
    assert(r.getAs[Long]("n_rows") == 10L)
  }

  private def eventsDf(rows: Seq[(Long, String, Double)]) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((uid, et, v), i) =>
      (i.toLong, java.sql.Timestamp.valueOf("2024-01-10 00:00:00"),
        uid, et, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("x6_mannwhitney: disjoint cohorts give U = 0; full ties give U = n*m/2") {
    val d1 = java.nio.file.Files.createTempDirectory("p23mw1").toString
    eventsDf(Seq((1L, "click", 1.0), (1L, "click", 2.0),
      (2L, "view", 3.0), (2L, "view", 4.0)))
      .write.mode("overwrite").parquet(s"$d1/events.parquet")
    val r1 = graft.queries.Parity23.queries("x6_mannwhitney")(spark, d1)
      .collect().head
    assert(r1.getAs[Double]("u_stat") == 0.0,
      "click strictly below view: U must be 0")

    val d2 = java.nio.file.Files.createTempDirectory("p23mw2").toString
    eventsDf(Seq((1L, "click", 5.0), (1L, "click", 5.0),
      (2L, "view", 5.0)))
      .write.mode("overwrite").parquet(s"$d2/events.parquet")
    val r2 = graft.queries.Parity23.queries("x6_mannwhitney")(spark, d2)
      .collect().head
    // all tied: midrank 2 each; sumR_A = 4, U = 4 - 3 = 1 = n*m/2
    assert(r2.getAs[Double]("u_stat") == 1.0)
  }

  test("x4_entropy: uniform pair = 1 bit, constant = 0 bits") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p23ent").toString
    Seq((1L, "a a b b", "en", "s", 7L), (2L, "a a a", "en", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val m = graft.queries.Parity23.queries("x4_entropy")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"),
          r.getAs[Double]("ttr"), r.getAs[Double]("entropy"))).toMap
    assert(m(1L) == ((4L, 2L, 0.5, 1.0)))
    assert(m(2L) == ((3L, 1L, round10(1.0 / 3.0), 0.0)))
  }

  private def round10(v: Double): Double =
    BigDecimal(v).setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("x8_overlap_depth: staggered file ranges count correctly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p23ov").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s"$s 00:00:00")
    // file 0: [1994-01-01, 1994-06-01]; file 1: [1994-03-01,
    // 1994-09-01] (overlaps file 0); file 2: [1995-01-01, 1995-02-01]
    // (disjoint) -> max depth 2, 3 files
    val rows = Seq(
      (0L, ts("1994-01-01")), (1L, ts("1994-06-01")),
      (1024L, ts("1994-03-01")), (1025L, ts("1994-09-01")),
      (2048L, ts("1995-01-01")), (2049L, ts("1995-02-01")))
    rows.toDF("l_orderkey", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = graft.queries.Parity23.queries("x8_overlap_depth")(spark, dir)
      .collect().head
    assert(r.getAs[Long]("max_depth") == 2L)
    assert(r.getAs[Long]("n_files") == 3L)
  }

  test("x8_overlap_depth: touching intervals overlap (closed-interval sweep)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p23ov2").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s"$s 00:00:00")
    // file 0 ends exactly where file 1 starts -> depth 2
    val rows = Seq(
      (0L, ts("1994-01-01")), (1L, ts("1994-06-01")),
      (1024L, ts("1994-06-01")), (1025L, ts("1994-09-01")))
    rows.toDF("l_orderkey", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = graft.queries.Parity23.queries("x8_overlap_depth")(spark, dir)
      .collect().head
    assert(r.getAs[Long]("max_depth") == 2L)
  }
}
