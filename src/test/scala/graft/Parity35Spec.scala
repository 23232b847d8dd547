package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for batch 4 (round 11): label-propagation convergence on a
  * planted two-component graph, EWMA closed forms, PMI on a corpus
  * with a known collocation, and the sort advisor recovering the
  * actual layout key.
  */
class Parity35Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("x9_label_prop: planted two-component bipartite graph " +
      "converges to one label per component (no sync-LPA oscillation)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p35lp").toString
    // component A: customers 1,2 share supplier 1; component B:
    // customer 3 alone with supplier 2
    Seq((1L, 1L), (2L, 2L), (3L, 3L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 1L), (2L, 1L), (3L, 2L))
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = graft.queries.Parity35.queries("x9_label_prop")(spark, dir)
      .collect().map(r => (r.getAs[Long]("community"),
        r.getAs[Long]("n_members"))).toMap
    // nodes: custs {2,4,6}, supps {3,5}. After supplier→customer→
    // supplier rounds both components carry their min customer label
    assert(rows == Map(2L -> 3L, 6L -> 2L),
      s"expected component A=3 members under label 2, B=2 under 6: $rows")
  }

  private def eventsDf(rows: Seq[(Int, String, Double)]) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((day, et, v), i) =>
      (i.toLong,
        java.sql.Timestamp.valueOf(
          java.time.LocalDate.of(2024, 1, 1).plusDays(day.toLong)
            .atTime(12, 0)),
        1L, et, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("x5_ewma: constant series is a fixed point; a step smooths by " +
      "the exact binary weights") {
    val dir = java.nio.file.Files.createTempDirectory("p35ew").toString
    // 'flat': 4.0 forever -> ewma 4.0; 'step': 0 then 16 ->
    // day1 ewma = (128*16 + 64*0) / 192 = 10.666667
    eventsDf(Seq((0, "flat", 4.0), (1, "flat", 4.0), (2, "flat", 4.0),
      (0, "step", 0.0), (1, "step", 16.0)))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val m = graft.queries.Parity35.queries("x5_ewma")(spark, dir)
      .collect().map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("day_idx")) -> r.getAs[Double]("ewma")).toMap
    val days = m.keys.filter(_._1 == "flat").map(_._2).toSeq.sorted
    days.foreach(dd => assert(m(("flat", dd)) == 4.0))
    val sdays = m.keys.filter(_._1 == "step").map(_._2).toSeq.sorted
    assert(m(("step", sdays.head)) == 0.0)
    assert(m(("step", sdays.last)) == 10.666667,
      s"(128*16)/(128+64) rounded to 6: $m")
  }

  test("x4_pmi_cooc: a pair that only ever co-occurs scores " +
      "log2(c_ab*Nu^2/(N*c_a*c_b)) exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p35pmi").toString
    // 10 docs "alpha beta" + 10 docs "gamma delta": for each pair
    // c_ab=10, c_a=c_b=10, Nu=40, N=20 -> pmi = log2(8) = 3
    val docs = (0 until 10).map(i => (i.toLong, "alpha beta")) ++
      (10 until 20).map(i => (i.toLong, "gamma delta"))
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.Parity35.queries("x4_pmi_cooc")(spark, dir)
      .collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Double]("pmi") == 3.0, r.toString)
      assert(r.getAs[Long]("c_ab") == 10L)
    }
  }

  test("x8_sort_advisor: the actual layout key ranks first with " +
      "expected_files_hit 1.0 and depth 1") {
    val rows = graft.queries.Parity35
      .queries("x8_sort_advisor")(spark, "/root/testdata/sf0.001")
      .collect()
    val first = rows.head
    assert(first.getAs[String]("col_name") == "l_orderkey")
    assert(first.getAs[Long]("adv_rank") == 1L)
    assert(first.getAs[Double]("expected_files_hit") == 1.0,
      "contiguous orderkey ranges cover the domain exactly once")
    assert(first.getAs[Long]("max_depth") == 1L)
    // every non-layout key must be strictly worse — the advisor's
    // discrimination, not just its ranking
    rows.tail.foreach(r =>
      assert(r.getAs[Double]("expected_files_hit") > 1.0, r.toString))
  }

  test("x6_hll_union: the __merged row equals the whole-corpus sketch " +
      "(query-level persist-then-merge contract)") {
    val d = "/root/testdata/sf0.001"
    val out = graft.queries.Parity35.queries("x6_hll_union")(spark, d)
      .filter(col("scope") === "__merged").collect()(0)
    val toks = Tables.documents(spark, d)
      .select(explode(graft.ops.TextOps.tokens(lower(col("text"))))
        .as("sval"))
    val whole = graft.ops.Hll
      .estimate(spark, graft.ops.Hll.registers(toks)).collect()(0)
    assert(out.getAs[Long]("s_scaled") == whole.getAs[Long]("s_scaled"))
    assert(out.getAs[Long]("v_zero") == whole.getAs[Long]("v_zero"))
  }
}
