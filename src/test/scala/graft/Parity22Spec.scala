package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the round-10 batch-9 operators: triangle counting /
  * degree histogram (planted clique graph), zone-map pruning
  * (planted file layout), KS test (disjoint supports -> D = 1),
  * chi-square (uniform table -> 0), sequence-pattern matching and
  * point-in-time reconstruction (planted event logs). The DuckDB
  * oracles cover the real corpus; these pin the SEMANTICS on inputs
  * where the expected value is provable by hand. */
class Parity22Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  private def plantedLineitemDir(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p22li").toString
    // order 10: triangle {1,2,3}; order 11: edge {3,4} (no triangle);
    // order 12: duplicate edge {1,2}; order 13: K4 {5,6,7,8} -> 4
    // triangles. Total: edges 4 + 6 = 10, nodes 8, triangles 5.
    val rows =
      Seq(10L -> 1L, 10L -> 2L, 10L -> 3L,
        11L -> 3L, 11L -> 4L,
        12L -> 1L, 12L -> 2L,
        13L -> 5L, 13L -> 6L, 13L -> 7L, 13L -> 8L)
    // file_id = l_orderkey DIV 1024: keys 10..13 -> file 0 (1994
    // dates, pruned); keys 2048/2049 -> file 2 (1996 dates, kept)
    val li = rows.map { case (ok, pk) =>
      (ok, pk, java.sql.Timestamp.valueOf("1994-03-01 00:00:00"))
    } ++ Seq(
      (2048L, 1L, java.sql.Timestamp.valueOf("1996-06-01 00:00:00")),
      (2049L, 2L, java.sql.Timestamp.valueOf("1996-07-01 00:00:00")))
    li.toDF("l_orderkey", "l_partkey", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("x9_triangles: planted clique graph counts exactly") {
    val r = graft.queries.Parity22.queries("x9_triangles")(
      spark, plantedLineitemDir()).collect().head
    assert(r.getAs[Long]("n_edges") == 10L)
    assert(r.getAs[Long]("n_nodes") == 8L)
    assert(r.getAs[Long]("n_triangles") == 5L,
      s"triangle{1,2,3} + K4{5,6,7,8} must give 1 + 4 = 5: $r")
  }

  test("x9_degree_dist: planted graph degree histogram") {
    val m = graft.queries.Parity22.queries("x9_degree_dist")(
      spark, plantedLineitemDir()).collect()
      .map(r => r.getAs[Long]("dg") -> r.getAs[Long]("n_nodes")).toMap
    // nodes 1,2,3 have degree 2,2,3; node 4 degree 1; K4 nodes degree 3
    assert(m == Map(1L -> 1L, 2L -> 2L, 3L -> 5L), s"got $m")
  }

  test("x8_zonemap_prune: only files overlapping the predicate kept") {
    val rows = graft.queries.Parity22.queries("x8_zonemap_prune")(
      spark, plantedLineitemDir()).collect()
      .map(r => r.getAs[Long]("file_id") ->
        (r.getAs[Int]("kept"), r.getAs[Long]("n_rows"))).toMap
    assert(rows(0L) == (0, 11L), "1994-only file must be pruned")
    assert(rows(2L) == (1, 2L), "1996 file must be kept")
  }

  private def plantedEventsDir(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p22ev").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: signup, view, purchase  -> "svp"  matches s[^e]*p
    // user 2: signup, error, purchase -> "sep"  must NOT match
    // user 3: purchase, signup        -> "ps"   must NOT match
    // time travel (cutoff 2024-01-15): user 1 last pre-cutoff = view;
    // user 2 last pre-cutoff = error -> deleted; user 3 only
    // post-cutoff events -> absent
    val ev = Seq(
      (1L, ts("2024-01-10 00:00:00"), 1L, "signup", 1.0, "{}"),
      (2L, ts("2024-01-10 01:00:00"), 1L, "view", 2.5, "{}"),
      (3L, ts("2024-01-16 00:00:00"), 1L, "purchase", 9.0, "{}"),
      (4L, ts("2024-01-10 00:00:00"), 2L, "signup", 1.0, "{}"),
      (5L, ts("2024-01-11 00:00:00"), 2L, "error", 0.0, "{}"),
      (6L, ts("2024-01-16 00:00:00"), 2L, "purchase", 3.0, "{}"),
      (7L, ts("2024-01-20 00:00:00"), 3L, "purchase", 4.0, "{}"),
      (8L, ts("2024-01-21 00:00:00"), 3L, "signup", 5.0, "{}"))
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("x5_seq_pattern: signup->purchase with no error in between") {
    val m = graft.queries.Parity22.queries("x5_seq_pattern")(
      spark, plantedEventsDir()).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Int]("matched"), r.getAs[Int]("seq_len"))).toMap
    assert(m(1L) == (1, 3), "svp must match")
    assert(m(2L) == (0, 3), "sep (error between) must not match")
    assert(m(3L) == (0, 2), "ps (wrong order) must not match")
  }

  test("x1_time_travel: as-of state honors deletes and the cutoff") {
    val rows = graft.queries.Parity22.queries("x1_time_travel")(
      spark, plantedEventsDir()).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[String]("last_type"), r.getAs[Double]("last_value"))).toMap
    assert(rows(1L) == ("view", 2.5),
      "post-cutoff purchase must not be visible")
    assert(!rows.contains(2L), "last pre-cutoff op is a delete")
    assert(!rows.contains(3L), "no pre-cutoff events")
  }

  test("x6_ks_test: disjoint supports give D = 1 on a planted log") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p22ks").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-10 00:00:00"), 1L, "click", 1.0, "{}"),
      (2L, ts("2024-01-10 00:00:00"), 1L, "click", 2.0, "{}"),
      (3L, ts("2024-01-10 00:00:00"), 2L, "view", 3.0, "{}"),
      (4L, ts("2024-01-10 00:00:00"), 2L, "view", 4.0, "{}"))
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.queries.Parity22.queries("x6_ks_test")(spark, dir)
      .collect().head
    assert(r.getAs[Double]("ks_d") == 1.0)
    assert(r.getAs[Long]("na") == 2L && r.getAs[Long]("nb") == 2L)
  }

  test("x6_chi2: perfectly uniform contingency table gives 0") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p22chi").toString
    val rows = for {
      p <- Seq("1-URGENT", "5-LOW"); st <- Seq("O", "F"); i <- 1 to 3
    } yield (p, st, i)
    rows.zipWithIndex.map { case ((p, st, _), i) => (i.toLong, p, st) }
      .toDF("o_orderkey", "o_orderpriority", "o_orderstatus")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = graft.queries.Parity22.queries("x6_chi2")(spark, dir)
      .collect().head
    assert(r.getAs[Double]("chi2") == 0.0)
    assert(r.getAs[Long]("dof") == 1L)
  }

  test("x6_chi2: real corpus statistic is finite with dof 8") {
    val r = graft.queries.Parity22.queries("x6_chi2")(spark, sf)
      .collect().head
    assert(r.getAs[Double]("chi2") >= 0.0)
    assert(r.getAs[Long]("dof") == 8L)
  }
}
