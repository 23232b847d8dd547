package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for batch 11: k-core peel semantics (planted clique+tail with
  * small k, fixpoint property on the real corpus), watermark
  * late-event classification (planted out-of-order arrival), and the
  * CUSUM prefix-sum identity (planted step change). */
class Parity24Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def edgeDf(es: Seq[(Long, Long)]) = {
    import spark.implicits._
    es.toDF("u", "v")
  }

  test("kcorePeel: K4 survives k=3, tail chain peels away") {
    // K4 on {1,2,3,4} + tail 4-5-6: tail degrees 1/2 peel in two
    // rounds; the clique is the 3-core, every survivor at degree 3
    val es = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L))
    val out = graft.queries.Parity24.kcorePeel(edgeDf(es), 3, 6)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("dg"))
      .toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kcorePeel: avalanche collapse peels a path to nothing at k=2") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val out = graft.queries.Parity24.kcorePeel(edgeDf(path), 2, 6)
    assert(out.count() == 0L, "a path has no 2-core")
  }

  test("kcorePeelMsg: message-form peel == broadcast peel " +
      "(planted graphs + sf0.001 corpus)") {
    def msgForm(es: Seq[(Long, Long)], k: Int, rounds: Int) = {
      val pairs = edgeDf(es)
      val adj = pairs.select(col("u").as("node"), col("v").as("nbr"))
        .unionAll(pairs.select(col("v").as("node"), col("u").as("nbr")))
      graft.ops.Connect.kcorePeelMsg(adj, k, rounds)
        .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("dg")).toMap
    }
    val clique = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L))
    assert(msgForm(clique, 3, 6) ==
      Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(msgForm(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), 2, 6).isEmpty,
      "a path has no 2-core")
    // real corpus: identical survivors and degrees to the broadcast arm
    val sf = "/root/testdata/sf0.001"
    val pairs = graft.queries.Parity24.edges(spark, sf)
    val adj = pairs.select(col("u").as("node"), col("v").as("nbr"))
      .unionAll(pairs.select(col("v").as("node"), col("u").as("nbr")))
    val bc = graft.queries.Parity24.kcorePeel(pairs, 80, 6)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("dg")).toMap
    val msg = graft.ops.Connect.kcorePeelMsg(adj, 80, 6)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("dg")).toMap
    assert(msg == bc, s"msg-form (${msg.size}) != broadcast (${bc.size})")
  }

  test("x9_kcore: sf0.001 output is a fixpoint (one more round = no change)") {
    val sf = "/root/testdata/sf0.001"
    val r6 = graft.queries.Parity24.queries("x9_kcore")(spark, sf)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("dg")).toMap
    val r7 = {
      // one extra peel round over the same edges
      val more = graft.queries.Parity24.kcorePeel(
        graft.queries.Parity24.edges(spark, sf), 80, 7)
        .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("dg")).toMap
      more
    }
    assert(r6 == r7, s"round 6 (${r6.size}) must equal round 7 (${r7.size})")
  }

  test("x5_watermark_late: out-of-order event behind the watermark is late") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p24wm").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // arrival order = event_id. e3 arrives after e2 advanced the
    // max event time to 12:00 -> watermark 11:00; its ts 10:30 is
    // late. e4 at 11:30 >= 11:00 is NOT late.
    val ev = Seq(
      (1L, ts("2024-01-10 10:00:00"), 1L, "click", 1.0, "{}"),
      (2L, ts("2024-01-10 12:00:00"), 1L, "click", 1.0, "{}"),
      (3L, ts("2024-01-10 10:30:00"), 2L, "view", 1.0, "{}"),
      (4L, ts("2024-01-10 11:30:00"), 2L, "view", 1.0, "{}"))
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val m = graft.queries.Parity24.queries("x5_watermark_late")(spark, dir)
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_late"), r.getAs[Long]("n_total"))).toMap
    assert(m("click") == (0L, 2L))
    assert(m("view") == (1L, 2L), "10:30 behind the 11:00 watermark")
  }

  test("x6_cusum: step change accumulates after the shift, zero before") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p24cu").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // days 1-2 at value 1.0, days 3-4 at 3.0; mu0 = 2 ->
    // deviations -1,-1,+1,+1 -> S = -1,-2,-1,0 -> G = 0,0,1,2
    val ev = Seq(
      (1L, ts("2024-01-01 01:00:00"), 1L, "click", 1.0, "{}"),
      (2L, ts("2024-01-02 01:00:00"), 1L, "click", 1.0, "{}"),
      (3L, ts("2024-01-03 01:00:00"), 1L, "click", 3.0, "{}"),
      (4L, ts("2024-01-04 01:00:00"), 1L, "click", 3.0, "{}"))
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = graft.queries.Parity24.queries("x6_cusum")(spark, dir)
      .collect().sortBy(_.getAs[Long]("day_idx"))
    assert(rows.map(_.getAs[Double]("cusum_g")).toSeq ==
      Seq(0.0, 0.0, 1.0, 2.0))
    assert(rows.map(_.getAs[Double]("daily_mean")).toSeq ==
      Seq(1.0, 1.0, 3.0, 3.0))
  }
}
