package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for batch 17 (round 11): the gap auditor on a planted
  * delivery calendar with a known outage.
  */
class Parity48Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("x5_delivery_gaps: a planted 3-hour outage is counted, " +
      "located, and measured as the longest run") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p48dg").toString
    // type 'a': hours 0..9 present except {3,4,5} and {8} ->
    // 4 missing, longest outage 3 starting at hour 3.
    // type 'b': all 10 hours present -> clean.
    val hoursA = Seq(0, 1, 2, 6, 7, 9)
    val hoursB = 0 until 10
    val rows = hoursA.map(h => (h, "a")) ++ hoursB.map(h => (h, "b"))
    rows.zipWithIndex.map { case ((h, t), i) =>
      (i.toLong, java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, 1, 0, 30).plusHours(h.toLong)),
        1L, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val m = graft.queries.Parity48.queries("x5_delivery_gaps")(spark, dir)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val a = m("a")
    assert(a.getAs[Long]("n_expected") == 10L)
    assert(a.getAs[Long]("n_observed") == 6L)
    assert(a.getAs[Long]("n_missing") == 4L)
    assert(a.getAs[Long]("longest_outage") == 3L)
    val loSpine = a.getAs[Long]("first_missing") // absolute hour of h=3
    assert(a.getAs[Long]("outage_start") == loSpine,
      "the 3-hour hole starts at the first missing hour")
    val b = m("b")
    assert(b.getAs[Long]("n_missing") == 0L)
    assert(b.isNullAt(b.fieldIndex("longest_outage")),
      "a clean calendar has no outage row")
  }
}
