package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for batch 15: LOCF gap-fill semantics on planted gap runs —
  * errors null the reading, the last valid observation carries
  * forward across runs of consecutive errors, and a user whose FIRST
  * events are errors stays null until the first valid reading. */
class Parity28Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def locf(rows: Seq[(Long, Long, Long, String, Double)]) = {
    import spark.implicits._
    val df = rows.toDF("event_id", "user_id", "ts", "event_type", "value")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col("event_id"), col("user_id"), col("ts"),
        when(col("event_type") =!= "error", col("value")).as("reading"))
      .withColumn("filled", last(col("reading"), ignoreNulls = true).over(w))
      .drop("ts")
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[java.lang.Double]("reading")).map(_.toDouble),
          Option(r.getAs[java.lang.Double]("filled")).map(_.toDouble)))
      .toMap
  }

  test("x5_locf: error runs carry the last valid reading forward") {
    val out = locf(Seq(
      (1L, 7L, 10L, "view", 1.5),
      (2L, 7L, 20L, "error", 99.0), // nulled, fills from event 1
      (3L, 7L, 30L, "error", 99.0), // consecutive run keeps filling
      (4L, 7L, 40L, "click", 4.0),  // new observation resets the carry
      (5L, 7L, 50L, "error", 99.0)))
    assert(out(1L) == (Some(1.5), Some(1.5)))
    assert(out(2L) == (None, Some(1.5)))
    assert(out(3L) == (None, Some(1.5)))
    assert(out(4L) == (Some(4.0), Some(4.0)))
    assert(out(5L) == (None, Some(4.0)))
  }

  test("x5_locf: leading errors stay null; users fill independently") {
    val out = locf(Seq(
      (1L, 1L, 10L, "error", 99.0), // nothing to carry yet
      (2L, 1L, 20L, "view", 2.0),
      (3L, 2L, 15L, "error", 99.0), // other user's readings never leak
      (4L, 2L, 25L, "error", 99.0)))
    assert(out(1L) == (None, None))
    assert(out(2L) == (Some(2.0), Some(2.0)))
    assert(out(3L) == (None, None))
    assert(out(4L) == (None, None))
  }

  test("x5_locf: tie timestamps break on event_id (deterministic carry)") {
    val out = locf(Seq(
      (1L, 3L, 10L, "view", 1.0),
      (2L, 3L, 10L, "view", 2.0),  // same ts, higher id orders second
      (3L, 3L, 20L, "error", 99.0)))
    assert(out(3L) == (None, Some(2.0)))
  }
}
