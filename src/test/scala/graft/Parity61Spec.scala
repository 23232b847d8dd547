package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for batch 10 (round 12): robust trend estimation. */
class Parity61Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("x6_theil_sen: slope replays by hand from the day aggregate, " +
      "pair counts are exactly C(n_days, 2)") {
    val rows = graft.queries.Parity61.queries("x6_theil_sen")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val days = graft.Tables.eventsNs(spark, sf)
      .groupBy(col("event_type"),
        expr("CAST(timestamp_micros(ts DIV 1000) AS DATE)").as("d"))
      .agg(count(lit(1)).as("y"))
      .collect()
      .groupBy(_.getAs[String]("event_type"))
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val nd = r.getAs[Long]("n_days")
      assert(r.getAs[Long]("n_pairs") == nd * (nd - 1) / 2,
        s"$et pair count")
      // hand replay: day-gap pairwise slopes, lower median
      val byDay = days(et).map(x =>
        (x.getAs[java.sql.Date]("d").toLocalDate.toEpochDay,
          x.getAs[Long]("y"))).sortBy(_._1)
      val d0 = byDay.head._1
      val pts = byDay.map { case (ep, y) => (ep - d0, y) }
      val slopes = (for {
        (ia, ya) <- pts; (ib, yb) <- pts if ib > ia
      } yield ((yb - ya) * 1000000L) / (ib - ia)).sorted
      val med = slopes(((slopes.length + 1) / 2) - 1)
      assert(r.getAs[Long]("slope_micro") == med, s"$et slope")
    }
    // robustness is the point: the median slope must be insensitive
    // to a single corrupted day (unlike an OLS fit) — simulate by
    // recomputing with one day's count 100x inflated
    val et = rows.head.getAs[String]("event_type")
    val byDay = days(et).map(x =>
      (x.getAs[java.sql.Date]("d").toLocalDate.toEpochDay,
        x.getAs[Long]("y"))).sortBy(_._1)
    val d0 = byDay.head._1
    val corrupted = byDay.zipWithIndex.map { case ((ep, y), k) =>
      (ep - d0, if (k == byDay.length / 2) y * 100 else y)
    }
    val cs = (for {
      (ia, ya) <- corrupted; (ib, yb) <- corrupted if ib > ia
    } yield ((yb - ya) * 1000000L) / (ib - ia)).sorted
    val cmed = cs(((cs.length + 1) / 2) - 1)
    val orig = rows.find(_.getAs[String]("event_type") == et).get
      .getAs[Long]("slope_micro")
    // one bad day among 30 moves 29 of 435 slopes — the median shifts
    // by at most a few rank positions, never to the corrupted scale
    assert(math.abs(cmed - orig) < 1000000L,
      s"median slope not robust: $orig -> $cmed")
  }
}
