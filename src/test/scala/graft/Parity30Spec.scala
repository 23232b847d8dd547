package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for batch 17: MAD robustness on a planted wild point, QQ
  * identity on identical cohorts, TTL expiry boundaries. */
class Parity30Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def eventsDf(rows: Seq[(String, String, Double)]) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((tss, et, v), i) =>
      (i.toLong, java.sql.Timestamp.valueOf(tss), 1L, et, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("x6_mad_outliers: one wild point cannot move the median") {
    val dir = java.nio.file.Files.createTempDirectory("p30mad").toString
    // click: {1,2,3,4,100} -> med 3, adev {2,1,0,1,97}, MAD 1,
    // outliers: adev > 3 -> only the wild 100. (mean±3σ would pass
    // it: mu=22, sigma≈39 -> threshold 139.)
    eventsDf(Seq(("2024-01-10 00:00:00", "click", 1.0),
      ("2024-01-10 00:00:01", "click", 2.0),
      ("2024-01-10 00:00:02", "click", 3.0),
      ("2024-01-10 00:00:03", "click", 4.0),
      ("2024-01-10 00:00:04", "click", 100.0)))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.queries.Parity30.queries("x6_mad_outliers")(spark, dir)
      .collect().head
    assert(r.getAs[Double]("med") == 3.0)
    assert(r.getAs[Double]("mad") == 1.0)
    assert(r.getAs[Long]("n_outliers") == 1L)
    assert(r.getAs[Long]("n_rows") == 5L)
  }

  test("x6_qq_deciles: identical cohorts differ by zero at every decile") {
    val dir = java.nio.file.Files.createTempDirectory("p30qq").toString
    val vals = (1 to 30).map(_.toDouble)
    eventsDf(vals.map(v => ("2024-01-10 00:00:00", "click", v)) ++
      vals.map(v => ("2024-01-10 00:00:00", "view", v)))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = graft.queries.Parity30.queries("x6_qq_deciles")(spark, dir)
      .collect()
    assert(rows.length == 10)
    rows.foreach(r => assert(r.getAs[Double]("qq_diff") == 0.0, r.toString))
  }

  test("x1_ttl_plan: per-type retention windows expire the right rows") {
    val dir = java.nio.file.Files.createTempDirectory("p30ttl").toString
    // max ts = 2024-01-30. error keeps 7 days -> the 10-day-old error
    // expires; click keeps 14 -> the 10-day-old click survives; the
    // 20-day-old click expires; purchase keeps 25 -> survives at 20.
    eventsDf(Seq(
      ("2024-01-30 00:00:00", "click", 1.0),
      ("2024-01-20 00:00:00", "error", 1.0),
      ("2024-01-20 00:00:00", "click", 1.0),
      ("2024-01-10 00:00:00", "click", 1.0),
      ("2024-01-10 00:00:00", "purchase", 1.0)))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = graft.queries.Parity30.queries("x1_ttl_plan")(spark, dir)
      .collect().map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("n_expired"))).toSet
    assert(rows == Set(("error", 1L), ("click", 1L)), rows.toString)
  }
}
