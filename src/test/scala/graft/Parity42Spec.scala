package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for batch 11 (round 11): DP noise properties and the
  * backtest's closed forms on planted series.
  */
class Parity42Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("x7_dp_counts: the Laplace draw is deterministic per key, " +
      "reproducible across runs, and the release never goes negative") {
    val d = "/root/testdata/sf0.001"
    def run() = graft.queries.Parity42.queries("x7_dp_counts")(spark, d)
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("noise"), r.getAs[Long]("n_released")))
    val a = run()
    assert(a.toSeq == run().toSeq, "same key -> same draw, every run")
    a.foreach { case (_, (_, rel)) => assert(rel >= 0L) }
    // distinct keys get distinct draws (the hash is per-cell)
    assert(a.map(_._2._1).distinct.length == a.length)
  }

  test("x5_backtest_snaive: a 7-periodic series gives snaive MAE 0 " +
      "while naive-1 pays the full step") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p42bt").toString
    // weekly pattern 1,1,1,1,1,1,8 repeated 3x: lag-7 forecast is
    // perfect (MAE 0); lag-1 errs by 7 at both weekly edges
    val rows = (0 until 21).map(day => (day, if (day % 7 == 6) 8.0 else 1.0))
    rows.zipWithIndex.map { case ((day, v), i) =>
      (i.toLong, java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(day.toLong)
          .atTime(12, 0)), 1L, "click", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.queries.Parity42
      .queries("x5_backtest_snaive")(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_eval") == 14L)
    assert(r.getAs[Double]("mae_snaive") == 0.0)
    assert(r.getAs[Double]("mape_snaive") == 0.0)
    // naive-1: |8-1| at each weekly spike and |1-8| the day after:
    // 4 edges in 14 eval days -> 28/14 = 2
    assert(r.getAs[Double]("mae_naive1") == 2.0)
    assert(r.getAs[Long]("snaive_wins") == 1L)
  }
}
