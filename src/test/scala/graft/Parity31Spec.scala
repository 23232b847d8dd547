package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for batch 18: Gini boundary cases — perfect equality is 0,
  * a single holder of all mass scores 1 - 1/n. */
class Parity31Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def eventsDf(rows: Seq[(String, Double)]) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((et, v), i) =>
      (i.toLong, java.sql.Timestamp.valueOf("2024-01-10 00:00:00"), 1L,
        et, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("x6_gini: equality gives 0; one holder gives 1 - 1/n") {
    val dir = java.nio.file.Files.createTempDirectory("p31gi").toString
    // click: all equal -> G = 0; view: {0,0,0,10} -> G = 0.75
    eventsDf(Seq(("click", 5.0), ("click", 5.0), ("click", 5.0),
      ("view", 0.0), ("view", 0.0), ("view", 0.0), ("view", 10.0)))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val m = graft.queries.Parity31.queries("x6_gini")(spark, dir)
      .collect().map(r => r.getAs[String]("event_type") ->
        r.getAs[Double]("gini")).toMap
    assert(m("click") == 0.0)
    assert(m("view") == 0.75, s"single holder of n=4: 1 - 1/4: $m")
  }
}
