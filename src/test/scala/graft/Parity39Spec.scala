package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for batch 8 (round 11): bootstrap degeneracy on a constant
  * series, HITS role separation on a planted star, k-fold
  * conservation, and the trimmed mean dropping exactly the tails.
  */
class Parity39Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def eventsDf(rows: Seq[(Int, Long, Double)]) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((day, u, v), i) =>
      (i.toLong,
        java.sql.Timestamp.valueOf(
          java.time.LocalDate.of(2024, 1, 1).plusDays(day.toLong)
            .atTime(12, 0)),
        u, "click", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("x6_bootstrap_ci: a constant series collapses the CI onto the " +
      "observed mean") {
    val dir = java.nio.file.Files.createTempDirectory("p39bs").toString
    eventsDf((0 until 8).map(d => (d, 1L, 7.0)))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.queries.Parity39.queries("x6_bootstrap_ci")(spark, dir)
      .collect()(0)
    assert(r.getAs[Double]("mean_obs") == 7.0)
    assert(r.getAs[Double]("ci_lo") == 7.0)
    assert(r.getAs[Double]("ci_hi") == 7.0,
      "every resample of a constant series has the same mean")
    assert(r.getAs[Long]("n_days") == 8L)
  }

  test("x9_hits: planted star separates the roles — the shared " +
      "supplier is the top authority, the 2-degree customer the top hub") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p39ht").toString
    // customer 1 buys from suppliers 1 and 2; customer 2 from 1 only
    Seq((1L, 1L), (2L, 1L), (3L, 2L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 1L), (2L, 2L), (3L, 1L)).toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = graft.queries.Parity39.queries("x9_hits")(spark, dir)
      .collect()
    val topAuth = rows.filter(_.getAs[String]("kind") == "authority")
    val topHub = rows.filter(_.getAs[String]("kind") == "hub")
    assert(topAuth.head.getAs[Long]("entity_key") == 1L,
      "supplier 1 serves both customers")
    assert(topHub.head.getAs[Long]("entity_key") == 1L,
      "customer 1 reaches both suppliers")
    // each half renormalizes its max to the integer scale every round
    assert(topAuth.head.getAs[Long]("score") >= 999999999999L)
    assert(topHub.head.getAs[Long]("score") >= 999999999999L)
    assert(topAuth(1).getAs[Long]("score") <
      topAuth.head.getAs[Long]("score"))
  }

  test("x7_kfold_assign: folds conserve the corpus and stay in range") {
    val d = "/root/testdata/sf0.001"
    val rows = graft.queries.Parity39.queries("x7_kfold_assign")(spark, d)
      .collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val corpus = Tables.documents(spark, d).count()
    assert(total == corpus, "every doc lands in exactly one fold")
    assert(rows.forall { r =>
      val f = r.getAs[Long]("fold"); f >= 0 && f < 5
    })
    // per-language shares sum to 1 across folds
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, g) =>
      val share = g.map(_.getAs[Double]("lang_share")).sum
      // shares are round-6 values: summing up to 5 of them can be
      // off by up to 2.5e-6 from pure rounding
      assert(math.abs(share - 1.0) <= 3e-6)
    }
  }

  test("x6_trimmed_mean: {0, 5x8, 100} with 10% trim drops exactly " +
      "the two extremes -> mean 5") {
    val dir = java.nio.file.Files.createTempDirectory("p39tm").toString
    eventsDf(Seq((0, 1L, 0.0)) ++ (1 to 8).map(i => (0, 1L, 5.0)) ++
      Seq((0, 1L, 100.0)))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.queries.Parity39.queries("x6_trimmed_mean")(spark, dir)
      .collect()(0)
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Long]("cut") == 1L)
    assert(r.getAs[Long]("n_kept") == 8L)
    assert(r.getAs[Double]("trimmed_mean") == 5.0)
  }
}
