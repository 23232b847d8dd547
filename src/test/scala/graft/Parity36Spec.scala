package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for batch 5 (round 11): Adamic-Adar closed forms on a
  * planted wedge pair, perfect-partition modularity, skew-audit salt
  * arithmetic, seasonal z closed forms, and the leakage ratio.
  */
class Parity36Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("x9_link_predict: two shared degree-2 neighbors score " +
      "aa = 2/ln 2, ra = 1 exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p36lp").toString
    // parts 27 and 59 pass the md5 sample filter; 100/200 are the
    // shared (unsampled) neighbors. (27,59) never co-occur -> a true
    // non-adjacent candidate pair.
    Seq((1L, 27L), (1L, 100L), (2L, 59L), (2L, 100L),
      (3L, 27L), (3L, 200L), (4L, 59L), (4L, 200L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = graft.queries.Parity36.queries("x9_link_predict")(spark, dir)
      .collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert((r.getAs[Long]("u"), r.getAs[Long]("v")) == (27L, 59L))
    assert(r.getAs[Long]("cn") == 2L)
    // 2 * round(1/ln 2, 12) = 2.885390081778, round 10
    assert(r.getAs[Double]("aa_score") == 2.8853900818, r.toString)
    assert(r.getAs[Double]("ra_score") == 1.0)
  }

  test("x9_modularity: two equal perfectly-assortative communities " +
      "give Q = 1/2") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p36mo").toString
    Seq((1L, 0L), (2L, 1L)).toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1L, 0L), (2L, 1L)).toDF("s_suppkey", "s_nationkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((1L, 1L), (2L, 2L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 1L), (2L, 2L)).toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = graft.queries.Parity36.queries("x9_modularity")(spark, dir)
      .collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Double]("q_c") == 0.25, r.toString)
      assert(r.getAs[Double]("modularity") == 0.5)
      assert(r.getAs[Long]("w_in") == r.getAs[Long]("strength"),
        "assortative: every edge internal")
    }
  }

  test("x8_skew_audit: counts {4,1,1} give skew 2 and 2 recommended " +
      "salts (integer ceil)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p36sk").toString
    Seq((1L, 1L, 10L), (2L, 1L, 11L), (3L, 1L, 12L), (4L, 1L, 13L),
      (5L, 2L, 14L), (6L, 3L, 15L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val m = graft.queries.Parity36.queries("x8_skew_audit")(spark, dir)
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    val pk = m("l_partkey")
    assert(pk.getAs[Long]("n_keys") == 3L)
    assert(pk.getAs[Long]("max_cnt") == 4L)
    assert(pk.getAs[Long]("heaviest_key") == 1L)
    assert(pk.getAs[Double]("mean_cnt") == 2.0)
    assert(pk.getAs[Double]("skew_ratio") == 2.0)
    assert(pk.getAs[Long]("rec_salts") == 2L, "ceil(4/2)")
    // uniform key: no salting needed
    assert(m("l_suppkey").getAs[Long]("rec_salts") == 1L)
  }

  private def eventsAt(rows: Seq[(Int, Int)]) = {
    import spark.implicits._
    // (day, copies): `copies` events of one type on that day
    rows.flatMap { case (day, n) => (0 until n).map(day -> _) }
      .zipWithIndex.map { case ((day, _), i) =>
        (i.toLong,
          java.sql.Timestamp.valueOf(
            java.time.LocalDate.of(1970, 1, 1).plusDays(day.toLong)
              .atTime(12, 0)),
          1L + i % 3, "click", 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("x5_seasonal_anomaly: dow baseline z closed forms; " +
      "zero-variance dow yields null z") {
    val dir = java.nio.file.Files.createTempDirectory("p36se").toString
    // dow 0 over 3 weeks: counts 2,2,8 -> z = ±(n·c−Σ)/√(n·Σx²−Σ²)
    // dow 1: constant 5 -> variance 0 -> z null
    eventsAt(Seq((0, 2), (7, 2), (14, 8), (1, 5), (8, 5), (15, 5)))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val m = graft.queries.Parity36
      .queries("x5_seasonal_anomaly")(spark, dir)
      .collect().map(r => r.getAs[Long]("day_idx") ->
        Option(r.getAs[java.lang.Double]("z"))).toMap
    assert(m(14L).contains(1.41421356), s"(24-12)/sqrt(72): $m")
    assert(m(0L).contains(-0.70710678))
    assert(m(1L).isEmpty && m(8L).isEmpty && m(15L).isEmpty,
      "constant dow series has no z")
  }

  test("x7_leakage_audit: one of two val users seen in train -> " +
      "leakage 0.5") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p36lk").toString
    // users 1,2 before the cutoff; users 2,3 after
    Seq((0L, 0, 1L), (1L, 1, 2L), (2L, 30, 2L), (3L, 31, 3L))
      .map { case (id, day, u) =>
        (id, java.sql.Timestamp.valueOf(
          java.time.LocalDate.of(1970, 1, 1).plusDays(day.toLong)
            .atTime(12, 0)), u, "click", 1.0, "{}")
      }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.queries.Parity36.queries("x7_leakage_audit")(spark, dir)
      .collect()(0)
    assert(r.getAs[Long]("users_train") == 2L)
    assert(r.getAs[Long]("users_val") == 2L)
    assert(r.getAs[Long]("users_both") == 1L)
    assert(r.getAs[Double]("leakage_ratio") == 0.5)
  }
}
