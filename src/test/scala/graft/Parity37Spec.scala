package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for batch 6 (round 11): Benford closed forms, a perfect LSH
  * operating point, the join advisor vs the REAL Catalyst choice,
  * curriculum-order invariants, and MIPS ≠ cosine on a planted
  * counterexample.
  */
class Parity37Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("x6_benford: planted {1.00, 2.00} reproduces the hand-computed " +
      "digit rows and the exact chi2 total") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p37bf").toString
    Seq((0L, 1.0), (1L, 2.0)).map { case (id, v) =>
      (id, java.sql.Timestamp.valueOf("2024-01-10 00:00:00"), 1L,
        "click", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = graft.queries.Parity37.queries("x6_benford")(spark, dir)
      .collect()
    assert(rows.length == 9, "digit grid emits all 9 rows")
    val d1 = rows(0)
    assert(d1.getAs[Double]("p_obs") == 0.5)
    assert(d1.getAs[Double]("p_benford") == 0.30103)
    assert(d1.getAs[Double]("chi2_term") == 0.26302402)
    assert(d1.getAs[Double]("chi2_total") == 2.50040082)
    // absent digits still contribute N * p_ben to chi2
    assert(rows(8).getAs[Long]("n_obs") == 0L)
  }

  test("x2_lsh_confusion: identical docs are candidate AND true -> " +
      "precision = recall = 1") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p37cf").toString
    Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.queries.Parity37.queries("x2_lsh_confusion")(spark, dir)
      .collect()(0)
    assert(r.getAs[Long]("n_cand") == 1L)
    assert(r.getAs[Long]("n_true") == 1L)
    assert(r.getAs[Long]("tp") == 1L)
    assert(r.getAs[Double]("precision") == 1.0)
    assert(r.getAs[Double]("recall") == 1.0)
  }

  test("x8_join_advisor: dimension joins broadcast, and the verdict " +
      "matches the real Catalyst plan choice") {
    val d = "/root/testdata/sf0.001"
    val m = graft.queries.Parity37.queries("x8_join_advisor")(spark, d)
      .collect()
      .map(r => (r.getAs[String]("t_left"), r.getAs[String]("t_right")) -> r)
      .toMap
    val cn = m(("customer", "nation"))
    assert(cn.getAs[String]("strategy") == "broadcast_hash")
    assert(cn.getAs[String]("build_side") == "nation")
    assert(m(("nation", "region")).getAs[String]("build_side") == "region")
    // the REAL planner agrees on the nation build side at this scale
    val plan = Tables.customer(spark, d)
      .join(Tables.nation(spark, d),
        col("c_nationkey") === col("n_nationkey"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"Catalyst should broadcast the nation dim:\n$plan")
  }

  test("x7_data_order: easy-first buckets are non-increasing, " +
      "positions dense, and the order is reproducible") {
    val d = "/root/testdata/sf0.001"
    def run() = graft.queries.Parity37.queries("x7_data_order")(spark, d)
      .collect().map(r => (r.getAs[Long]("pos"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("bucket")))
    val a = run()
    assert(a.map(_._1).toSeq == (1L to a.length).toSeq, "dense positions")
    assert(a.map(_._3).sliding(2).forall(w =>
      w.length < 2 || w(0) >= w(1)), "buckets never increase")
    assert(a.toSeq == run().toSeq, "deterministic shuffle")
  }

  test("x3_mips: inner-product ranking differs from cosine ranking " +
      "on a planted norm gap; aug_cos preserves IP order") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p37mp").toString
    // probe [1,0]; a=[0.5,0] has cosine 1.0 but ip 0.5;
    // b=[0.8,0.59] has cosine ~0.80 but ip 0.8 -> MIPS ranks b first
    Seq((0L, Array(1.0f, 0.0f), "p"), (3L, Array(0.5f, 0.0f), "a"),
      (4L, Array(0.8f, 0.59f), "b"))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = graft.queries.Parity37.queries("x3_mips")(spark, dir)
      .filter(col("probe_id") === 0).collect()
    assert(rows.map(_.getAs[Long]("vec_id")).toSeq == Seq(4L, 3L),
      "IP order is b then a — cosine would say a first")
    // augmented cosine is a positive per-probe rescaling of IP: its
    // order must equal the IP order
    val ac = rows.map(_.getAs[Double]("aug_cos"))
    assert(ac.sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }
}
