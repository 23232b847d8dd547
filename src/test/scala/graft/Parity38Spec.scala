package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for batch 7 (round 11): the forget plan's three file verdicts
  * on a planted layout, and the df profile's exact pair-work
  * bookkeeping.
  */
class Parity38Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("x1_forget_plan: planted files produce skip / rewrite / drop " +
      "and exact deletion accounting") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p38fg").toString
    // file 0 (ids < 8192): only user 1 -> skip
    // file 1: users 1 and 97 -> rewrite
    // file 2: only user 194 (97-class) -> drop
    Seq((0L, 1L), (1L, 1L),
      (8192L, 1L), (8193L, 97L),
      (16384L, 194L), (16385L, 194L))
      .map { case (eid, u) =>
        (eid, java.sql.Timestamp.valueOf("2024-01-10 00:00:00"), u,
          "click", 1.0, "{}")
      }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = graft.queries.Parity38.queries("x1_forget_plan")(spark, dir)
      .collect().map(r => r.getAs[Long]("file_id") -> r).toMap
    assert(rows(0L).getAs[String]("action") == "skip")
    assert(rows(1L).getAs[String]("action") == "rewrite")
    assert(rows(1L).getAs[Long]("n_del") == 1L)
    assert(rows(2L).getAs[String]("action") == "drop")
    assert(rows(0L).getAs[Long]("files_touched") == 2L)
    assert(rows(0L).getAs[Double]("pct_deleted") == 0.5, "3 of 6 rows")
  }

  test("x2_df_profile: two identical docs + one unique put every " +
      "shared shingle at df=2 with pair_work 1 each") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p38df").toString
    Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z w v"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val m = graft.queries.Parity38.queries("x2_df_profile")(spark, dir)
      .collect().map(r => r.getAs[Long]("bucket") -> r).toMap
    // 5-token docs -> 3 trigram shingles each; dup pair shares all 3
    // (df=2, bucket 1), unique doc contributes 3 df=1 shingles
    assert(m(0L).getAs[Long]("n_shingles") == 3L)
    assert(m(0L).getAs[Long]("pair_work") == 0L)
    assert(m(1L).getAs[Long]("n_shingles") == 3L)
    assert(m(1L).getAs[Long]("pair_work") == 3L, "3 shingles x C(2,2)=1")
    assert(m(1L).getAs[Double]("pair_share") == 1.0,
      "ALL pair cost lives in the df=2 bucket")
  }
}
