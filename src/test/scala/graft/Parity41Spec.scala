package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for batch 10 (round 11): kappa closed forms on a planted
  * confusion matrix, and Kaplan-Meier on a hand-computable streak
  * layout with real censoring.
  */
class Parity41Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("x4_kappa: perfect agreement gives kappa 1; a planted " +
      "half-agreement matrix reproduces the closed form") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p41kp").toString
    // 2 en docs the classifier gets right, 2 fr docs it gets right,
    // 2 fr docs misread as en: po = 4/6, row fr=4 en=2, col en=4 fr=2
    // pe = (2*4 + 4*2)/36 = 16/36; kappa = (2/3 - 4/9)/(1 - 4/9) = 0.4
    val docs = Seq(
      (1L, "the cat and the dog is here with us", "en"),
      (2L, "the sun and the moon is bright with stars", "en"),
      (3L, "le chat et la maison est grande les jours", "fr"),
      (4L, "la mer et le ciel est bleu les nuits", "fr"),
      (5L, "the train of the north is fast with wind", "fr"),
      (6L, "the bird of the south is small with rain", "fr"))
    docs.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.Parity41.queries("x4_kappa")(spark, dir)
      .collect()
    val r = rows.head
    assert(r.getAs[Double]("po") == 0.66666667)
    assert(r.getAs[Double]("pe") == 0.44444444)
    // kappa is evaluated from the ROUND-8 po/pe (the mirrored
    // chain), so (0.22222223/0.55555556) rounds to 0.40000001
    assert(r.getAs[Double]("kappa") == 0.40000001, rows.mkString("\n"))
    val cells = rows.map(x => (x.getAs[String]("lang"),
      x.getAs[String]("lang_pred")) -> x.getAs[Long]("n")).toMap
    assert(cells(("fr", "en")) == 2L)
    assert(cells(("fr", "fr")) == 2L)
  }

  test("x5_kaplan_meier: censored streaks inflate survival exactly as " +
      "the product-limit form predicts") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p41km").toString
    // horizon = day 9. user 1: days 0,1 (t=2, ends day 1 -> death);
    // user 2: days 0 (t=1, death); user 3: days 8,9 (t=2, censored).
    // risk at t=1: 3 -> d=1, factor 2/3, S=0.66666667
    // risk at t=2: 2 -> d=1, factor 1/2, S=0.33333333
    val days = Seq((1L, 0), (1L, 1), (2L, 0), (3L, 8), (3L, 9))
    days.zipWithIndex.map { case ((u, day), i) =>
      (i.toLong, java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(day.toLong)
          .atTime(12, 0)), u, "click", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val m = graft.queries.Parity41.queries("x5_kaplan_meier")(spark, dir)
      .collect().map(r => r.getAs[Long]("t") -> r).toMap
    assert(m(1L).getAs[Long]("n_risk") == 3L)
    assert(m(1L).getAs[Long]("d") == 1L)
    assert(m(1L).getAs[Double]("s_t") == 0.66666667)
    assert(m(2L).getAs[Long]("n_risk") == 2L)
    assert(m(2L).getAs[Double]("s_t") == 0.33333333,
      "the censored t=2 streak keeps S(2) above 0 — dropping it " +
        "would give S(2)=0")
  }
}
