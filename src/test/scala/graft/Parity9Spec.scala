package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the Parity9 batch: planted interval-merge geometry,
  * edit-distance linkage pairs, bigram LM counts, and split-assignment
  * invariants (disjoint + exhaustive + deterministic).
  */
class Parity9Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def fixtureDir(name: String): String = {
    val dir = Files.createTempDirectory(s"p9-$name").toFile
    dir.deleteOnExit()
    dir.getAbsolutePath
  }

  test("x5_interval_merge merges chained overlaps, keeps gaps apart") {
    val d = fixtureDir("imerge")
    val m = 60L * 1000000000L // one minute in ns (fixture ts is ns-long)
    // user 1: events at 0 and +10min chain (30-min spans overlap), a
    // third at +2h stands alone; user 2: single event
    Seq(
      (1L, 0L, 1L), (2L, 10 * m, 1L), (3L, 120 * m, 1L),
      (4L, 5 * m, 2L))
      .toDF("event_id", "ts", "user_id")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = graft.queries.Parity9.queries("x5_interval_merge")(spark, d)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val mu = 60L * 1000000L // one minute in us
    assert(out.toSeq == Seq(
      (1L, 2L, (40L + 30L) * mu, 40L * mu), // [0,40min) + [2h,2h30)
      (2L, 1L, 30L * mu, 30L * mu)))
  }

  test("x2_editdist_join links within-block names under the threshold") {
    val d = fixtureDir("edj")
    Seq((1L, "cold bolt"), (2L, "cold bolt"), (3L, "old bolt"),
      (4L, "red bolt"), (5L, "warm anvil"))
      .toDF("p_partkey", "p_name")
      .write.mode("overwrite").parquet(s"$d/part.parquet")
    val out = graft.queries.Parity9.queries("x2_editdist_join")(spark, d)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // cold~old dist 1 (counts 2 and 1), old~red dist 2; cold~red is 3
    // (over threshold) and warm anvil has no block partner
    assert(out.toSeq == Seq(
      ("cold bolt", "old bolt", 1L, 2L, 1L),
      ("old bolt", "red bolt", 2L, 1L, 1L)))
  }

  test("x4_ngram_lm: exact bigram counts, p(w2|w1) normalizes per w1") {
    val d = fixtureDir("lm")
    Seq((1L, "a b a b"), (2L, "z"))   // single-token doc contributes nothing
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = graft.queries.Parity9.queries("x4_ngram_lm")(spark, d)
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(("a", "b", 2L, 1.0), ("b", "a", 1L, 1.0)))
    // on real data: p over the FULL count table sums to 1 per w1
    val full = graft.Tables.documents(spark, sf)
      .select(explode(graft.ops.TextOps.tokens(lower(col("text")))).as("t"))
    val nBigrams = full.count() - graft.Tables.documents(spark, sf).count()
    val top = graft.queries.Parity9.queries("x4_ngram_lm")(spark, sf).collect()
    assert(top.length == 30 && top.map(_.getLong(2)).sum <= nBigrams)
  }

  test("DqChecks counts planted violations per dbt-test semantics") {
    import graft.ops.DqChecks
    val child = Seq((1L, "a"), (1L, "b"), (2L, "c"), (9L, "d"))
      .toDF("k", "v")                                  // k=9 is an orphan
      .withColumn("v", when(col("v") === "d", lit(null)).otherwise(col("v")))
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val out = DqChecks.suite(Seq(
      DqChecks.uniqueKey("u", child, Seq("k")),        // one duplicated KEY
      DqChecks.notNull("n", child, "v"),               // one null
      DqChecks.referentialIntegrity("r", child, "k", parent, "pk"),
      DqChecks.acceptedValues("a", child, "v", Seq("a", "b", "c"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // unique counts duplicated keys (dbt), not duplicated rows
    assert(out == Map("u" -> 1L, "n" -> 1L, "r" -> 1L, "a" -> 1L))
  }

  test("x7_split_assign is disjoint, exhaustive, and deterministic") {
    val q = graft.queries.Parity9.queries("x7_split_assign")
    val a = q(spark, sf).collect()
    val b = q(spark, sf).collect()
    assert(a.toSeq == b.toSeq)                       // content-hash determinism
    assert(a.map(_.getString(0)).sorted.toSeq == Seq("test", "train", "val"))
    val docs = graft.Tables.documents(spark, sf)
    assert(a.map(_.getLong(1)).sum == docs.count())  // exhaustive
    val totChars = docs.agg(sum(col("n_chars"))).head.getLong(0)
    assert(a.map(_.getLong(2)).sum == totChars)      // disjoint (no double count)
    // hash split is ~80/10/10: train strictly largest on real data
    val m = a.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("train") > m("val") && m("train") > m("test"))
  }
}
