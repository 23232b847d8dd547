package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the round-4 Parity8 batch: planted fixtures for quota
  * sampling, repetition scoring and merge semantics, plus cross-query
  * invariants for the total sort and matryoshka ANN on sf0.001.
  */
class Parity8Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def fixtureDir(name: String): String = {
    val dir = Files.createTempDirectory(s"p8-$name").toFile
    dir.deleteOnExit()
    dir.getAbsolutePath
  }

  test("x2_source_quota keeps at most N per source, longest first") {
    val d = fixtureDir("quota")
    // src A: 12 docs with n_chars = doc_id; src B: 3 docs
    val rows = (1L to 12L).map(i => (i, "A", i)) ++
      Seq((21L, "B", 5L), (22L, "B", 5L), (23L, "B", 1L))
    rows.toDF("doc_id", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = graft.queries.Parity8.queries("x2_source_quota")(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(3)))
    val a = out.filter(_._2 == "A")
    assert(a.length == 10)
    assert(a.map(_._1).toSet == (3L to 12L).toSet)  // two shortest dropped
    // B: ties on n_chars break by lower doc_id first
    assert(out.filter(_._2 == "B").sortBy(_._3).map(_._1).toSeq ==
      Seq(21L, 22L, 23L))
  }

  test("x4_repetition: fully repeated text scores high, unique text 0") {
    val d = fixtureDir("rep")
    Seq(
      (1L, "a b c a b c a b c"),      // 7 grams, 3 distinct
      (2L, "q w e r t y u"),          // all distinct -> 0.0
      (3L, "x y"))                    // too short -> 0 grams, ratio 0
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = graft.queries.Parity8.queries("x4_repetition")(spark, d)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((7L, 3L, 1.0 - 3.0 / 7)))
    assert(out(2L) == ((5L, 5L, 0.0)))
    assert(out(3L) == ((0L, 0L, 0.0)))
  }

  test("x8_total_sort is a permutation of lineitem in strict key order") {
    val out = graft.queries.Parity8.queries("x8_total_sort")(spark, sf)
      .collect()
    val li = graft.Tables.lineitem(spark, sf)
    assert(out.length == li.count())
    val keys = out.map(r => (r.getDouble(0), r.getLong(1), r.getInt(2)))
    assert(keys.sliding(2).forall {
      case Array(a, b) =>
        a._1 > b._1 || (a._1 == b._1 &&
          (a._2 < b._2 || (a._2 == b._2 && a._3 < b._3)))
      case _ => true
    })
  }

  test("x3_matryoshka rerank == brute-force top-k when pool is exhaustive") {
    // 20 deterministic vectors: with MatPool (40) >= 19 the prefix
    // stage cannot lose the true neighbors, so the two-stage result
    // must equal the exact brute-force top-10 for the same probe
    val d = fixtureDir("mat")
    val vecs = (0L until 20L).map { id =>
      val v = Array.tabulate(64)(i =>
        (math.sin(id * 31 + i * 7) * 0.5).toFloat)
      (id, v, (id % 4).toInt)
    }
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val mat = graft.queries.Parity8.queries("x3_matryoshka")(spark, d)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val bf = graft.ops.Similarity.knnBruteForce(
      graft.Tables.embeddings(spark, d), probeId = 0L, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(mat.toSeq == bf.toSeq)
  }

  test("x1_merge_upsert covers update/insert/keep with exact balances") {
    val d = fixtureDir("merge")
    Seq((1L, "c1", 10.50), (2L, "c2", 20.25), (3L, "c3", 5.00), (4L, "c4", 7.75))
      .toDF("c_custkey", "c_name", "c_acctbal")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")
    // orders: custkey 1 gets 2 orders, custkey 3 (excluded from the
    // target by %3) becomes an insert; custkey 4 has none -> keep
    Seq((1L, 100.10), (1L, 0.90), (3L, 50.00))
      .toDF("o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    val out = graft.queries.Parity8.queries("x1_merge_upsert")(spark, d)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getDouble(2), r.getString(3)))).toMap
    assert(out(1L) == (("c1", 111.50, "update")))
    assert(out(2L) == (("c2", 20.25, "keep")))
    assert(out(3L) == (("NEW", 50.00, "insert")))
    assert(out(4L) == (("c4", 7.75, "keep")))
  }

  test("x5_resample fills gaps with the last observation, counts per bucket") {
    val d = fixtureDir("resample")
    val h = 3600L * 1000000000L // 1 hour in ns (fixture ts is ns-long)
    // user 1: events in hours 0 and 3 (value 2.0 then 9.0); the two
    // events in hour 0 must resolve to the later one (value 2.0)
    Seq(
      (1L, 10L * 1000, 1L, 1.0), (2L, 20L * 1000, 1L, 2.0),
      (3L, 3 * h + 5000L, 1L, 9.0))
      .toDF("event_id", "ts", "user_id", "value")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = graft.queries.Parity8.queries("x5_resample")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val stepUs = 3600L * 1000000L
    assert(out.toSeq == Seq(
      (1L, 0L, 2.0, 2L),          // hour 0: two events, later wins
      (1L, stepUs, 2.0, 0L),      // gap: carried forward
      (1L, 2 * stepUs, 2.0, 0L),  // gap: carried forward
      (1L, 3 * stepUs, 9.0, 1L))) // new observation
  }

  test("x4_redact masks every digit run and nothing else") {
    val d = fixtureDir("redact")
    Seq((1L, 0L, """{"k": 69, "v": "a1b22"}"""), (2L, 0L, """{"k": null}"""))
      .toDF("event_id", "ts", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = graft.queries.Parity8.queries("x4_redact")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == """{"k": <num>, "v": "a<num>b<num>"}""")
    assert(out(2L) == """{"k": null}""")
  }
}
