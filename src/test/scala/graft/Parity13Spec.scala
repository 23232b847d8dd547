package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the round-9 training-data operators (Parity13): exact
  * duplicated-substring span semantics, RAG chunk geometry/identity,
  * and largest-remainder temperature quotas.
  */
class Parity13Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixtureDir(name: String): String = {
    val dir = Files.createTempDirectory(s"p13-$name").toFile
    dir.deleteOnExit()
    dir.getAbsolutePath
  }

  private def writeDocs(d: String, docs: Seq[(Long, String, String)]): Unit =
    docs.map { case (id, src, text) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("x4_substr_dedup: spans merge overlaps, within-doc repeats don't count") {
    val d = fixtureDir("substr")
    val common8 = (1 to 8).map("c" + _).mkString(" ")   // one shared 8-gram
    val common9 = (1 to 9).map("k" + _).mkString(" ")   // 9 shared tokens -> 2 overlapping grams
    writeDocs(d, Seq(
      (1L, "s", s"$common8 u1 u2"),                     // shared head
      (2L, "s", s"v1 v2 $common8"),                     // shared tail
      (3L, "s", (1 to 12).map("w" + _).mkString(" ")),  // clean
      (4L, "s", common9),                               // overlap merge...
      (5L, "s", s"z1 $common9"),                        // ...with an offset copy
      (6L, "s", s"$common8 q1 $common8")))              // doc 1/2's gram, twice
    val out = graft.queries.Parity13.queries("x4_substr_dedup")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(out == Seq(
      (1L, 10L, 1L, 1L, 8L),   // one gram, one 8-token span
      (2L, 10L, 1L, 1L, 8L),
      (3L, 12L, 0L, 0L, 0L),   // clean doc reports zeros
      (4L, 9L, 2L, 1L, 9L),    // two overlapping grams merge to 9 tokens
      (5L, 10L, 2L, 1L, 9L),
      // doc 6 shares docs 1/2's gram at two positions separated by q1:
      // two disjoint spans, 16 covered tokens
      (6L, 17L, 2L, 2L, 16L)))
  }

  test("x4_chunk_rag: window/stride geometry and content-addressed fps") {
    val d = fixtureDir("chunk")
    val t100 = (1 to 100).map("t" + _)
    val t64 = (1 to 64).map("s" + _)
    writeDocs(d, Seq(
      (1L, "s", t100.mkString(" ")),  // 100 toks -> chunks (0,64), (48,52)
      (2L, "s", t64.mkString(" "))))  // exactly one window -> 1 chunk
    val out = graft.queries.Parity13.queries("x4_chunk_rag")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSeq
    assert(out.map(c => (c._1, c._2, c._3, c._4)) == Seq(
      (1L, 0L, 0L, 64L), (1L, 1L, 48L, 52L), (2L, 0L, 0L, 64L)))
    // chunk identity is md5 of the token-joined text
    assert(out.head._5 == md5hex(t100.take(64).mkString(" ")))
    assert(out(1)._5 == md5hex(t100.slice(48, 100).mkString(" ")))
    assert(out(2)._5 == md5hex(t64.mkString(" ")))
  }

  test("x7_temperature_sample: largest-remainder quotas sum exactly to N") {
    val d = fixtureDir("tsample")
    // 4-token docs: srcA 10 docs (40 toks, u=6), srcB 20 (80, u=8),
    // srcC 70 (280, u=16); U=30, N=100/5=20
    // base = (20u) div 30 = 4 / 5 / 10, remainders 0 / 10 / 20 -> the
    // single leftover goes to srcC: quotas 4 / 5 / 11
    val docs = (0 until 10).map(i => (i.toLong, "srcA", "a b c d")) ++
      (10 until 30).map(i => (i.toLong, "srcB", "e f g h")) ++
      (30 until 100).map(i => (i.toLong, "srcC", "i j k l"))
    writeDocs(d, docs)
    val out = graft.queries.Parity13.queries("x7_temperature_sample")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out.size == 20)
    val bySrc = out.groupBy(_._1).view.mapValues(_.size).toMap
    assert(bySrc == Map("srcA" -> 4, "srcB" -> 5, "srcC" -> 11))
    // ranks are contiguous from 1 per source (hash-rank top-n_i)
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted == (1L to rows.size.toLong)) }
  }
}
