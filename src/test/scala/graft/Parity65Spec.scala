package graft

import graft.queries.Parity65
import org.scalatest.funsuite.AnyFunSuite

/** Pins x4_html_extract's extraction semantics on planted docs:
  * boilerplate (nav/aside/related/footer) is stripped, the article
  * body is conserved VERBATIM, link-farm mains are dropped on
  * density alone, and sub-minimum bodies are dropped on length. */
class Parity65Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(rows: (Long, String)*): Map[Long, (Long, Long, String)] = {
    import spark.implicits._
    Parity65.extract(rows.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(4), r.getString(5))))
      .toMap
  }

  test("planted boilerplate stripped, body text conserved verbatim") {
    val body = "Alpine glaciers retreated faster this decade than any " +
      "on record, reshaping downstream water budgets."
    val out = run(1L -> body)
    val (nKept, boilerLen, content) = out(1L)
    assert(nKept == 1, "exactly the article block survives")
    assert(content == body, "body must be conserved VERBATIM")
    assert(!content.contains("Home") && !content.contains("newsletter") &&
      !content.contains("Related") && !content.contains("Privacy"),
      s"boilerplate leaked into content: $content")
    assert(boilerLen > 0, "the dropped nav/aside/related/footer text " +
      "must be accounted as boilerplate")
  }

  test("link-farm main (doc_id % 7 == 0) is dropped on DENSITY, not " +
      "tag position; short bodies are dropped on length") {
    val long = "This sentence is clearly long enough to pass the " +
      "minimum-length gate on its own merits."
    val out = run(7L -> long, 3L -> "too short")
    assert(out(7L)._1 == 0,
      "main wrapped in one big anchor must be dropped (density)")
    assert(out(7L)._3 == "")
    assert(out(3L)._1 == 0, "sub-25-char body must be dropped (length)")
  }

  test("markup characters in the source text are escaped, never " +
      "parsed as tags (a doc containing '<a href=...' cannot smuggle " +
      "itself into the link-density denominator as markup)") {
    val tricky = "Use <a href=x> tags & entities > plain text, " +
      "the parser must treat all of this as content."
    val out = run(2L -> tricky)
    assert(out(2L)._1 == 1, "escaped markup is ordinary body text")
    // striptags runs AFTER escaping, so the '<a href=x>' survives in
    // entity form and decodes back to the original characters
    val roundTrip = out(2L)._3
      .replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")
    assert(roundTrip == tricky, s"content mangled: ${out(2L)._3}")
  }
}
