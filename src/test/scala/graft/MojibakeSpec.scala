package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextOps

/** Encoding-repair contract: the Latin-1-misread corruption is
  * inverted exactly (single AND double encoding), and the detection
  * gate never touches clean text — ASCII, real non-Latin-1 unicode,
  * accidental marker lookalikes outside the gate, or invalid bytes.
  */
class MojibakeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fixAll(ss: Seq[String]): Seq[String] = {
    import spark.implicits._
    ss.toDF("s").select(TextOps.fixMojibake(col("s")).as("f"))
      .collect().map(r => Option(r.getString(0)).orNull).toSeq
  }

  private def corruptAll(ss: Seq[String]): Seq[String] = {
    import spark.implicits._
    ss.toDF("s").select(TextOps.mojibake(col("s")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  private val samples = Seq(
    "café au lait",                 // Latin-1-representable
    "“quoted” — em dash", // above-Latin-1 punctuation
    "mixed: naïve résumé ✓ 中文", // CJK+check
    "plain ascii stays put")

  test("fixMojibake inverts the Latin-1 misread exactly (single pass)") {
    val corrupted = corruptAll(samples)
    // corruption is visible for any non-ASCII input
    samples.zip(corrupted).foreach { case (orig, c) =>
      if (orig.exists(_ > 0x7f)) assert(c != orig) else assert(c == orig)
    }
    assert(fixAll(corrupted) == samples)
  }

  test("fixMojibake unwinds DOUBLE encoding in its two passes") {
    val twice = corruptAll(corruptAll(samples))
    assert(fixAll(twice) == samples)
  }

  test("clean text is untouched: ascii, real unicode above Latin-1, " +
      "and null") {
    assert(fixAll(samples) == samples)
    assert(fixAll(Seq(null)) == Seq(null))
  }

  test("a real 'Ã©' in otherwise in-gate text is repaired (the " +
      "documented ftfy-style false-positive bound), but any char " +
      "above U+00FF blocks the repair") {
    // all chars <= U+00FF and bytes re-parse as UTF-8: gate fires
    assert(fixAll(Seq("legit Ã© pair")) ==
      Seq("legit é pair"))
    // same marker next to an em dash: provably not a Latin-1 misread
    val guarded = "legit Ã© pair — kept"
    assert(fixAll(Seq(guarded)) == Seq(guarded))
  }

  test("a supplementary-plane char (emoji) blocks the repair like " +
      "any other above-Latin-1 char — never destroyed to '?'") {
    // marker pair present, every OTHER char <= U+00FF, but the emoji
    // (U+1F600, outside the BMP) proves this is not a Latin-1 misread
    val s = "legit Ã© pair 😀 kept"
    assert(fixAll(Seq(s)) == Seq(s))
  }

  test("Latin-1 bytes that do NOT re-parse as UTF-8 are left alone " +
      "(the strict decoder is never reached)") {
    // 'Ã' followed by a non-continuation char: marker regex misses;
    // and a marker pair followed by a lone lead byte: invalid UTF-8
    val invalid = "broken Ã© tail Ã end"
    assert(fixAll(Seq(invalid)) == Seq(invalid))
  }
}
