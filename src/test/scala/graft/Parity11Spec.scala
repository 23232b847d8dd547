package graft

import org.apache.spark.sql.{AnalysisException, Row}
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the round-6 batch-2 operators: binned range join, native
  * session_window, Unicode normalization expressions, poly-hash
  * winnowing. */
class Parity11Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  // ---- RangeJoin -----------------------------------------------------

  test("range join equals the naive non-equi join") {
    val pts = Seq((1L, 10L), (2L, 55L), (3L, 119L), (4L, -7L), (5L, 200L))
      .toDF("pid", "p")
    val ivs = Seq((10L, 0L, 64L), (20L, 50L, 130L), (30L, -20L, -1L))
      .toDF("iid", "lo", "hi")
    val got = graft.ops.RangeJoin
      .pointInInterval(pts, "p", ivs, "lo", "hi", 32L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val want = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == want)
    assert(got == Set((1L, 10L), (2L, 10L), (2L, 20L), (3L, 20L), (4L, 30L)))
  }

  test("range join binning handles negative keys (floor, not trunc)") {
    // point -7 sits in bin -1 ([-32, -1]); trunc division would put it
    // in bin 0 and miss interval [-20, -1] entirely
    val pts = Seq((1L, -7L)).toDF("pid", "p")
    val ivs = Seq((30L, -20L, -1L)).toDF("iid", "lo", "hi")
    val got = graft.ops.RangeJoin
      .pointInInterval(pts, "p", ivs, "lo", "hi", 32L)
      .count()
    assert(got == 1L)
  }

  test("range join rejects shared/reserved column names up front") {
    val pts = Seq((1L, 10L)).toDF("pid", "p")
    intercept[IllegalArgumentException] {
      graft.ops.RangeJoin.pointInInterval(pts, "p",
        Seq((1L, 0L, 5L)).toDF("pid", "lo", "hi"), "lo", "hi", 8L)
    }
    intercept[IllegalArgumentException] {
      graft.ops.RangeJoin.pointInInterval(
        pts.withColumn("__bin", col("p")), "p",
        Seq((1L, 0L, 5L)).toDF("iid", "lo", "hi"), "lo", "hi", 8L)
    }
  }

  test("pqTopK rejects a codebook trained with a different m") {
    val emb = Tables.embeddings(spark, sf)
    val books = graft.ops.Similarity.pqCodebooks(emb, dim = 64, m = 4,
      ksub = 4, iters = 1)
    intercept[IllegalArgumentException] {
      graft.ops.Similarity.pqTopK(emb, emb.filter(col("vec_id") < 1),
        dim = 64, codebooks = books, m = 8, k = 3)
    }
  }

  test("j5_range_join plans a shuffle equi-join, never a nested loop") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = SparkEntry.queries("j5_range_join")(spark, sf)
        .queryExecution.explainString(FormattedMode)
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
      assert(!p.contains("CartesianProduct"), p)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("j12_interval_join plans a shuffle equi-join, never a nested loop") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = SparkEntry.queries("j12_interval_join")(spark, sf)
        .queryExecution.explainString(FormattedMode)
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
      assert(!p.contains("CartesianProduct"), p)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  // ---- session_window vs hand-rolled sessionizer ---------------------

  test("native session_window matches the gaps-and-islands sessionizer") {
    val gapUs = 30L * 60 * 1000000
    val native = SparkEntry.queries("x5_session_window")(spark, sf)
      .select("user_id", "session_start_us", "session_end_us", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    val hand = graft.ops.Sessionize.sessionize(Tables.eventsNs(spark, sf))
      .select(col("user_id"), col("session_start_us"),
        // session_window's end = last event + gap
        (col("session_end_us") + gapUs).as("session_end_us"),
        col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(native == hand)
    assert(native.nonEmpty)
  }

  // ---- Unicode normalization expressions -----------------------------

  test("unicode_nfc composes decomposed marks; idempotent on NFC text") {
    val df = Seq("Cafe\u0301", "d\u00e9j\u00e0", "plain").toDF("s")
      .select(graft.functions.TextNorm.unicode_nfc(col("s")).as("n"))
    assert(df.as[String].collect().toSeq ==
      Seq("Caf\u00e9", "d\u00e9j\u00e0", "plain"))
  }

  test("strip_accents folds both precomposed and decomposed diacritics") {
    val df = Seq("Cafe\u0301 cre\u0300me", "d\u00e9j\u00e0 fa\u00e7ade",
        "m\u00fchleisen", "ascii").toDF("s")
      .select(graft.functions.TextNorm.strip_accents(col("s")).as("n"))
    assert(df.as[String].collect().toSeq ==
      Seq("Cafe creme", "deja facade", "muhleisen", "ascii"))
  }

  test("text norm expressions propagate null and are SQL-callable") {
    graft.functions.TextNorm.register(spark)
    val r = spark.sql(
      "SELECT graft_nfc(CAST(NULL AS STRING)) AS a, " +
        "graft_strip_accents('sen\u0303or') AS b").collect().head
    assert(r.isNullAt(0) && r.getString(1) == "senor")
  }

  test("text norm expressions reject non-string input at analysis time") {
    graft.functions.TextNorm.register(spark)
    // binary is not implicitly castable to string -> analysis error,
    // not a runtime ClassCastException
    val e = intercept[AnalysisException] {
      spark.sql("SELECT graft_nfc(CAST('ab' AS BINARY))").collect()
    }
    assert(e.getMessage.contains("DATATYPE_MISMATCH") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("NFC canonicalization unifies content fingerprints across forms") {
    // the pipeline property the expression exists for: decomposed and
    // precomposed spellings of the same text hash identically after NFC
    val df = Seq(("a", "Cafe\u0301 au lait"), ("b", "Caf\u00e9 au lait"))
      .toDF("id", "text")
      .select(md5(graft.functions.TextNorm.unicode_nfc(col("text")))
        .as("fp"))
    assert(df.distinct().count() == 1)
  }

  test("text norm leaves non-Latin and supplementary-plane text intact") {
    // emoji (surrogate pairs), CJK, ZWJ sequences, and Hangul carry
    // no combining marks — normalization must pass them through.
    // Hangul is the regression case: its NFD decomposition is
    // conjoining Jamo (category Lo, not marks), so strip_accents must
    // RECOMPOSE after stripping or accent-free syllables come back
    // byte-different (and diverge from utf8proc oracles).
    val inputs = Seq("café 😀🏽", "你好世界",
      "a‍ b", "한국어")
    val out = inputs.toDF("s").select(
      graft.functions.TextNorm.unicode_nfc(col("s")).as("n"),
      graft.functions.TextNorm.strip_accents(col("s")).as("f"))
      .collect()
    assert(out.map(_.getString(0)).toSeq == inputs)
    assert(out(0).getString(1) == "cafe 😀🏽")
    assert(out(1).getString(1) == "你好世界")
    assert(out(3).getString(1) == "한국어")
  }

  // ---- poly-hash winnowing -------------------------------------------

  test("polyHash60 equals the first 15 hex digits of md5") {
    val got = Seq("a b c").toDF("s")
      .select(graft.ops.TextOps.polyHash60(col("s"))).as[Long].collect().head
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("a b c".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    assert(got == java.lang.Long.parseLong(hex, 16))
  }

  test("winnow_poly: shared long substring yields shared fingerprints") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, s"unique prefix one two three $shared"),
      (2L, s"$shared totally different suffix words here"))
      .toDF("doc_id", "text")
    val fps = docs
      .withColumn("toks", graft.ops.TextOps.tokens(col("text")))
      .withColumn("hs", transform(
        graft.ops.TextOps.shingleSeq(col("toks"), 3),
        g => graft.ops.TextOps.polyHash60(g)))
      .select(col("doc_id"),
        graft.ops.TextOps.winnowFromHashes(col("hs"), 4).as("fp"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fps(1L).toSet.intersect(fps(2L).toSet).nonEmpty)
  }

  test("shingleSeq keeps positional duplicates that shingles dedups") {
    val df = Seq("a b a b a b").toDF("text")
      .withColumn("toks", graft.ops.TextOps.tokens(col("text")))
    val seq = df.select(graft.ops.TextOps.shingleSeq(col("toks"), 3))
      .as[Seq[String]].collect().head
    val set = df.select(graft.ops.TextOps.shingles(col("text"), 3))
      .as[Seq[String]].collect().head
    assert(seq == Seq("a b a", "b a b", "a b a", "b a b"))
    assert(set.toSet == seq.toSet && set.size == 2)
  }
}
