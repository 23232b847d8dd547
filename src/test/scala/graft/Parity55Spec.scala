package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for batch 4 (round 12): DSIR importance resampling, acoustic
  * near-dup fingerprinting, outer-mode attribution.
  */
class Parity55Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("x7_dsir_sample: in-domain (en) docs are enriched in the " +
      "selection vs the corpus rate, and w_avg_milli = w_sum DIV n_toks") {
    val sel = graft.queries.Parity55.queries("x7_dsir_sample")(spark, sf)
      .collect()
    assert(sel.nonEmpty)
    sel.foreach { r =>
      assert(r.getAs[Long]("w_avg_milli") ==
        r.getAs[Long]("w_sum") / r.getAs[Long]("n_toks"))
    }
    val docs = graft.Tables.documents(spark, sf)
    val corpusEn = docs.filter(col("lang") === "en").count().toDouble /
      docs.count()
    val selEn = sel.count(_.getAs[String]("lang") == "en").toDouble /
      sel.length
    assert(selEn > corpusEn,
      s"importance resampling must enrich the target domain: " +
        s"selected $selEn vs corpus $corpusEn")
  }

  test("audioFp63: matches a direct per-sample recompute, and the " +
      "tweak moves at most 2 bits") {
    val ids = Seq(0L, 3L, 7L, 12L, 1000003L)
    ids.foreach { src =>
      val ss = Array.tabulate(graft.ops.Multimodal.AudioFpSamples)(i =>
        graft.ops.Multimodal.synthFpSample(src, i, 0))
      val fp = graft.ops.Multimodal.audioFp63(ss)
      // direct recompute: frame energies then comparison bits
      val e = ss.grouped(8).map(_.map(v => math.abs(v.toLong)).sum).toArray
      var want = 0L
      for (k <- 0 until 63) if (e(k + 1) > e(k)) want |= 1L << k
      assert(fp == want, s"src=$src")
      val tweaked = Array.tabulate(graft.ops.Multimodal.AudioFpSamples)(i =>
        graft.ops.Multimodal.synthFpSample(src, i, 1))
      val ham = java.lang.Long.bitCount(
        fp ^ graft.ops.Multimodal.audioFp63(tweaked))
      assert(ham <= 2, s"one bumped sample moves at most 2 bits: $ham")
    }
  }

  test("mm_audio_fp: every planted near-dup pair found; banded join " +
      "== brute force on the real corpus") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
    val media = graft.ops.Multimodal.synthVariantAudio(spark, docs)
    val fps = graft.ops.Multimodal.decodeAudioFp(spark, media).cache()
    val banded = graft.ops.Multimodal.phashNearDupPairs(fps,
        maxHamming = 3, idCol = "media_id", hashCol = "afp")
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)]
      .collect().toSet
    // brute force over the SAME real-decode fingerprints
    val all = fps.as[(Long, Long)].collect()
    val brute = (for {
      (ia, ha) <- all; (ib, hb) <- all if ia < ib
      h = java.lang.Long.bitCount(ha ^ hb) if h <= 3
    } yield (ia, ib, h.toLong)).toSet
    assert(banded == brute, "16-bit-chunk banding must lose nothing")
    // planted: docs with doc_id % 3 == 0 pair (2d, 2d+1) at Hamming <= 2
    val planted = docs.select("doc_id").as[Long].collect()
      .filter(_ % 3 == 0).map(d => (d * 2, d * 2 + 1)).toSet
    val found = banded.map(p => (p._1, p._2))
    assert(planted.subsetOf(found),
      s"missing planted near-dups: ${(planted -- found).take(5)}")
    fps.unpersist()
  }

  test("x5_attrib_outer: unmatched clicks survive exactly once with " +
      "null imp columns; matched rows equal the inner join") {
    val outer = graft.queries.Parity55.queries("x5_attrib_outer")(spark, sf)
      .collect()
    val inner = graft.queries.Parity52.queries("x5_stream_attrib")(spark, sf)
      .collect()
    val matched = outer.filter(!_.isNullAt(outer.head.fieldIndex("imp_id")))
    assert(matched.map(_.toString).sorted.toSeq ==
      inner.map(_.toString).sorted.toSeq,
      "outer's matched rows must equal the inner join")
    val unmatched = outer.filter(_.isNullAt(outer.head.fieldIndex("imp_id")))
    val innerClicks = inner.map(_.getAs[Long]("click_id")).toSet
    unmatched.foreach { r =>
      assert(!innerClicks.contains(r.getAs[Long]("click_id")))
      assert(r.isNullAt(r.fieldIndex("i_us")))
    }
    // exactly once: one outer row per unmatched click
    val um = unmatched.map(_.getAs[Long]("click_id"))
    assert(um.distinct.length == um.length)
    // and every click appears somewhere
    val allClicks = graft.Tables.eventsNs(spark, sf)
      .filter(col("event_type") === "click").count()
    assert((matched.map(_.getAs[Long]("click_id")).toSet ++ um).size ==
      allClicks.toInt)
  }
}
