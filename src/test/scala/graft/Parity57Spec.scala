package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for batch 6 (round 12): video fingerprint dedup, image–caption
  * alignment, data-constrained epoch planning.
  */
class Parity57Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("mm_video_fp: banded join == brute force over the real decode; " +
      "every planted one-frame edit found at Hamming <= 2") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
    val media = graft.ops.Multimodal.synthVariantVideos(spark, docs)
    val fps = graft.ops.Multimodal.decodeVideoFp(spark, media).cache()
    val banded = graft.ops.Multimodal.phashNearDupPairs(fps,
        maxHamming = 3, idCol = "media_id", hashCol = "vfp")
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)]
      .collect().toSet
    val all = fps.as[(Long, Long)].collect()
    val brute = (for {
      (ia, ha) <- all; (ib, hb) <- all if ia < ib
      h = java.lang.Long.bitCount(ha ^ hb) if h <= 3
    } yield (ia, ib, h.toLong)).toSet
    assert(banded == brute, "16-bit-chunk banding must lose nothing")
    val planted = docs.select("doc_id").as[Long].collect()
      .filter(_ % 3 == 0).map(d => (d * 2, d * 2 + 1)).toSet
    val found = banded.filter(_._3 <= 2).map(p => (p._1, p._2))
    assert(planted.subsetOf(found),
      s"missing planted edits: ${(planted -- found).take(5)}")
    // signature replay: demuxed-and-decoded fold equals direct synthesis
    val byId = all.toMap
    Seq(0L, 3L, 7L).foreach { d =>
      val frames = (0 until graft.ops.Multimodal.VidFpFrames).map { j =>
        graft.ops.Multimodal.decodeImage(
          graft.ops.Multimodal.encodeGrayPng(
            graft.ops.Multimodal.VideoW, graft.ops.Multimodal.VideoH,
            (x, y) => graft.ops.Multimodal.synthVidFpPixel(d, j, x, y, 0))).get
      }
      val want = frames.map(graft.ops.Multimodal.dHash63).foldLeft(0L)(_ ^ _)
      assert(byId(d * 2) == want, s"doc $d base signature")
    }
    fps.unpersist()
  }

  test("mm_caption_align: true pairs score exactly 1000, planted " +
      "misalignments fall below the 900 gate") {
    val rows = graft.queries.Parity57.queries("mm_caption_align")(spark, sf)
      .collect()
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val sc = r.getAs[Long]("score_milli")
      val al = r.getAs[Long]("aligned")
      if (id % 5 == 0) {
        assert(sc < 900 && al == 0L, s"misaligned $id scored $sc")
      } else {
        assert(sc == 1000L && al == 1L, s"aligned $id scored $sc")
      }
    }
  }

  test("x7_epoch_plan: caps respected, flags consistent, budget " +
      "conserved, and the skewed mixture actually exercises the cap") {
    val rows = graft.queries.Parity57.queries("x7_epoch_plan")(spark, sf)
      .collect()
    assert(rows.length >= 2)
    val budget = 3L * rows.map(_.getAs[Long]("toks")).sum
    rows.foreach { r =>
      val toks = r.getAs[Long]("toks")
      val alloc = r.getAs[Long]("alloc")
      val fin = r.getAs[Long]("final_alloc")
      assert(fin <= 4 * toks, "repeat ceiling")
      assert(r.getAs[Long]("capped") ==
        (if (alloc > 4 * toks) 1L else 0L))
      assert(r.getAs[Long]("epochs_milli") == fin * 1000 / math.max(toks, 1))
      assert(r.getAs[Long]("epochs_milli") <= 4000L)
    }
    val nCapped = rows.map(_.getAs[Long]("capped")).sum
    assert(nCapped > 0 && nCapped < rows.length,
      s"the md5 mixture must cap some but not all sources: $nCapped")
    val totalFinal = rows.map(_.getAs[Long]("final_alloc")).sum
    assert(totalFinal <= budget, "never allocate past the budget")
    // redistribution places most of the stranded budget (integer slack
    // and re-capping can strand a little, never create)
    val totalAlloc = rows.map(_.getAs[Long]("alloc")).sum
    assert(totalFinal >= (totalAlloc * 9) / 10,
      s"redistribution too lossy: $totalFinal of $totalAlloc")
  }
}
