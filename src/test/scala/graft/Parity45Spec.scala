package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for batch 14 (round 11): the video demux round-trip and the
  * planted-cut detection semantics.
  */
class Parity45Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ops.Multimodal

  test("video container round-trip: demux returns the exact frame " +
      "payloads; corrupt containers are rejected") {
    val bytes = Multimodal.encodeVideo(7L)
    val Some(frames) = Multimodal.demuxVideo(bytes)
    assert(frames.length == Multimodal.synthFrameCount(7L))
    frames.foreach(f => assert(Multimodal.decodeImage(f).isDefined,
      "every demuxed frame must be a decodable PNG"))
    val bad = bytes.clone(); bad(0) = 'X'.toByte
    assert(Multimodal.demuxVideo(bad).isEmpty)
    assert(Multimodal.demuxVideo(Array[Byte](1, 2)).isEmpty)
  }

  test("mm_scene_cuts: every video has EXACTLY one cut, at the " +
      "planted frame, and frames inside a scene are static") {
    val d = "/root/testdata/sf0.001"
    val rows = graft.queries.Parity45.queries("mm_scene_cuts")(spark, d)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      assert(r.getAs[Long]("n_frames") ==
        Multimodal.synthFrameCount(id).toLong)
      assert(r.getAs[Long]("n_cuts") == 1L,
        s"one planted formula shift -> one cut: $r")
      assert(r.getAs[Long]("cut_at") == Multimodal.synthCutAt(id).toLong,
        s"cut localized at the planted frame: $r")
    }
  }
}
