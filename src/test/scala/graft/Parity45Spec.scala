package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for batch 14 (round 11): the video demux round-trip and the
  * planted-cut detection semantics.
  */
class Parity45Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ops.Multimodal

  test("AVI container round-trip: demux returns the exact frame " +
      "payloads; corrupt containers are rejected") {
    val bytes = Multimodal.encodeVideo(7L)
    val Some(frames) = Multimodal.demuxVideo(bytes)
    assert(frames.length == Multimodal.synthFrameCount(7L))
    frames.foreach(f => assert(Multimodal.decodeImage(f).isDefined,
      "every demuxed frame must be a decodable PNG"))
    val bad = bytes.clone(); bad(0) = 'X'.toByte
    assert(Multimodal.demuxVideo(bad).isEmpty, "bad RIFF magic")
    val notAvi = bytes.clone()
    notAvi(8) = 'W'.toByte // RIFF form type != 'AVI '
    assert(Multimodal.demuxVideo(notAvi).isEmpty)
    assert(Multimodal.demuxVideo(Array[Byte](1, 2)).isEmpty)
    assert(Multimodal.demuxVideo(bytes.take(40)).isEmpty,
      "truncated mid-header")
  }

  test("the AVI writer is spec-shaped RIFF: magic, hdrl headers, " +
      "even-padded 00dc chunks, idx1 — and the demuxer is a generic " +
      "walker that survives foreign chunks and odd frame lengths") {
    val bytes = Multimodal.encodeVideo(7L)
    def fourcc(off: Int) = new String(bytes.slice(off, off + 4), "US-ASCII")
    def le32(off: Int) =
      java.nio.ByteBuffer.wrap(bytes, off, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    assert(fourcc(0) == "RIFF" && fourcc(8) == "AVI ")
    assert(le32(4) == bytes.length - 8, "RIFF size covers the file")
    assert(fourcc(12) == "LIST" && fourcc(20) == "hdrl")
    assert(fourcc(24) == "avih" && le32(28) == 56)
    // a REAL odd-length frame forces the even-padding path; a foreign
    // 'JUNK' chunk between hdrl and movi must be skipped, not choked on
    val odd = Array.tabulate[Byte](33)(i => (i * 7).toByte)
    val evenF = Array.tabulate[Byte](20)(i => (i * 3).toByte)
    val avi = Multimodal.encodeAvi(Seq(odd, evenF), 8, 6)
    val Some(back) = Multimodal.demuxAvi(avi)
    assert(back.length == 2 &&
      back(0).toSeq == odd.toSeq && back(1).toSeq == evenF.toSeq,
      "payloads survive round-trip bit-exact incl. the odd-length one")
    // splice a JUNK chunk right after the hdrl LIST (offset 12 + 8 +
    // hdrl size), shifting movi — the generic walker must skip it
    val hdrlEnd = 12 + 8 + le32(16)
    val junk = "JUNK".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ Array[Byte](9, 9, 9, 9)
    val spliced = bytes.take(hdrlEnd) ++ junk ++ bytes.drop(hdrlEnd)
    // fix the RIFF size for the inserted bytes
    val bb = java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val Some(viaJunk) = Multimodal.demuxAvi(spliced)
    assert(viaJunk.length == Multimodal.synthFrameCount(7L),
      "foreign top-level chunks are skipped by the RIFF walk")
  }

  test("dHash: planted near-dups land within Hamming 2, structurally " +
      "different images land far, and the chunk-banded join equals " +
      "brute force on the real corpus") {
    val d = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, d)
    val media = Multimodal.synthVariantImages(spark, docs)
    val hashes = Multimodal.decodeDHash(spark, media)
    val hs = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs.size == 2 * docs.count(),
      "every variant payload decodes (real codec round-trip)")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    docs.select("doc_id").collect().map(_.getLong(0)).foreach { id =>
      val h = ham(hs(id * 2), hs(id * 2 + 1))
      if (id % 3 == 0)
        assert(h <= 2, s"near variant of $id drifted: hamming $h")
      else assert(h > 3,
        s"structurally different variant of $id collided: hamming $h")
    }
    // banding completeness: the 4-chunk candidate join must equal the
    // all-pairs Hamming scan at the threshold it is complete for
    val brute = hs.toSeq.combinations(2).collect {
      case Seq((ia, ha), (ib, hb)) if ham(ha, hb) <= 3 =>
        (math.min(ia, ib), math.max(ia, ib))
    }.toSet
    val banded = Multimodal.phashNearDupPairs(hashes, maxHamming = 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == brute,
      s"banded join missed ${(brute -- banded).size} / " +
        s"leaked ${(banded -- brute).size} pairs")
    // class-collapsed form expands to EXACTLY the raw pair count:
    // Σ cross-class n_a·n_b (near classes) + Σ intra-class C(n,2)
    // (exact dups, Hamming 0)
    val classPairs = Multimodal.phashClassPairs(hashes, maxHamming = 3)
      .collect()
    val cross = classPairs.map(r =>
      r.getAs[Long]("n_a") * r.getAs[Long]("n_b")).sum
    val intra = hs.values.groupBy(identity).values
      .map(g => g.size.toLong * (g.size - 1) / 2).sum
    assert(cross + intra == brute.size.toLong,
      s"class expansion $cross + intra $intra != raw ${brute.size}")
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
