package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for batch 13 (round 11): the WAV codec round-trip on
  * hand-known samples, and the corrupt-payload filter.
  */
class Parity44Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ops.Multimodal

  test("WAV PCM16 round-trip: encode -> decode returns the exact " +
      "samples and the declared rate") {
    val samples = Array(0, 1, -1, 32767, -32768, 1024, -1024)
    val bytes = Multimodal.encodeWavPcm16(samples, sampleRate = 8000)
    assert(bytes.length == 44 + samples.length * 2)
    val Some((sr, back)) = Multimodal.decodeWavPcm16(bytes)
    assert(sr == 8000)
    assert(back.toSeq == samples.toSeq)
  }

  test("decodeWavPcm16: corrupt/foreign payloads are rejected, not " +
      "mis-decoded") {
    assert(Multimodal.decodeWavPcm16(Array[Byte](1, 2, 3)).isEmpty)
    val good = Multimodal.encodeWavPcm16(Array(1, 2, 3))
    val bad = good.clone(); bad(0) = 'X'.toByte // break the RIFF magic
    assert(Multimodal.decodeWavPcm16(bad).isEmpty)
    val stereoHeader = good.clone(); stereoHeader(22) = 2 // channels=2
    assert(Multimodal.decodeWavPcm16(stereoHeader).isEmpty)
    // a PNG payload must not parse as audio
    val png = Multimodal.encodeGrayPng(4, 4, (_, _) => 7)
    assert(Multimodal.decodeWavPcm16(png).isEmpty)
  }

  test("mm_audio: decoded features match hand computation on one id") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val row = graft.queries.Parity44.queries("mm_audio")(spark, d)
      .filter(col("media_id") === 5L).collect()(0)
    val n = Multimodal.synthAudioLen(5L)
    val ss = Array.tabulate(n)(i => Multimodal.synthSample(5L, i))
    assert(row.getAs[Long]("n_samples") == n.toLong)
    assert(row.getAs[Long]("sum_abs") == ss.map(v => math.abs(v.toLong)).sum)
    assert(row.getAs[Long]("energy") == ss.map(v => v.toLong * v).sum)
    val zc = (1 until n).count(i => (ss(i - 1) < 0) != (ss(i) < 0))
    assert(row.getAs[Long]("zero_cross") == zc.toLong)
    assert(row.getAs[Long]("duration_ms") == n.toLong * 1000 / 8000)
  }
}
