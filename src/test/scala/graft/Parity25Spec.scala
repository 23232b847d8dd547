package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

/** Pins for batch 12: t-digest invariants (weight/mean conservation
  * under compression, rank accuracy on a known distribution, the
  * merge path), KL drift (zero against self, symmetric planted
  * drift), and common-neighbor link prediction (planted sampled
  * endpoints with known shared neighbors). */
class Parity25Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def digestOf(xs: Seq[Double], delta: Int): ArrayBuffer[Double] = {
    val buf = new ArrayBuffer[Double]
    xs.foreach(x => { buf += x += 1.0 })
    graft.functions.TDigestOps.compress(buf, delta)
  }

  test("TDigestOps.compress conserves total weight and weighted mean") {
    val xs = (1 to 10000).map(i => (i % 997).toDouble)
    val dig = digestOf(xs, 100)
    val n = dig.length / 2
    // k1-scale singleton tails give ~ (delta/4)·ln-odds-span centroids
    // for a single pass over raw points: ~25·ln(399²) ≈ 300-380 here
    assert(n < 450, s"delta=100 digest must stay small, got $n centroids")
    var w = 0.0; var wm = 0.0
    for (i <- 0 until n) { w += dig(2 * i + 1); wm += dig(2 * i) * dig(2 * i + 1) }
    assert(w == 10000.0)
    assert(math.abs(wm / w - xs.sum / xs.size) < 1e-9)
    // ascending mean order
    for (i <- 1 until n) assert(dig(2 * i) >= dig(2 * (i - 1)))
  }

  test("TDigestOps.quantile: rank error within bound on uniform input") {
    val xs = (1 to 10000).map(_.toDouble)
    val dig = new GenericArrayData(digestOf(xs, 100).toArray)
    for (q <- Seq(0.05, 0.25, 0.5, 0.75, 0.95)) {
      val est = graft.functions.TDigestOps.quantile(dig, q)
      val rank = xs.count(_ <= est) / 10000.0
      assert(math.abs(rank - q) <= 0.03, s"q=$q est=$est rank=$rank")
    }
  }

  test("TDigestOps: merged halves match the rank bound of a single digest") {
    val a = digestOf((1 to 5000).map(_.toDouble), 100)
    val b = digestOf((5001 to 10000).map(_.toDouble), 100)
    val merged = graft.functions.TDigestOps.compress(a ++= b, 100)
    val est = graft.functions.TDigestOps.quantile(
      new GenericArrayData(merged.toArray), 0.5)
    assert(math.abs(est - 5000.0) <= 300.0, s"median of merged halves: $est")
  }

  test("x6_tdigest: all bounded-oracle checks true on the real corpus") {
    val rows = graft.queries.Parity25.queries("x6_tdigest")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("p50_in_bound"), r.toString)
      assert(r.getAs[Boolean]("p95_in_bound"), r.toString)
      assert(r.getAs[Boolean]("union_p50_in_bound"), r.toString)
    }
  }

  test("x6_kl_drift: single source diverges zero from itself") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p25kl1").toString
    Seq((1L, "a b c a", "en", "solo", 7L), (2L, "b c a b", "en", "solo", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.queries.Parity25.queries("x6_kl_drift")(spark, dir)
      .collect().head
    assert(r.getAs[String]("source") == "solo")
    assert(r.getAs[Double]("kl") == 0.0,
      "corpus == source => p == q everywhere => KL 0")
  }

  test("x6_kl_drift: symmetric planted drift gives equal positive KL") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p25kl2").toString
    Seq((1L, "a a a a", "en", "srcA", 7L), (2L, "b b b b", "en", "srcB", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val m = graft.queries.Parity25.queries("x6_kl_drift")(spark, dir)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Double]("kl"))
      .toMap
    assert(m("srcA") > 0.0 && m("srcA") == m("srcB"),
      s"disjoint vocabularies drift symmetrically: $m")
  }

  test("x9_common_neighbors: planted sampled endpoints share two neighbors") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p25cn").toString
    // 27 and 59 pass the md5 '0f' sample gate (the other planted ids
    // 1000/1001 do not); 27-59 are NOT adjacent but share neighbors
    // 1000 and 1001 -> cn=2, du=dv=2, jaccard = 2/(2+2-2) = 1.0
    val orders = Seq(
      (10L, 27L), (10L, 1000L),
      (11L, 27L), (11L, 1001L),
      (12L, 59L), (12L, 1000L),
      (13L, 59L), (13L, 1001L))
    orders.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = graft.queries.Parity25.queries("x9_common_neighbors")(
      spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("u") == 27L && r.getAs[Long]("v") == 59L)
    assert(r.getAs[Long]("cn") == 2L)
    assert(r.getAs[Double]("jaccard") == 1.0)
  }
}
