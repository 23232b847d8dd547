package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for batch 16: the Misra-Gries machinery in the regime the
  * corpus doesn't reach (vocab > k: decrement and merge-cut fire),
  * plus the k-anonymity audit on hand-countable groups. */
class Parity29Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("MisraGries: heavy item survives a vocab >> k stream within the bound") {
    import spark.implicits._
    // stream: 'hot' x 400 + 100 distinct cold items x 4 each = 800
    // tokens, k=8 -> error <= n/(k+1) = 88.9; hot must be kept with
    // count >= 400 - 88 (decrements), cold items are evictable
    val items = Seq.fill(400)("hot") ++
      (0 until 100).flatMap(i => Seq.fill(4)(f"cold$i%03d"))
    // shuffle deterministically so hot is interleaved (worst-ish case)
    val stream = items.zipWithIndex
      .sortBy { case (s, i) => (i * 2654435761L) % 800 }.map(_._1)
    val df = stream.toDF("tok")
    val mg = df.agg(
      graft.functions.MisraGries.misra_gries(spark, col("tok"), 8).as("mg"))
      .select(explode(col("mg")).as("e"))
      .select(col("e.item"), col("e.cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mg.size <= 8, s"at most k counters: $mg")
    assert(mg.contains("hot"), s"the true heavy hitter must survive: $mg")
    val err = 400L - mg("hot")
    assert(err >= 0 && err <= 800 / 9 + 1, s"count error $err outside bound")
  }

  test("MisraGries: merge of disjoint partials respects the cut rule") {
    val a = graft.functions.MisraGriesAgg(null, 4).createAggregationBuffer()
    val b = graft.functions.MisraGriesAgg(null, 4).createAggregationBuffer()
    Seq("x" -> 10L, "y" -> 8L, "z" -> 2L).foreach { case (k, v) => a(k) = v }
    Seq("p" -> 9L, "q" -> 3L, "x" -> 5L).foreach { case (k, v) => b(k) = v }
    val m = graft.functions.MisraGriesAgg(null, 4).merge(a, b)
    // merged: x=15, p=9, y=8, q=3, z=2 -> cut = 5th largest = 2 ->
    // x=13, p=7, y=6, q=1; z drops
    assert(m.size <= 4)
    assert(m("x") == 13L && m("p") == 7L && m("y") == 6L && m("q") == 1L)
    assert(!m.contains("z"))
  }

  test("x6_heavy_hitters: corpus booleans all true (exact regime)") {
    val rows = graft.queries.Parity29.queries("x6_heavy_hitters")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("in_sketch") && r.getAs[Boolean]("err_in_bound"),
        r.toString)
    }
  }

  test("x4_kanon: planted small groups are counted as risky") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p29ka").toString
    // group (en, s1, 0): 5 docs -> safe at k=5; (fr, s1, 0): 2 docs
    // -> risky; (en, s2, 1): 1 doc -> risky
    val docs = (1 to 5).map(i => (i.toLong, "t", "en", "s1", 10L)) ++
      Seq((6L, "t", "fr", "s1", 20L), (7L, "t", "fr", "s1", 30L),
        (8L, "t", "en", "s2", 150L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.queries.Parity29.queries("x4_kanon")(spark, dir)
      .collect().head
    assert(r.getAs[Long]("n_groups") == 3L)
    assert(r.getAs[Long]("n_risky_groups") == 2L)
    assert(r.getAs[Long]("n_risky_docs") == 3L)
  }
}
