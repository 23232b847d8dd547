package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for batch 5 (round 12): BM25 ranked retrieval, Gopher-rule
  * quality filtering, DoReMi domain reweighting.
  */
class Parity56Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("x4_bm25_topk: scores descend with doc_id tie-break, every hit " +
      "contains a query term, and the top score replays by hand") {
    val rows = graft.queries.Parity56.queries("x4_bm25_topk")(spark, sf)
      .collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val scores = rows.map(r =>
      (r.getAs[Long]("bm25_milli"), r.getAs[Long]("doc_id")))
    scores.sliding(2).foreach {
      case Array((s1, d1), (s2, d2)) =>
        assert(s1 > s2 || (s1 == s2 && d1 < d2), "orderBy desc + id asc")
      case _ =>
    }
    // replay the integer BM25 for the winning doc from raw text
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").trim.toLowerCase
          .split("\\s+").filter(_.nonEmpty).toSeq).toMap
    val nDocs = docs.size.toLong
    val tot = docs.valuesIterator.map(_.size.toLong).sum
    val avgdlMilli = (tot * 1000) / nDocs
    def score(id: Long): Long = {
      val toks = docs(id)
      val dl = toks.size.toLong
      graft.queries.Parity56.Bm25Terms.map { term =>
        val tf = toks.count(_ == term).toLong
        if (tf == 0) 0L
        else {
          val df = docs.valuesIterator.count(_.contains(term)).toLong
          val idf = ((2 * nDocs - 2 * df + 1) * 1000) / (2 * df + 1)
          (idf * tf * 2200) /
            (tf * 1000 + (1200 * (250 + (750 * dl * 1000) / avgdlMilli)) / 1000)
        }
      }.sum
    }
    val (topScore, topId) = scores.head
    assert(score(topId) == topScore, s"hand replay of doc $topId")
    // and no unreturned doc beats the cutoff
    val cutoff = scores.last
    docs.keysIterator.filterNot(scores.map(_._2).contains).foreach { id =>
      val s = score(id)
      assert(s < cutoff._1 || (s == cutoff._1 && id > cutoff._2),
        s"doc $id (score $s) should have made the top-k over $cutoff")
    }
  }

  test("x4_gopher_rules: one row per doc, flags consistent with their " +
      "metrics, and metrics replay from raw text for a sample") {
    val rows = graft.queries.Parity56.queries("x4_gopher_rules")(spark, sf)
      .collect()
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(rows.length == nDocs)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
    rows.foreach { r =>
      val wc = r.getAs[Long]("wc"); val mwl = r.getAs[Long]("mwl_milli")
      val ns = r.getAs[Long]("n_stop"); val rep = r.getAs[Long]("rep_milli")
      assert(r.getAs[Long]("r_wc") == (if (wc >= 30 && wc <= 100000) 1 else 0))
      assert(r.getAs[Long]("r_mwl") ==
        (if (mwl >= 3000 && mwl <= 10000) 1 else 0))
      assert(r.getAs[Long]("r_stop") == (if (ns >= 2) 1 else 0))
      assert(r.getAs[Long]("r_rep") == (if (rep <= 200) 1 else 0))
      val all = r.getAs[Long]("r_wc") + r.getAs[Long]("r_mwl") +
        r.getAs[Long]("r_stop") + r.getAs[Long]("r_rep")
      assert(r.getAs[Long]("pass") == (if (all == 4) 1 else 0))
    }
    // replay wc / chars / n_stop / max 2-gram occupancy for 5 docs
    val sample = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").limit(5).collect()
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    sample.foreach { d =>
      val toks = d.getAs[String]("text").trim.toLowerCase.split("\\s+").toSeq
      val r = byId(d.getAs[Long]("doc_id"))
      val chars = toks.map(_.length.toLong).sum
      assert(r.getAs[Long]("wc") == toks.size.toLong)
      assert(r.getAs[Long]("mwl_milli") == chars * 1000 / toks.size)
      assert(r.getAs[Long]("n_stop") ==
        toks.distinct.count(graft.ops.TextOps.stopwords.contains).toLong)
      val want =
        if (toks.size < 2) 0L
        else toks.sliding(2).toSeq.groupBy(identity).valuesIterator
          .map(g => g.size.toLong *
            (g.head(0).length + g.head(1).length) * 1000 / chars).max
      assert(r.getAs[Long]("rep_milli") == want,
        s"2-gram occupancy, doc ${d.getAs[Long]("doc_id")}")
    }
  }

  test("x7_doremi_weights: weights stay a (near-)distribution, the " +
      "max-excess domain is boosted, zero-excess domains shed weight") {
    val rows = graft.queries.Parity56.queries("x7_doremi_weights")(spark, sf)
      .collect()
    val nd = rows.length.toLong
    assert(nd >= 2)
    val uniform = 1000000L / nd
    val sum = rows.map(_.getAs[Long]("w_micro")).sum
    // every renorm DIV loses < 1 micro per domain per round (5 rounds)
    assert(sum <= 1000000L && sum > 1000000L - 6 * nd,
      s"weights must renormalize to ~1e6: $sum")
    val byExcess = rows.sortBy(-_.getAs[Long]("excess"))
    assert(byExcess.head.getAs[Long]("w_micro") > uniform,
      "highest-excess domain must gain over uniform")
    rows.filter(_.getAs[Long]("excess") == 0L).foreach { r =>
      assert(r.getAs[Long]("w_micro") <= uniform,
        s"zero-excess ${r.getAs[String]("source")} must not gain")
    }
    // smoothing floor: no domain collapses below 10% of uniform
    rows.foreach(r => assert(r.getAs[Long]("w_micro") >= uniform / 10 - 5))
  }
}
