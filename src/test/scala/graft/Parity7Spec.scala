package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the round-3 Parity7 batch: planted-fixture checks for
  * chunk dedup and transition mining, and cross-query invariants for
  * sequence packing, commonness scoring, and the Q2 min-cost shape on
  * the sf0.001 testdata.
  */
class Parity7Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Write a minimal documents/events fixture dir and return its path. */
  private def fixtureDir(name: String): String = {
    val dir = Files.createTempDirectory(s"p7-$name").toFile
    dir.deleteOnExit()
    dir.getAbsolutePath
  }

  test("x2_chunk_dedup drops exactly the repeated chunks, keeps order") {
    val d = fixtureDir("chunk")
    // 20-token chunks: doc 1 = [A, B]; doc 2 = [B, C] (B repeats);
    // doc 3 = [A] (repeat) — tokens are 1-char words, 20 per chunk.
    def chunk(ch: String) = Seq.fill(20)(ch).mkString(" ")
    val a = chunk("a"); val b = chunk("b"); val c = chunk("c")
    Seq((1L, s"$a $b"), (2L, s"$b $c"), (3L, a))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = graft.queries.Parity7.queries("x2_chunk_dedup")(spark, d)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, 2L, s"$a $b")))
    assert(out(2L) == ((2L, 1L, c)))     // B dropped, C kept
    assert(out(3L) == ((1L, 0L, "")))    // everything dropped
  }

  test("x5_transitions counts planted per-user bigrams in time order") {
    val d = fixtureDir("trans")
    // user 1: view->click->view ; user 2: view->click. Transition
    // counts: (view,click)=2, (click,view)=1.
    Seq(
      (1L, 10L, 1L, "view"), (2L, 20L, 1L, "click"), (3L, 30L, 1L, "view"),
      (4L, 10L, 2L, "view"), (5L, 20L, 2L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = graft.queries.Parity7.queries("x5_transitions")(spark, d)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.toSet == Set(("view", "click", 2L), ("click", "view", 1L)))
    // total order: count desc first
    assert(rows.head == (("view", "click", 2L)))
  }

  test("x4_seq_pack: distributed prefix sum equals the sequential one") {
    val rows = graft.queries.Parity7.queries("x4_seq_pack")(spark, sf)
      .orderBy("doc_id").collect()
    var off = 0L
    rows.foreach { r =>
      val n = r.getLong(1)
      assert(r.getLong(2) == off / 512, s"bin_id at doc ${r.getLong(0)}")
      assert(r.getLong(3) == off % 512, s"bin_offset at doc ${r.getLong(0)}")
      off += n
    }
    assert(rows.length > 0 && off > 0)
  }

  test("x4_commonness: exact integer invariants hold") {
    val rows = graft.queries.Parity7.queries("x4_commonness")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, s, cm) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(s >= n)                       // every token occurs >= once
      assert(cm == s.toDouble / n)         // single IEEE division, exact
    }
  }

  test("x2_chunk_dedup is idempotent: deduping the kept text is a no-op") {
    val d = fixtureDir("idem")
    def chunk(ch: String) = Seq.fill(20)(ch).mkString(" ")
    Seq((1L, s"${chunk("a")} ${chunk("b")}"), (2L, s"${chunk("b")} ${chunk("c")}"),
      (3L, s"${chunk("c")} ${chunk("d")} ${chunk("a")}"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val once = graft.queries.Parity7.queries("x2_chunk_dedup")(spark, d)
    val d2 = fixtureDir("idem2")
    once.filter(col("n_kept") > 0)
      .select(col("doc_id"), col("kept_text").as("text"))
      .write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val twice = graft.queries.Parity7.queries("x2_chunk_dedup")(spark, d2)
    // pass 2 must keep every chunk pass 1 kept (no repeats survive 1)
    assert(twice.filter(col("n_kept") =!= col("n_chunks")).isEmpty)
  }

  test("x6_approx_topk with a roomy map equals the exact group counts") {
    val out = graft.queries.Parity7.queries("x6_approx_topk")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val exact = Tables.events(spark, sf).groupBy("event_type").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, c) => (-c, t) }.take(3)
    assert(out.toSeq == exact.toSeq)
  }

  test("x4_decontaminate flags exactly the docs sharing a probe 3-gram") {
    val d = fixtureDir("decon")
    // doc 0 is the probe (0 % 50 == 0); doc 1 leaks the 3-gram
    // "alpha beta gamma"; doc 2 shares no 3-gram (only a 2-gram).
    Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "zz alpha beta gamma yy"),
      (2L, "alpha beta xx yy zz qq"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = graft.queries.Parity7.queries("x4_decontaminate")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L))
  }

  test("x1_scd2_history compresses runs and closes intervals at changes") {
    val d = fixtureDir("scd2")
    // user 1: A@10, A@20, B@30, B@40, A@50 -> intervals
    // [10,29] A, [30,49] B, [50,open) A   (ts in ns; us = ns/1000)
    Seq(
      (1L, 10000L, 1L, "A"), (2L, 20000L, 1L, "A"), (3L, 30000L, 1L, "B"),
      (4L, 40000L, 1L, "B"), (5L, 50000L, 1L, "A"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = graft.queries.Parity7.queries("x1_scd2_history")(spark, d)
      .orderBy("valid_from_us").collect()
      .map(r => (r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(rows.toSeq == Seq(("A", 10L, 29L), ("B", 30L, 49L), ("A", 50L, -1L)))
  }

  test("q2_min_cost returns only per-part minimum European costs") {
    val out = graft.queries.Parity7.queries("q2_min_cost")(spark, sf)
    // recompute the per-part min over European suppliers independently
    val eu = Tables.supplier(spark, sf)
      .join(Tables.nation(spark, sf), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sf).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"))
    val minPerPart = Tables.lineitem(spark, sf)
      .join(eu, col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"))
      .agg(min(col("l_extendedprice").cast("decimal(18,2)")).as("mn"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pk = r.getLong(3)
      assert(BigDecimal(r.getDouble(6)) == BigDecimal(minPerPart(pk)),
        s"part $pk not at min cost")
    }
  }
}
