package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the substring-pipeline completion: the CDC chunking
  * stability property (the reason content-defined beats fixed-window
  * chunking) and scrub/count consistency with the span finder. */
class Parity18Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("x4_cdc_chunk: an insertion only changes chunks near the edit") {
    import spark.implicits._
    import graft.ops.TextOps
    // chunk one document, then the same document with a token
    // inserted near the front; chunk fingerprints AFTER the first
    // boundary past the edit must be identical (fixed windows would
    // shift-and-rewrite every downstream chunk)
    val base = (1 to 400).map(i => s"w${i % 97}x$i").mkString(" ")
    val edited = {
      val toks = base.split(" ").toVector
      (toks.take(3) ++ Vector("INSERTED") ++ toks.drop(3)).mkString(" ")
    }
    def chunks(text: String): Seq[(Long, String)] = {
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val tk = df.select(col("doc_id"),
        TextOps.tokens(lower(col("text"))).as("t"))
      val bounds = tk.select(col("doc_id"),
          posexplode(TextOps.shingleSeq(col("t"), 4)))
        .withColumnRenamed("col", "gram")
        .filter(TextOps.polyHash60(col("gram")) % 16 === 0)
        .select(col("doc_id"), (col("pos") + 4).as("cut_at"))
      val toks = tk.select(col("doc_id"), posexplode(col("t")))
        .withColumnRenamed("col", "tok")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      toks.join(bounds, toks("doc_id") === bounds("doc_id") &&
          col("pos") === col("cut_at"), "left")
        .select(toks("doc_id"), col("pos"), col("tok"),
          when(col("cut_at").isNotNull, 1L).otherwise(0L).as("flag"))
        .withColumn("chunk_id", sum(col("flag")).over(w))
        .groupBy(col("chunk_id"))
        .agg(md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ")).as("fp"))
        .orderBy(col("chunk_id"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
    }
    val a = chunks(base)
    val b = chunks(edited)
    assert(a.size > 5, s"fixture too short to chunk (${a.size} chunks)")
    // all chunks strictly after the first differing one must realign:
    // compare the TAIL SETS (chunk ids shift by at most the insertion)
    val fpA = a.map(_._2).toSet
    val fpB = b.map(_._2).toSet
    val shared = fpA & fpB
    assert(shared.size >= a.size - 3,
      s"CDC stability violated: only ${shared.size} of ${a.size} chunks survive a 1-token insertion")
  }

  test("x4_substr_scrub: kept+cut == total, and scrubbed docs shrink") {
    val out = SparkEntry.queries("x4_substr_scrub")(spark, sf)
    assert(out.filter(col("kept_tokens") + col("cut_tokens") =!=
      col("n_tokens")).isEmpty)
    // the corpus plants near-duplicates, so some doc must be cut
    assert(out.filter(col("cut_tokens") > 0).count() > 0)
    // consistency with the span finder: dup_tokens == cut_tokens
    val dd = SparkEntry.queries("x4_substr_dedup")(spark, sf)
      .select(col("doc_id"), col("dup_tokens"))
    val joined = out.join(dd, Seq("doc_id"))
    assert(joined.filter(col("cut_tokens") =!= col("dup_tokens")).isEmpty)
  }
}
