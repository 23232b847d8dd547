package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sinks

/** Write-layout checks: partition pruning on partitioned parquet,
  * shuffle-free joins on bucketed tables (SURVEY.md §2 S5 + §4). */
class SinksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("HtmlTable: first table only, tags stripped, entities decoded") {
    import graft.sources.HtmlTable
    import spark.implicits._
    val page =
      """<html><body><p>intro</p>
        |<table id="t1"><tr><th>K</th><th>V</th></tr>
        |<tr><td> 1 </td><td><a href="/x">A &amp; B</a></td></tr>
        |<tr><td>2</td><td>&lt;tag&gt; &nbsp;ok&#39;s</td></tr></table>
        |<table id="t2"><tr><td>ignored</td></tr></table>
        |</body></html>""".stripMargin
    val rows = Seq(page).toDF("html")
      .select(HtmlTable.tableRows(col("html")).as("rows"))
      .head().getSeq[scala.collection.Seq[String]](0).map(_.toList)
    assert(rows == Seq(
      List("K", "V"),
      List("1", "A & B"),
      List("2", "<tag>  ok's")))
    // no table -> no rows, not an error
    val none = Seq("<html><body>nothing here</body></html>").toDF("html")
      .select(HtmlTable.tableRows(col("html")).as("r"))
      .head().getSeq[Any](0)
    assert(none.isEmpty)
  }

  test("ORC round-trip preserves schema and rows (alt columnar source)") {
    val out = s"${TestSpark.fixtures}/orc_li_${System.nanoTime()}"
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
    li.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(back.schema == li.schema)
    assert(back.count() == li.count())
    // predicate pushdown reaches the ORC scan too
    val p = back.filter(col("l_quantity") > 25)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("GreaterThan"), p)
  }

  test("compact: fragmented directory rewrites to size-targeted files") {
    val frag = s"${TestSpark.fixtures}/compact_src_${System.nanoTime()}"
    val dest = s"${TestSpark.fixtures}/compact_dst_${System.nanoTime()}"
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    li.repartition(50).write.mode("overwrite").parquet(frag) // 50 tiny files
    def dataFiles(p: String) = new java.io.File(p).listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
    assert(dataFiles(frag).length == 50)
    val srcBytes = dataFiles(frag).map(_.length()).sum
    // target ~1/3 of the fragmented size -> expect ceil(bytes/target)
    val target = srcBytes / 3
    val planned = Sinks.compact(spark, frag, dest, target)
    assert(planned == (srcBytes + target - 1) / target)
    assert(dataFiles(dest).length == planned)
    val back = spark.read.parquet(dest)
    assert(back.count() == li.count())
    assert(back.schema == spark.read.parquet(frag).schema)
  }

  test("compact: empty source dir is a 0-file no-op; bad target rejects") {
    val empty = s"${TestSpark.fixtures}/compact_empty_${System.nanoTime()}"
    val dest = s"${TestSpark.fixtures}/compact_empty_dst_${System.nanoTime()}"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(empty))
    assert(Sinks.compact(spark, empty, dest) == 0L)
    assert(!new java.io.File(dest).exists())
    intercept[IllegalArgumentException] {
      Sinks.compact(spark, empty, dest, targetBytes = 0L)
    }
  }

  test("mergeSchema reads evolving parquet batches as one relation") {
    val dir = s"${TestSpark.fixtures}/evolve_${System.nanoTime()}"
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
    val v1 = o.filter(col("o_orderkey") <= 4000)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val v2 = o.filter(col("o_orderkey") > 4000)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    v1.write.mode("append").parquet(dir)
    v2.write.mode("append").parquet(dir) // later batch carries a new col
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("o_orderkey", "o_custkey",
      "o_totalprice", "o_orderpriority"))
    assert(merged.count() == v1.count() + v2.count())
    // v1 rows surface the evolved column as null
    assert(merged.filter(col("o_orderpriority").isNull).count() == v1.count())
    // default read (no mergeSchema) picks ONE footer's schema — the
    // documented reason ingest paths must opt in
    val plain = spark.read.parquet(dir)
    assert(plain.columns.length <= merged.columns.length)
  }

  test("text source round-trip: one line per document") {
    val out = s"${TestSpark.fixtures}/txt_${System.nanoTime()}"
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(regexp_replace(col("text"), "[\\r\\n]", " ").as("value"))
    docs.write.mode("overwrite").text(out)
    val back = spark.read.text(out)
    assert(back.count() == docs.count())
    assert(back.schema.fieldNames.toSeq == Seq("value"))
  }

  test("partitionBy layout prunes: only the filtered directory is read") {
    val out = s"${TestSpark.fixtures}/part_docs_${System.nanoTime()}"
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    Sinks.writePartitioned(docs, out, Seq("lang"))
    val dirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("lang="))
    assert(dirs.toSet == Set("lang=en", "lang=fr", "lang=es", "lang=de", "lang=zh"))
    val back = spark.read.parquet(out).filter(col("lang") === "en")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("lang#") && !plan.contains("PushedFilters: [IsNotNull(lang)"))
    assert(back.count() ==
      docs.filter(col("lang") === "en").count())
  }

  test("bucketed tables equi-join without any exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      Sinks.writeBucketed(docs.select("doc_id", "lang"), "b_left", "doc_id", 4)
      Sinks.writeBucketed(docs.select("doc_id", "n_chars"), "b_right", "doc_id", 4)
      val joined = spark.table("b_left").join(spark.table("b_right"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      assert(joined.count() == 500)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_left")
      spark.sql("DROP TABLE IF EXISTS b_right")
    }
  }
}
