package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for batch 9 (round 12): storage-format breadth. */
class Parity60Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("s12_orc_roundtrip: schema survives, and filters push into the " +
      "ORC scan like they do for parquet") {
    val back = graft.queries.Parity60.queries("s12_orc_roundtrip")(spark, sf)
    val want = graft.Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") % 1000 === 0)
      .select("l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_returnflag", "l_shipdate")
    assert(back.schema.map(f => (f.name, f.dataType)).toSet ==
      want.select(col("l_orderkey"),
        col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"),
        col("l_returnflag"), col("l_shipdate"))
        .schema.map(f => (f.name, f.dataType)).toSet,
      "ORC round trip changed the schema")
    assert(back.count() == want.count())
    // pushdown reaches the ORC scan (the columnar contract holds for
    // the second lake format too)
    val p = back.filter(col("l_orderkey") > 100)
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("PushedFilters") && p.contains("GreaterThan"),
      "ORC scan lost filter pushdown:\n" + p)
  }

  test("s13_binary_ingest: the file-landed path emits exactly the " +
      "stats of the payload-column path") {
    val fromFiles = graft.queries.Parity60
      .queries("s13_binary_ingest")(spark, sf).collect()
    assert(fromFiles.length == 200)
    val docs = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") < 200)
    val fromColumns = graft.ops.Multimodal
      .decodeAudioStats(spark,
        graft.ops.Multimodal.synthAudio(spark, docs))
      .toDF().orderBy("media_id").collect()
    assert(fromFiles.map(_.toString).toSeq ==
      fromColumns.map(_.toString).toSeq,
      "binaryFile ingest and payload-column ingest must agree")
  }
}
