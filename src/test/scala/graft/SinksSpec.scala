package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sinks

/** Write-layout checks: partition pruning on partitioned parquet,
  * shuffle-free joins on bucketed tables (SURVEY.md §2 S5 + §4). */
class SinksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

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
