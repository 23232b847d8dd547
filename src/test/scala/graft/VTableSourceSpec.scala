package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.VersionedTable

/** The `graft-vtable` standard-reader binding: short-name format
  * resolution, key-stats file pruning through the ordinary
  * DataFrame filter path, time travel via option, and the
  * flat-relation faithfulness gate. */
class VTableSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def tmp() = java.nio.file.Files
    .createTempDirectory("vsrc").toString

  private def build(): (String, Long) = {
    import spark.implicits._
    val p = tmp()
    var v = 0L
    (0 until 4).foreach { i =>
      v = VersionedTable.commit(spark, p,
        (0 until 5).map(j => (i * 10L + j, s"r$i$j")).toDF("k", "s"),
        v, statsCol = Some("k"))
    }
    (p, v)
  }

  test("spark.read.format(\"graft-vtable\") resolves by short name, " +
      "reads the snapshot, prunes files on a key filter, and time " +
      "travels via versionAsOf") {
    val (p, head) = build()
    val df = spark.read.format("graft-vtable").load(p)
    assert(df.count() == 20)
    val filtered = df.filter(col("k") >= 11L && col("k") <= 14L)
    assert(filtered.collect().map(_.getLong(0)).toSet ==
      Set(11L, 12L, 13L, 14L))
    def scanned(d: org.apache.spark.sql.DataFrame): Long = {
      d.collect()
      d.queryExecution.executedPlan.collectLeaves()
        .flatMap(_.metrics.get("numFiles")).map(_.value).sum
    }
    val total = scanned(spark.read.format("graft-vtable").load(p))
    val opened = scanned(spark.read.format("graft-vtable").load(p)
      .filter(col("k") >= 11L && col("k") <= 14L))
    assert(opened > 0 && opened < total, s"$opened/$total")
    // time travel: version 1 holds only the first group
    val v1 = spark.read.format("graft-vtable")
      .option("versionAsOf", "1").load(p)
    assert(v1.collect().map(_.getLong(0)).toSet ==
      (0L until 5L).toSet)
  }

  test("the faithfulness gate refuses non-flat snapshots with the " +
      "alternative API named; a missing path refuses too") {
    import spark.implicits._
    val (p, _) = build()
    VersionedTable.deleteKeys(spark, p, Seq(11L).toDF("k"), "k")
    val err = intercept[IllegalArgumentException] {
      spark.read.format("graft-vtable").load(p).collect()
    }
    assert(err.getMessage.contains("VersionedTable.read"),
      err.getMessage)
    intercept[Exception] {
      spark.read.format("graft-vtable").load().collect()
    }
  }
}
