package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.VersionedTable

/** The commit-protocol contract: append/replace snapshots, version
  * time travel, MERGE upsert semantics, and the optimistic-
  * concurrency arbiter (exactly one racing writer wins).
  */
class VersionedTableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def tmp() = java.nio.file.Files
    .createTempDirectory("vtable").toString

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("k", "v")
  }

  private def snapshot(path: String, asOf: Option[Long] = None) =
    VersionedTable.read(spark, path, asOf).get
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("append commits accumulate; replace resets; time travel reads " +
      "any past version") {
    val p = tmp()
    assert(VersionedTable.read(spark, p).isEmpty)
    val v1 = VersionedTable.commit(spark, p, df(1L -> "a"), 0L)
    val v2 = VersionedTable.commit(spark, p, df(2L -> "b"), v1)
    assert(snapshot(p) == Map(1L -> "a", 2L -> "b"))
    val v3 = VersionedTable.commit(spark, p, df(9L -> "z"), v2,
      replace = true)
    assert(snapshot(p) == Map(9L -> "z"), "replace resets the live set")
    assert(snapshot(p, Some(v2)) == Map(1L -> "a", 2L -> "b"),
      "time travel sees the pre-replace snapshot")
    assert(snapshot(p, Some(v1)) == Map(1L -> "a"))
    assert(VersionedTable.currentVersion(spark, p) == v3)
  }

  test("MERGE upserts by key: matched rows replaced, unmatched " +
      "carried, new keys inserted") {
    val p = tmp()
    VersionedTable.commit(spark, p, df(1L -> "a", 2L -> "b"), 0L)
    VersionedTable.merge(spark, p, df(2L -> "B2", 3L -> "c"), "k")
    assert(snapshot(p) == Map(1L -> "a", 2L -> "B2", 3L -> "c"))
    // merge is itself a committed version: the pre-merge state is
    // still reachable
    assert(snapshot(p, Some(1L)) == Map(1L -> "a", 2L -> "b"))
  }

  test("optimistic concurrency: two writers racing on one expected " +
      "version -> exactly one commit wins, the loser must retry") {
    val p = tmp()
    val v1 = VersionedTable.commit(spark, p, df(1L -> "a"), 0L)
    // both writers observed v1 and try to commit v2
    VersionedTable.commit(spark, p, df(2L -> "winner"), v1)
    val conflict = intercept[VersionedTable.CommitConflictException] {
      VersionedTable.commit(spark, p, df(3L -> "loser"), v1)
    }
    assert(conflict.getMessage.contains("v2"))
    assert(snapshot(p) == Map(1L -> "a", 2L -> "winner"),
      "the losing writer's data must NOT appear")
    // the loser retries at the new head and succeeds
    VersionedTable.commit(spark, p, df(3L -> "retried"),
      VersionedTable.currentVersion(spark, p))
    assert(snapshot(p)(3L) == "retried")
  }
}
