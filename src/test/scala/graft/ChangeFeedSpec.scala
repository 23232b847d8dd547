package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.VersionedTable

/** DELETE + CHANGE DATA FEED contract on the versioned table:
  * stats-pruned range delete (rewrite only overlapping groups,
  * metadata-only no-op when stats prove a miss, empty-rewrite groups
  * dropped) and the snapshot-diff change feed (insert/delete/
  * update pre+post images; shared-group skipping equal to the naive
  * full diff; unchanged rows emit nothing).
  */
class ChangeFeedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def tmp() = java.nio.file.Files
    .createTempDirectory("cdf").toString

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("k", "v")
  }

  private def snapshot(path: String) =
    VersionedTable.read(spark, path).get
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  /** Three key-clustered groups: [1,3], [10,12], [20,22]. */
  private def threeGroups(): (String, Long) = {
    val p = tmp()
    var v = 0L
    Seq(df(1L -> "a", 2L -> "b", 3L -> "c"),
      df(10L -> "j", 11L -> "k", 12L -> "l"),
      df(20L -> "t", 21L -> "u", 22L -> "w")).foreach { b =>
      v = VersionedTable.commit(spark, p, b, v, statsCol = Some("k"))
    }
    (p, v)
  }

  test("deleteRange rewrites only groups whose stats overlap; " +
      "disjoint groups are carried by reference") {
    val (p, _) = threeGroups()
    val namesBefore = new java.io.File(s"$p/data").list().toSet
    val (v, rewritten) = VersionedTable.deleteRange(spark, p, "k", 11L, 12L)
    assert(rewritten == 1, "only the middle group overlaps [11,12]")
    assert(v == 4)
    assert(snapshot(p) == Map(1L -> "a", 2L -> "b", 3L -> "c",
      10L -> "j", 20L -> "t", 21L -> "u", 22L -> "w"))
    // history keeps every original file; the rewrite adds exactly one
    val namesAfter = new java.io.File(s"$p/data").list().toSet
    assert((namesBefore -- namesAfter).isEmpty,
      "original groups survive (still referenced by past versions)")
    assert((namesAfter -- namesBefore).size == 1, "exactly one new group")
  }

  test("deleteRange with a stats-proven miss is a metadata-only " +
      "no-op: no new version, zero rewrites") {
    val (p, v0) = threeGroups()
    val (v, rewritten) = VersionedTable.deleteRange(spark, p, "k", 50L, 60L)
    assert(rewritten == 0)
    assert(v == v0, "no commit published for a no-op delete")
    assert(VersionedTable.currentVersion(spark, p) == v0)
  }

  test("deleteRange that empties the rewrite drops the group instead " +
      "of committing a zero-row file") {
    val p = tmp()
    val v1 = VersionedTable.commit(spark, p, df(1L -> "a", 2L -> "b"), 0L,
      statsCol = Some("k"))
    VersionedTable.commit(spark, p, df(10L -> "j", 11L -> "k"), v1,
      statsCol = Some("k"))
    val dirsBefore = new java.io.File(s"$p/data").list().toSet
    // [1,2] covers ALL of group 1 -> the rewrite is empty -> dropped
    val (v, rewritten) = VersionedTable.deleteRange(spark, p, "k", 1L, 2L)
    assert(rewritten == 1 && v == 3)
    assert(snapshot(p) == Map(10L -> "j", 11L -> "k"))
    // the empty staged dir was deleted; the ORIGINAL group 1 files
    // stay (still referenced by v1/v2 -> time travel intact)
    assert(new java.io.File(s"$p/data").list().toSet == dirsBefore)
    assert(VersionedTable.read(spark, p, Some(v1)).get.count() == 2)
  }

  test("deleteRange never deletes null-key rows (a range names " +
      "values; NULL is not a value)") {
    val p = tmp()
    import spark.implicits._
    val withNull = Seq((java.lang.Long.valueOf(5L), "e"),
      (null.asInstanceOf[java.lang.Long], "n")).toDF("k", "v")
    VersionedTable.commit(spark, p, withNull, 0L, statsCol = Some("k"))
    // no stats on the null row's group? stats exist ([5,5]) but the
    // group ALSO holds the null row; [0,9] forces its rewrite
    val (_, rewritten) = VersionedTable.deleteRange(spark, p, "k", 0L, 9L)
    assert(rewritten == 1)
    val rows = VersionedTable.read(spark, p).get.collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getString(1))).toSet
    assert(rows == Set((None, "n")), "5 deleted, the null-key row kept")
  }

  test("changeFeed emits insert/delete/update pre+post images; " +
      "unchanged rows emit nothing; shared-group skip equals the " +
      "naive full diff") {
    val (p, vFrom) = threeGroups()
    // update k=2 (group 1 rewritten), insert k=4, leave groups 2,3
    // untouched -> shared between the versions
    VersionedTable.mergePruned(spark, p, df(2L -> "B2", 4L -> "d"), "k")
    val (vTo, _) = VersionedTable.deleteRange(spark, p, "k", 21L, 21L)
    def feed(skip: Boolean) =
      VersionedTable.changeFeed(spark, p, "k", vFrom, vTo, skipShared = skip)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .toSet
    val expected = Set(
      (2L, "b", "update_preimage"), (2L, "B2", "update_postimage"),
      (4L, "d", "insert"),
      (21L, "u", "delete"))
    assert(feed(skip = true) == expected)
    assert(feed(skip = false) == expected,
      "file skipping must not change the feed")
    // self-diff is empty
    assert(VersionedTable.changeFeed(spark, p, "k", vTo, vTo).isEmpty)
    // the skip is REAL: destroy the shared groups' files — the
    // skipping feed still computes, the naive one cannot even plan
    // exactly one group is live in BOTH versions: the untouched
    // middle group {10,11,12}
    val live = new java.io.File(s"$p/data").listFiles()
    val sharedDirs = live.filter { dir =>
      val keys = spark.read.parquet(dir.toString)
        .select("k").collect().map(_.getLong(0)).toSet
      keys == Set(10L, 11L, 12L)
    }
    assert(sharedDirs.length == 1)
    sharedDirs.foreach { d =>
      d.listFiles().foreach(_.delete()); d.delete()
    }
    assert(feed(skip = true) == expected,
      "skipped groups are never opened")
    intercept[Exception] { feed(skip = false) }
  }

  test("changeFeed from an empty-side version: everything is an " +
      "insert going forward, a delete going backward") {
    val p = tmp()
    val v1 = VersionedTable.commit(spark, p, df(7L -> "g"), 0L)
    val fwd = VersionedTable.changeFeed(spark, p, "k", 0L, v1).collect()
    assert(fwd.map(r => (r.getLong(0), r.getString(2))).toSet ==
      Set(7L -> "insert"))
    val bwd = VersionedTable.changeFeed(spark, p, "k", v1, 0L).collect()
    assert(bwd.map(r => (r.getLong(0), r.getString(2))).toSet ==
      Set(7L -> "delete"))
  }

  test("changeFeed is null-safe on the key: an unchanged null-key " +
      "row emits NOTHING (not a spurious delete+insert pair), and " +
      "skip on/off agree") {
    val p = tmp()
    import spark.implicits._
    val withNull = Seq((java.lang.Long.valueOf(5L), "e"),
      (null.asInstanceOf[java.lang.Long], "n")).toDF("k", "v")
    val v1 = VersionedTable.commit(spark, p, withNull, 0L,
      statsCol = Some("k"))
    // deleteRange keeps the null row, drops 5 -> the null row is
    // UNCHANGED between v1 and v2 but lives in a REWRITTEN group
    val (v2, _) = VersionedTable.deleteRange(spark, p, "k", 5L, 5L)
    def feed(skip: Boolean) =
      VersionedTable.changeFeed(spark, p, "k", v1, v2, skipShared = skip)
        .collect()
        .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
          r.getString(1), r.getString(2))).toSet
    val expected = Set((Some(5L), "e", "delete"))
    assert(feed(skip = true) == expected,
      "the untouched null-key row must not appear in the feed")
    assert(feed(skip = false) == expected)
  }

  test("changeFeed on a MIXED-SCHEMA table: changes confined to a " +
      "wider-generation column are emitted (payload reconciled " +
      "across generations, not probed from one group), and skip " +
      "on/off agree in rows AND schema") {
    import spark.implicits._
    val p = tmp()
    val v1 = VersionedTable.commit(spark, p, df(1L -> "a", 2L -> "b"), 0L,
      statsCol = Some("k"))
    val wide = Seq((10L, "j", 100), (11L, "l", 110))
      .toDF("k", "v", "extra")
    val v2 = VersionedTable.commit(spark, p, wide, v1,
      statsCol = Some("k"), allowEvolution = true)
    // change ONLY the wide column on one wide key; narrow group
    // untouched (shared -> skipped)
    VersionedTable.mergePruned(spark, p,
      Seq((11L, "l", 999)).toDF("k", "v", "extra"), "k")
    val vTo = VersionedTable.currentVersion(spark, p)
    def feed(skip: Boolean) =
      VersionedTable.changeFeed(spark, p, "k", v2, vTo, skipShared = skip)
    val expect = Set(
      (11L, "l", Some(110), "update_preimage"),
      (11L, "l", Some(999), "update_postimage"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        r.getString(3))).toSet
    assert(feed(skip = true).columns.toSeq ==
      Seq("k", "v", "extra", "change_type"))
    assert(rows(feed(skip = true)) == expect,
      "the extra-only change must not vanish")
    assert(feed(skip = false).columns.toSeq ==
      feed(skip = true).columns.toSeq, "schema equal across skip arms")
    assert(rows(feed(skip = false)) == expect)
    // and the cross-generation diff (v1 -> v2): the wide rows are
    // inserts whose narrow-side struct carries a typed NULL extra
    val crossGen = rows(VersionedTable.changeFeed(spark, p, "k", v1, v2))
    assert(crossGen == Set((10L, "j", Some(100), "insert"),
      (11L, "l", Some(110), "insert")))
  }

  test("changeFeed upsert writing an IDENTICAL value emits no " +
      "update pair (value-diff, not write-log, semantics)") {
    val p = tmp()
    val v1 = VersionedTable.commit(spark, p, df(1L -> "a", 2L -> "b"), 0L)
    VersionedTable.merge(spark, p, df(1L -> "a", 3L -> "c"), "k")
    val f = VersionedTable.changeFeed(spark, p, "k", v1, 2L).collect()
      .map(r => (r.getLong(0), r.getString(2))).toSet
    assert(f == Set(3L -> "insert"), "k=1 rewrote the same value: silent")
  }
}
