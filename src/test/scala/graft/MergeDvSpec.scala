package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.VersionedTable

/** Deletion-vector-aware MERGE (merge-on-read): visible content
  * row-equal to the copy-on-write mergePruned, updates masking old
  * rows instead of rewriting whole groups, density-bounded fallback
  * to rewrite, and the optimize/restore/time-travel interplay over
  * merge-written vectors. */
class MergeDvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp() = java.nio.file.Files
    .createTempDirectory("mergedv").toString

  private def df(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toDF("k", "pay")
  }

  private def rows(p: String, v: Option[Long] = None): Set[(Long, Long)] =
    VersionedTable.read(spark, p, v).get
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def dataGroupCount(p: String): Int =
    Option(new java.io.File(p, "data").list()).map(_.length).getOrElse(0)

  /** Two key-clustered groups: [1,4] and [10,13]. */
  private def base(p: String): Long = {
    var v = VersionedTable.commit(spark, p,
      df(1L -> 10L, 2L -> 20L, 3L -> 30L, 4L -> 40L), 0L,
      statsCol = Some("k"))
    VersionedTable.commit(spark, p,
      df(10L -> 100L, 11L -> 110L, 12L -> 120L, 13L -> 130L), v,
      statsCol = Some("k"))
  }

  test("mergeDv is row-equal to mergePruned; the touched group is " +
      "MASKED (its data files untouched), the disjoint group carried, " +
      "the batch appended as one group") {
    val p1 = tmp(); val p2 = tmp()
    base(p1); base(p2)
    val updates = df(2L -> 21L, 5L -> 50L) // update k=2, insert k=5
    val groupsBefore = dataGroupCount(p1)
    val (_, masked, rewrote) =
      VersionedTable.mergeDv(spark, p1, updates, "k")
    VersionedTable.mergePruned(spark, p2, updates, "k")
    assert(rows(p1) == rows(p2), s"${rows(p1)} != ${rows(p2)}")
    assert(rows(p1) == Set((1L, 10L), (2L, 21L), (3L, 30L), (4L, 40L),
      (5L, 50L), (10L, 100L), (11L, 110L), (12L, 120L), (13L, 130L)))
    assert(masked == 1 && rewrote == 0, s"$masked/$rewrote")
    // +1 appended batch group, +1 sidecar — no group rewritten
    assert(dataGroupCount(p1) == groupsBefore + 2)
  }

  test("density fallback: a batch masking more than maxDvFraction of " +
      "a group's rows rewrites the group instead (vector dropped), " +
      "content unchanged vs the DV arm") {
    val p = tmp()
    base(p)
    val updates = df(1L -> 11L, 2L -> 21L, 3L -> 31L) // 3 of 4 rows
    val (_, masked, rewrote) =
      VersionedTable.mergeDv(spark, p, updates, "k",
        maxDvFraction = 0.5)
    assert(masked == 0 && rewrote == 1, s"$masked/$rewrote")
    assert(rows(p) == Set((1L, 11L), (2L, 21L), (3L, 31L), (4L, 40L),
      (10L, 100L), (11L, 110L), (12L, 120L), (13L, 130L)))
    // a batch covering EVERY row of the group drops the group entirely
    val p2 = tmp()
    base(p2)
    val (_, m2, r2) = VersionedTable.mergeDv(spark, p2,
      df(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L), "k",
      maxDvFraction = 0.5)
    assert(m2 == 0 && r2 == 1)
    assert(rows(p2) == Set((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L),
      (10L, 100L), (11L, 110L), (12L, 120L), (13L, 130L)))
  }

  test("repeated mergeDv: a re-update of a DV-masked key finds its " +
      "live row in the APPENDED group and masks it there; prior " +
      "vectors merge without duplicate entries") {
    val p = tmp()
    base(p)
    VersionedTable.mergeDv(spark, p, df(2L -> 21L), "k",
      maxDvFraction = 0.9)
    VersionedTable.mergeDv(spark, p, df(2L -> 22L, 3L -> 31L), "k",
      maxDvFraction = 0.9)
    assert(rows(p) == Set((1L, 10L), (2L, 22L), (3L, 31L), (4L, 40L),
      (10L, 100L), (11L, 110L), (12L, 120L), (13L, 130L)))
    // third pass over the same key: still exactly one visible row
    VersionedTable.mergeDv(spark, p, df(2L -> 23L), "k",
      maxDvFraction = 0.9)
    val got = VersionedTable.read(spark, p).get
      .filter(col("k") === 2L).collect()
    assert(got.length == 1 && got.head.getLong(1) == 23L)
  }

  test("interplay: time travel shows the pre-merge content; OPTIMIZE " +
      "clears the vectors keeping content; RESTORE to the pre-merge " +
      "version returns the old rows") {
    val p = tmp()
    val v0 = base(p)
    val pre = rows(p)
    VersionedTable.mergeDv(spark, p, df(2L -> 21L), "k",
      maxDvFraction = 0.9)
    val post = rows(p)
    assert(rows(p, Some(v0)) == pre, "time travel must pre-date the DV")
    VersionedTable.optimize(spark, p, statsCol = Some("k"))
    assert(rows(p) == post, "optimize must preserve DV-masked content")
    VersionedTable.restore(spark, p, v0)
    assert(rows(p) == pre)
  }

  test("degenerate batches: empty table = plain commit; insert-only " +
      "batch masks nothing; null-key rows append without masking") {
    val p = tmp()
    val (v1, m1, r1) = VersionedTable.mergeDv(spark, p,
      df(1L -> 10L), "k")
    assert(v1 == 1L && m1 == 0 && r1 == 0)
    val (_, m2, r2) = VersionedTable.mergeDv(spark, p,
      df(7L -> 70L), "k") // disjoint: stats prove no overlap
    assert(m2 == 0 && r2 == 0)
    assert(rows(p) == Set((1L, 10L), (7L, 70L)))
    import spark.implicits._
    val withNull = Seq((Some(8L), 80L), (None: Option[Long], 99L))
      .toDF("k", "pay")
    VersionedTable.mergeDv(spark, p, withNull, "k")
    val got = VersionedTable.read(spark, p).get.collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(1)))
      .toSet
    assert(got == Set((1L, 10L), (7L, 70L), (8L, 80L), (-1L, 99L)))
  }

  test("a lost race cleans every staged sidecar and batch group, " +
      "then rethrows (merge-on-read derives from its snapshot — no " +
      "silent republish)") {
    val p = tmp()
    base(p)
    val before = dataGroupCount(p)
    val alwaysLose: org.apache.hadoop.fs.FileSystem =>
        graft.sources.CommitArbiter = _ => (_, _, _) => false
    intercept[VersionedTable.CommitConflictException] {
      VersionedTable.mergeDv(spark, p, df(2L -> 21L), "k",
        maxDvFraction = 0.9, arbiterFor = alwaysLose)
    }
    assert(dataGroupCount(p) == before, "staged debris left behind")
    assert(rows(p).size == 8)
  }
}
