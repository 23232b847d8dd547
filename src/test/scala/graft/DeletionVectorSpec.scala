package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.VersionedTable

/** Deletion vectors: point DELETE without rewriting data files —
  * per-group key sidecars, read-time anti-join, rewrite drops the
  * vector, upsert resurrects, history/maintenance interplay. */
class DeletionVectorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def tmp() = java.nio.file.Files
    .createTempDirectory("vdv").toString

  private def kdf(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toDF("k", "pay")
  }

  private def keysOf(ks: Long*) = {
    import spark.implicits._
    ks.toDF("k")
  }

  private def snap(p: String, asOf: Option[Long] = None) =
    VersionedTable.read(spark, p, asOf).get
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def dataGroupCount(p: String): Int =
    Option(new java.io.File(p, "data").list()).map(_.length).getOrElse(0)

  /** Build a 2-group clustered table: [1..4] and [100..103]. */
  private def build(p: String): Long = {
    val v1 = VersionedTable.commit(spark, p,
      kdf(1L -> 10, 2L -> 20, 3L -> 30, 4L -> 40), 0L,
      statsCol = Some("k"))
    VersionedTable.commit(spark, p,
      kdf(100L -> 1, 101L -> 2, 102L -> 3, 103L -> 4), v1,
      statsCol = Some("k"))
  }

  test("deleteKeys masks rows without touching data files; only " +
      "stats-overlapping groups gain a vector; time travel still " +
      "reads the pre-delete rows; re-delete is a no-op") {
    val p = tmp()
    val v2 = build(p)
    val before = dataGroupCount(p)
    val (v3, dvd) = VersionedTable.deleteKeys(spark, p, keysOf(2L, 3L), "k")
    assert(dvd == 1, "only the low-range group overlaps the keys")
    assert(dataGroupCount(p) == before + 1,
      "one key-list sidecar, zero data rewrites")
    assert(snap(p) == Map(1L -> 10L, 4L -> 40L, 100L -> 1L,
      101L -> 2L, 102L -> 3L, 103L -> 4L))
    assert(snap(p, Some(v2)) == Map(1L -> 10L, 2L -> 20L, 3L -> 30L,
      4L -> 40L, 100L -> 1L, 101L -> 2L, 102L -> 3L, 103L -> 4L),
      "the delete is a version, not an erasure")
    // deleting the same keys again finds no live rows -> no-op
    val (v4, dvd2) = VersionedTable.deleteKeys(spark, p, keysOf(2L), "k")
    assert(v4 == v3 && dvd2 == 0, "re-delete must publish nothing")
    // keys outside every group's stats: metadata-only no-op
    val (v5, dvd3) =
      VersionedTable.deleteKeys(spark, p, keysOf(50000L), "k")
    assert(v5 == v3 && dvd3 == 0)
  }

  test("vectors MERGE across deletes on one group; an upsert after a " +
      "delete resurrects the key (the rewrite reads masked and drops " +
      "the vector)") {
    val p = tmp()
    build(p)
    VersionedTable.deleteKeys(spark, p, keysOf(2L), "k")
    VersionedTable.deleteKeys(spark, p, keysOf(3L), "k")
    assert(snap(p) == Map(1L -> 10L, 4L -> 40L, 100L -> 1L,
      101L -> 2L, 102L -> 3L, 103L -> 4L),
      "second delete must keep the first delete's mask")
    // pruned upsert of deleted key 2: the touched group rewrites from
    // its MASKED rows, so 3 stays gone while 2 comes back
    val (_, rewrites) = VersionedTable.mergePruned(spark, p,
      kdf(2L -> 222), "k")
    assert(rewrites == 1)
    assert(snap(p) == Map(1L -> 10L, 2L -> 222L, 4L -> 40L,
      100L -> 1L, 101L -> 2L, 102L -> 3L, 103L -> 4L),
      "upsert resurrects its key; the other deleted key stays deleted")
  }

  test("OPTIMIZE materializes deletes (no vector survives in the head " +
      "entry); vacuum never reclaims a referenced vector") {
    val p = tmp()
    build(p)
    VersionedTable.deleteKeys(spark, p, keysOf(2L, 101L), "k")
    assert(VersionedTable.vacuum(spark, p, minAgeMs = 0).isEmpty,
      "vectors are referenced by the delete entry")
    assert(snap(p) == Map(1L -> 10L, 3L -> 30L, 4L -> 40L,
      100L -> 1L, 102L -> 3L, 103L -> 4L))
    VersionedTable.optimize(spark, p, statsCol = Some("k"))
    val head = VersionedTable.currentVersion(spark, p)
    val raw = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(p, "_log", f"v$head%08d.json")), "UTF-8")
    assert(raw.contains(""""dvs":[null]"""),
      "the compacted snapshot must carry no deletion vector:\n" + raw)
    assert(snap(p) == Map(1L -> 10L, 3L -> 30L, 4L -> 40L,
      100L -> 1L, 102L -> 3L, 103L -> 4L),
      "content identical through the materialization")
  }

  test("changeFeed sees a DV-only change on an otherwise shared " +
      "group: the delete rows emit even under shared-group skipping") {
    val p = tmp()
    val vFrom = build(p)
    val (vTo, _) = VersionedTable.deleteKeys(spark, p, keysOf(2L), "k")
    val feed = VersionedTable.changeFeed(spark, p, "k", vFrom, vTo)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2))).toSet
    assert(feed == Set((2L, 20L, "delete")),
      s"a new DV changes the group's visible rows: $feed")
    // and with skipping disabled the answer is identical
    val naive = VersionedTable.changeFeed(spark, p, "k", vFrom, vTo,
      skipShared = false)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2))).toSet
    assert(naive == feed)
  }

  test("clones inherit deletion vectors by absolute reference; a " +
      "post-clone delete on the source does not touch the clone") {
    val p = tmp()
    val c = tmp()
    build(p)
    VersionedTable.deleteKeys(spark, p, keysOf(2L), "k")
    VersionedTable.cloneShallow(spark, p, c)
    assert(snap(c) == Map(1L -> 10L, 3L -> 30L, 4L -> 40L,
      100L -> 1L, 101L -> 2L, 102L -> 3L, 103L -> 4L),
      "clone reads through the source's vector")
    VersionedTable.deleteKeys(spark, p, keysOf(3L), "k")
    assert(snap(c).contains(3L), "source deletes do not leak into " +
      "the already-cut clone")
    assert(!snap(p).contains(3L))
  }
}
