package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.VersionedTable
import graft.streaming.CdfTail

/** The checkpointed change-feed tail: offset persistence across a
  * reader restart, at-least-once replay upgraded to exactly-once
  * state by the idempotent apply, bounded catch-up batches,
  * subscribe-from-head, and single-owner commit fencing. */
class StreamingCdfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp() = java.nio.file.Files
    .createTempDirectory("cdftail").toString

  private def df(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toDF("k", "pay")
  }

  /** A 5-version table: three appends, a merge, a ranged delete. */
  private def fixture(): (String, Long) = {
    val p = tmp()
    var v = 0L
    v = VersionedTable.commit(spark, p, df(1L -> 10L, 2L -> 20L), v,
      statsCol = Some("k"))
    v = VersionedTable.commit(spark, p, df(3L -> 30L, 4L -> 40L), v,
      statsCol = Some("k"))
    v = VersionedTable.commit(spark, p, df(5L -> 50L), v,
      statsCol = Some("k"))
    v = VersionedTable.merge(spark, p, df(2L -> 21L, 6L -> 60L), "k")
    val (v5, _) = VersionedTable.deleteRange(spark, p, "k", 4L, 4L)
    (p, v5)
  }

  private def drain(p: String, ckpt: String,
      perBatch: Int): (Set[(Long, Long)], Int) = {
    var state = VersionedTable.read(spark, p).get.limit(0)
    var batches = 0
    var b = CdfTail.next(spark, p, "k", ckpt,
      maxVersionsPerBatch = perBatch)
    while (b.isDefined) {
      state = CdfTail.applyFeed(state, b.get.feed, "k")
      CdfTail.commit(spark, ckpt, b.get)
      batches += 1
      b = CdfTail.next(spark, p, "k", ckpt,
        maxVersionsPerBatch = perBatch)
    }
    (state.collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
      batches)
  }

  test("tail from version 0 in bounded batches: applied state equals " +
      "the head read; batch count is ceil(versions / maxPerBatch); " +
      "a caught-up tail returns None") {
    val (p, head) = fixture()
    val ckpt = tmp()
    val (got, batches) = drain(p, ckpt, perBatch = 2)
    val want = VersionedTable.read(spark, p).get
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"state $got != head $want")
    assert(batches == 3, s"5 versions / 2 per batch = 3 batches: $batches")
    assert(CdfTail.next(spark, p, "k", ckpt).isEmpty)
    assert(CdfTail.committedOffset(spark, ckpt) == head)
  }

  test("offset survives a reader restart mid-log: a NEW tail over the " +
      "same checkpoint resumes exactly where the old one committed") {
    val (p, head) = fixture()
    val ckpt = tmp()
    // old reader: one batch, committed, then "process exits"
    val b1 = CdfTail.next(spark, p, "k", ckpt,
      maxVersionsPerBatch = 2).get
    var state = VersionedTable.read(spark, p).get.limit(0)
    state = CdfTail.applyFeed(state, b1.feed, "k")
    CdfTail.commit(spark, ckpt, b1)
    // new reader, same checkpoint dir: must resume at v2, not v0
    val b2 = CdfTail.next(spark, p, "k", ckpt,
      maxVersionsPerBatch = 100).get
    assert(b2.fromVersion == b1.toVersion && b2.toVersion == head)
    state = CdfTail.applyFeed(state, b2.feed, "k")
    CdfTail.commit(spark, ckpt, b2)
    val want = VersionedTable.read(spark, p).get
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(state.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == want)
  }

  test("crash between apply and commit: the replayed batch re-applies " +
      "as a no-op (idempotent apply = exactly-once state)") {
    val (p, _) = fixture()
    val ckpt = tmp()
    var state = VersionedTable.read(spark, p).get.limit(0)
    val b1 = CdfTail.next(spark, p, "k", ckpt,
      maxVersionsPerBatch = 3).get
    state = CdfTail.applyFeed(state, b1.feed, "k")
    // CRASH: no commit. The next read re-emits the same window.
    val b1r = CdfTail.next(spark, p, "k", ckpt,
      maxVersionsPerBatch = 3).get
    assert(b1r.fromVersion == b1.fromVersion &&
      b1r.toVersion == b1.toVersion)
    val once = state.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    state = CdfTail.applyFeed(state, b1r.feed, "k")
    assert(state.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == once, "re-apply must be a no-op")
    CdfTail.commit(spark, ckpt, b1r)
    // drain the rest and land on the head
    val b2 = CdfTail.next(spark, p, "k", ckpt).get
    state = CdfTail.applyFeed(state, b2.feed, "k")
    CdfTail.commit(spark, ckpt, b2)
    val want = VersionedTable.read(spark, p).get
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(state.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == want)
  }

  test("subscribe from the current head: a tail opened at " +
      "startVersion = head sees only FUTURE commits") {
    val (p, head) = fixture()
    val ckpt = tmp()
    assert(CdfTail.next(spark, p, "k", ckpt,
      startVersion = head).isEmpty, "nothing to deliver at the head")
    VersionedTable.commit(spark, p, df(7L -> 70L),
      VersionedTable.currentVersion(spark, p), statsCol = Some("k"))
    val b = CdfTail.next(spark, p, "k", ckpt, startVersion = head).get
    assert(b.fromVersion == head)
    val rows = b.feed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(rows == Set((7L, 70L, "insert")), s"got $rows")
  }

  test("applyToTable maintains a versioned REPLICA through mergeDv + " +
      "deleteKeys; a replayed batch leaves visible content unchanged " +
      "(versions grow, rows do not)") {
    val (p, _) = fixture()
    val ckpt = tmp()
    val replica = tmp() + "/replica"
    var last: CdfTail.Batch = null
    var b = CdfTail.next(spark, p, "k", ckpt, maxVersionsPerBatch = 2)
    while (b.isDefined) {
      CdfTail.applyToTable(spark, b.get, replica, "k")
      CdfTail.commit(spark, ckpt, b.get)
      last = b.get
      b = CdfTail.next(spark, p, "k", ckpt, maxVersionsPerBatch = 2)
    }
    def content(path: String): Set[(Long, Long)] =
      VersionedTable.read(spark, path).get
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(content(replica) == content(p),
      "replica must equal the source head")
    // replay the final batch (crash-between-apply-and-commit form):
    // content unchanged, only the version count moves
    val before = content(replica)
    CdfTail.applyToTable(spark, last, replica, "k")
    assert(content(replica) == before,
      "replayed batch must be content-idempotent on the replica")
  }

  test("offset publish is crash-safe: a commit interrupted between " +
      "create and cleanup leaves two offset files and the MAX wins; " +
      "a clean commit leaves exactly one") {
    val (p, _) = fixture()
    val ckpt = tmp()
    val b1 = CdfTail.next(spark, p, "k", ckpt,
      maxVersionsPerBatch = 2).get
    CdfTail.commit(spark, ckpt, b1)
    // clean commit: exactly one offset file
    def offsetFiles() = new java.io.File(ckpt).list()
      .filter(_.startsWith("offset-v")).sorted.toSeq
    assert(offsetFiles().size == 1, offsetFiles())
    // simulate the crash window: an older offset file survives next
    // to the committed one (cleanup never ran)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(ckpt, "offset-v00000001.json"),
      """{"version":1}""".getBytes("UTF-8"))
    assert(CdfTail.committedOffset(spark, ckpt) == b1.toVersion,
      "max offset must win over stale crash debris")
    // the next commit cleans the debris
    val b2 = CdfTail.next(spark, p, "k", ckpt).get
    assert(b2.fromVersion == b1.toVersion)
    CdfTail.commit(spark, ckpt, b2)
    assert(offsetFiles().size == 1, offsetFiles())
  }

  test("retention fence: a tail whose offset fell behind " +
      "expireVersions' horizon is refused LOUDLY (a silent resume " +
      "would re-insert everything and miss interim deletes); a tail " +
      "at or past the horizon keeps working") {
    val (p, head) = fixture()
    val ckpt = tmp()
    val b1 = CdfTail.next(spark, p, "k", ckpt,
      maxVersionsPerBatch = 1).get // offset -> v1
    CdfTail.commit(spark, ckpt, b1)
    // drop everything below v4 (keepLast = 1 on a 5-version table)
    VersionedTable.expireVersions(spark, p, keepLast = 1)
    val horizon = VersionedTable.earliestResolvable(spark, p)
    assert(horizon == head - 1, s"horizon $horizon")
    val err = intercept[IllegalArgumentException] {
      CdfTail.next(spark, p, "k", ckpt)
    }
    assert(err.getMessage.contains("fell behind retention"),
      err.getMessage)
    // a fresh tail subscribed at the horizon still works
    val ckpt2 = tmp()
    val b = CdfTail.next(spark, p, "k", ckpt2, startVersion = horizon).get
    assert(b.fromVersion == horizon && b.toVersion == head)
  }

  test("upsertBatch: keyed streaming upserts through mergeDv — a " +
      "retried batchId commits nothing, later batches override " +
      "earlier values per key, a fresh batchId after a no-op retry " +
      "still lands") {
    import graft.streaming.VersionedSink
    val p = tmp() + "/t"
    val v0 = VersionedSink.upsertBatch(spark, p,
      df(1L -> 10L, 2L -> 20L), 0L, "k")
    assert(v0 == 1L)
    val v1 = VersionedSink.upsertBatch(spark, p,
      df(2L -> 21L, 3L -> 30L), 1L, "k")
    assert(v1 == 2L)
    // recovery retry of batch 1: same version back, nothing committed
    assert(VersionedSink.upsertBatch(spark, p,
      df(2L -> 21L, 3L -> 30L), 1L, "k") == v1)
    assert(VersionedTable.currentVersion(spark, p) == v1)
    val v2 = VersionedSink.upsertBatch(spark, p,
      df(3L -> 31L), 2L, "k")
    assert(v2 == 3L)
    val got = VersionedTable.read(spark, p).get
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 21L), (3L, 31L)))
  }

  test("stale commit is refused: a second consumer (or an out-of-" +
      "order replay) cannot move the offset backwards or over a gap") {
    val (p, _) = fixture()
    val ckpt = tmp()
    val b1 = CdfTail.next(spark, p, "k", ckpt,
      maxVersionsPerBatch = 2).get
    CdfTail.commit(spark, ckpt, b1)
    // replaying the already-committed batch must refuse
    intercept[IllegalArgumentException] {
      CdfTail.commit(spark, ckpt, b1)
    }
  }
}
