package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** The one primitive the whole [[VersionedTable]] commit protocol
  * rests on: an atomic create-if-absent publish of a fully-written
  * log entry. Extracted behind a trait (round-12 verdict item 7) so
  * the per-store atomicity story is a tested seam instead of prose:
  *
  *  - local POSIX paths → [[CommitArbiter.HardLink]] (`link(2)` is
  *    atomic-exclusive at the syscall level; Hadoop's local
  *    `create(overwrite=false)` is a non-atomic exists-then-create);
  *  - HDFS-like stores → [[CommitArbiter.AtomicCreate]] (the create
  *    is namenode-atomic);
  *  - object stores → implement this trait over the store's
  *    conditional put (S3 `If-None-Match: *`, GCS
  *    `ifGenerationMatch=0`, ABFS `If-None-Match` etag precondition).
  *    The call shape is identical: payload fully materialized before
  *    the publish, `false` iff the precondition lost the race. No
  *    S3-style client ships in this environment, so that binding
  *    stays a documented hook — swapping it in is this one method.
  */
trait CommitArbiter {
  /** Publish `payload` at `entry` iff `entry` is absent. Returns
    * false on a lost race (the entry already exists); rethrows
    * non-conflict IO failures unchanged so a disk-full/permission
    * error is never misreported as a commit conflict. */
  def publish(f: FileSystem, entry: Path, payload: Array[Byte]): Boolean
}

object CommitArbiter {

  /** POSIX publish via hard link: write the payload to a sibling temp
    * file, then `link(2)` it to the final name — content is complete
    * before the name exists, and the link either creates the name or
    * fails with EEXIST atomically. */
  object HardLink extends CommitArbiter {
    def publish(f: FileSystem, entry: Path,
        payload: Array[Byte]): Boolean = {
      import java.nio.file.{FileAlreadyExistsException, Files, Paths}
      val dst = Paths.get(entry.toUri.getPath)
      val tmp = dst.resolveSibling(
        s".tmp-${java.util.UUID.randomUUID()}-${entry.getName}")
      // the write sits INSIDE the try owning the tmp cleanup, so a
      // failed/interrupted write never strands .tmp debris (a process
      // CRASH between write and link can — the dot prefix keeps log
      // listings blind to it, and the next commit uses a fresh uuid)
      try {
        Files.write(tmp, payload)
        try { Files.createLink(dst, tmp); true }
        catch { case _: FileAlreadyExistsException => false }
      } finally Files.deleteIfExists(tmp)
    }
  }

  /** `create(overwrite = false)` publish — atomic where the store's
    * create is (HDFS namenode; NOT Hadoop's LocalFileSystem). */
  object AtomicCreate extends CommitArbiter {
    def publish(f: FileSystem, entry: Path,
        payload: Array[Byte]): Boolean = {
      val out = try f.create(entry, false) catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
          return false
        case _: java.io.IOException if f.exists(entry) => return false
      }
      // a payload-write failure after the create succeeded must not
      // strand a partial/empty entry: it would make every RETRY of
      // this version misreport as a lost race (the exists-check above)
      // and brick log reads on the truncated JSON — best-effort delete
      // before rethrowing the real cause
      try { try out.write(payload) finally out.close() }
      catch {
        case e: Throwable =>
          try f.delete(entry, false)
          catch { case _: Exception => () }
          throw e
      }
      true
    }
  }

  /** Default binding by filesystem scheme. Object-store filesystems
    * (s3a & co) fall through to AtomicCreate, whose create-then-check
    * shape is only as atomic as the store makes it — bind a
    * conditional-put arbiter there (see the trait doc). */
  def forFs(f: FileSystem): CommitArbiter = f match {
    case _: org.apache.hadoop.fs.LocalFileSystem |
         _: org.apache.hadoop.fs.RawLocalFileSystem => HardLink
    case _ => AtomicCreate
  }
}
