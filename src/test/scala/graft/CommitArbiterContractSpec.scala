package graft

import java.io.{ByteArrayOutputStream, FileNotFoundException, IOException,
  OutputStream}
import java.net.URI
import java.util.concurrent.ConcurrentHashMap

import graft.sources.{CommitArbiter, VersionedTable}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, FileStatus,
  FileSystem, FSDataInputStream, FSDataOutputStream, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable
import org.scalatest.funsuite.AnyFunSuite

/** In-memory object store with S3-family conditional-put semantics
  * (round-13 verdict item 1): `putIfAbsent` is atomic AND
  * all-or-nothing (a failed upload materializes NOTHING — object
  * puts have no partial visibility), while the separate `exists`/
  * `put` pair is the NON-atomic exists-then-create shape a Hadoop
  * object-store connector's create(overwrite=false) actually runs —
  * kept here so the suite can demonstrate the lost update that shape
  * permits. */
final class InMemoryObjectStore extends CommitArbiter.ObjectStore {
  val objects = new ConcurrentHashMap[String, Array[Byte]]()
  @volatile var failNextPut = false

  def putIfAbsent(key: String, payload: Array[Byte]): Boolean = {
    if (failNextPut) {
      failNextPut = false
      throw new IOException(
        "injected: transport failure mid-upload (no object materializes)")
    }
    objects.putIfAbsent(key, payload) == null
  }

  // the non-atomic connector shape (exists-then-create) — NOT part of
  // the ObjectStore contract, present to demonstrate its hazard
  def exists(key: String): Boolean = objects.containsKey(key)
  def put(key: String, payload: Array[Byte]): Unit =
    objects.put(key, payload)
  def list(prefix: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    objects.keySet().asScala.toSeq.filter(_.startsWith(prefix)).sorted
  }
}

/** In-memory Hadoop FileSystem whose create(overwrite = false) is
  * NAMENODE-ATOMIC (one map putIfAbsent) — the HDFS semantics
  * [[CommitArbiter.AtomicCreate]] is correct on — with one-shot
  * write-failure injection and a constructor-chosen scheme so
  * forFs's scheme-based refusal is testable without a real
  * connector. Flat namespace: directories are implicit prefixes. */
final class InMemoryAtomicFs(scheme: String) extends FileSystem {
  setConf(new Configuration(false))
  private val files = new ConcurrentHashMap[String, ByteArrayOutputStream]()
  @volatile var failNextWrite = false
  private var wd = new Path("/")

  private def key(p: Path): String =
    Path.getPathWithoutSchemeAndAuthority(p).toString
  def contents(p: Path): Array[Byte] =
    Option(files.get(key(p))).map(_.toByteArray).orNull

  override def getUri: URI = URI.create(s"$scheme:///")
  override def getScheme: String = scheme
  override def open(p: Path, bufferSize: Int): FSDataInputStream =
    throw new UnsupportedOperationException("read via contents()")
  override def create(p: Path, permission: FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long, progress: Progressable): FSDataOutputStream = {
    val buf = new ByteArrayOutputStream()
    if (overwrite) files.put(key(p), buf)
    else if (files.putIfAbsent(key(p), buf) != null)
      throw new FileAlreadyExistsException(s"$p already exists")
    val out = new OutputStream {
      override def write(b: Int): Unit = write(Array(b.toByte), 0, 1)
      override def write(b: Array[Byte], off: Int, len: Int): Unit = {
        if (failNextWrite) {
          failNextWrite = false
          throw new IOException("injected write failure")
        }
        buf.synchronized(buf.write(b, off, len))
      }
    }
    new FSDataOutputStream(out, null)
  }
  override def append(p: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("append")
  override def rename(src: Path, dst: Path): Boolean = {
    val v = files.remove(key(src))
    if (v == null) false else { files.put(key(dst), v); true }
  }
  override def delete(p: Path, recursive: Boolean): Boolean =
    files.remove(key(p)) != null
  override def listStatus(p: Path): Array[FileStatus] = {
    import scala.jdk.CollectionConverters._
    val prefix = key(p).stripSuffix("/") + "/"
    files.entrySet().asScala.toArray
      .filter(e => e.getKey.startsWith(prefix) &&
        !e.getKey.stripPrefix(prefix).contains("/"))
      .map(e => new FileStatus(e.getValue.size().toLong, false, 1, 4096,
        0L, new Path(e.getKey)))
  }
  override def setWorkingDirectory(p: Path): Unit = wd = p
  override def getWorkingDirectory: Path = wd
  override def mkdirs(p: Path, permission: FsPermission): Boolean = true
  override def getFileStatus(p: Path): FileStatus = {
    val k = key(p)
    val f = files.get(k)
    if (f != null)
      new FileStatus(f.size().toLong, false, 1, 4096, 0L, p)
    else {
      import scala.jdk.CollectionConverters._
      if (files.keySet().asScala.exists(_.startsWith(k.stripSuffix("/") + "/")))
        new FileStatus(0L, true, 1, 4096, 0L, p)
      else throw new FileNotFoundException(p.toString)
    }
  }
}

/** SHARED contract suite over all three [[CommitArbiter]] bindings
  * (round-13 verdict item 1): HardLink on the real local filesystem,
  * AtomicCreate on the mock-HDFS above, ConditionalPut on the mock
  * object store. Each binding must satisfy the same four clauses:
  * publish round-trips content; a pre-existing entry is a clean lost
  * race (false, original intact); N barrier-raced threads produce
  * EXACTLY one winner with the winner's payload intact; an injected
  * write failure THROWS (never reports false) and strands no entry,
  * so the retry wins cleanly. */
class CommitArbiterContractSpec extends AnyFunSuite {

  /** One arbiter binding under contract. `armFailure`/`heal` set up
    * and clear that binding's injected publish failure for `entry`. */
  private case class Fixture(name: String, fs: FileSystem,
      arbiter: CommitArbiter, freshEntry: () => Path,
      exists: Path => Boolean, read: Path => Array[Byte],
      armFailure: Path => Unit, heal: Path => Unit)

  private def localFixture(): Fixture = {
    val root = new java.io.File(TestSpark.fixtures,
      s"arb_hl_${java.util.UUID.randomUUID()}")
    val fs = new Path(root.getAbsolutePath)
      .getFileSystem(new Configuration())
    Fixture(
      name = "HardLink/local",
      fs = fs,
      arbiter = CommitArbiter.HardLink,
      freshEntry = () => {
        val d = new java.io.File(root, java.util.UUID.randomUUID().toString)
        d.mkdirs()
        new Path(new java.io.File(d, "v00000001.json").getAbsolutePath)
      },
      exists = p => new java.io.File(p.toUri.getPath).exists(),
      read = p => java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p.toUri.getPath)),
      // write failure: the entry's parent vanishes mid-protocol — the
      // temp-file write throws before any link is attempted
      armFailure = p => {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(new java.io.File(p.getParent.toUri.getPath))
      },
      heal = p => new java.io.File(p.getParent.toUri.getPath).mkdirs())
  }

  private def mockHdfsFixture(): Fixture = {
    val fs = new InMemoryAtomicFs("mockhdfs")
    Fixture(
      name = "AtomicCreate/mock-HDFS",
      fs = fs,
      arbiter = CommitArbiter.AtomicCreate,
      freshEntry = () => new Path(
        s"/log/${java.util.UUID.randomUUID()}/v00000001.json"),
      exists = p => fs.contents(p) != null,
      read = p => fs.contents(p),
      armFailure = _ => fs.failNextWrite = true,
      heal = _ => fs.failNextWrite = false)
  }

  private def condPutFixture(): (Fixture, InMemoryObjectStore) = {
    val store = new InMemoryObjectStore
    val fs = new InMemoryAtomicFs("s3a") // carrier only; arbiter ignores it
    val fx = Fixture(
      name = "ConditionalPut/mock-object-store",
      fs = fs,
      arbiter = new CommitArbiter.ConditionalPut(store),
      freshEntry = () => new Path(
        s"/bucket/${java.util.UUID.randomUUID()}/_log/v00000001.json"),
      exists = p => store.exists(p.toUri.getPath),
      read = p => store.objects.get(p.toUri.getPath),
      armFailure = _ => store.failNextPut = true,
      heal = _ => store.failNextPut = false)
    (fx, store)
  }

  private def fixtures: Seq[Fixture] =
    Seq(localFixture(), mockHdfsFixture(), condPutFixture()._1)

  for (fx <- fixtures) {

    test(s"${fx.name}: publish round-trips content") {
      val e = fx.freshEntry()
      val payload = s"""{"version":1,"who":"${fx.name}"}""".getBytes("UTF-8")
      assert(fx.arbiter.publish(fx.fs, e, payload))
      assert(fx.exists(e))
      assert(fx.read(e).toSeq == payload.toSeq)
    }

    test(s"${fx.name}: pre-existing entry is a clean lost race " +
        "(false, original content intact)") {
      val e = fx.freshEntry()
      val first = """{"version":1,"w":"A"}""".getBytes("UTF-8")
      val second = """{"version":1,"w":"B-longer-payload"}""".getBytes("UTF-8")
      assert(fx.arbiter.publish(fx.fs, e, first))
      assert(!fx.arbiter.publish(fx.fs, e, second))
      assert(fx.read(e).toSeq == first.toSeq,
        "losing publish must never touch the winner's entry")
    }

    test(s"${fx.name}: 16 barrier-raced threads -> exactly one winner, " +
        "entry holds the winner's payload complete") {
      val e = fx.freshEntry()
      val n = 16
      val barrier = new java.util.concurrent.CyclicBarrier(n)
      val wins = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      def payload(i: Int): Array[Byte] =
        s"""{"version":1,"writer":$i,"pad":"${"x" * 512}"}"""
          .getBytes("UTF-8")
      val threads = (0 until n).map { i =>
        new Thread(() => {
          val mine = payload(i)
          barrier.await()
          try { if (fx.arbiter.publish(fx.fs, e, mine)) wins.add(i) }
          catch { case t: Throwable => errs.add(t) }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      import scala.jdk.CollectionConverters._
      assert(errs.isEmpty, s"unexpected errors: ${errs.asScala.toSeq}")
      assert(wins.size() == 1,
        s"exactly one writer must win, got ${wins.asScala.toSeq.sorted}")
      assert(fx.read(e).toSeq == payload(wins.peek()).toSeq,
        "entry must be the winner's payload, complete and untruncated")
    }

    test(s"${fx.name}: injected write failure THROWS (never a false " +
        "lost-race), strands no entry, and the retry wins") {
      val e = fx.freshEntry()
      val payload = """{"version":1,"w":"retry-me"}""".getBytes("UTF-8")
      fx.armFailure(e)
      intercept[Exception] { fx.arbiter.publish(fx.fs, e, payload) }
      assert(!fx.exists(e),
        "a failed publish must not strand a partial/empty entry — it " +
          "would turn every retry into a phantom lost race")
      fx.heal(e)
      assert(fx.arbiter.publish(fx.fs, e, payload),
        "retry after a cleaned-up failure must win")
      assert(fx.read(e).toSeq == payload.toSeq)
    }
  }

  // ---- what the refusal protects against, demonstrated -------------

  test("the exists-then-create shape a connector runs over an object " +
      "store loses updates under interleaving (why forFs refuses s3a)") {
    val store = new InMemoryObjectStore
    val k = "/bucket/_log/v00000002.json"
    val a = """{"version":2,"writer":"A"}""".getBytes("UTF-8")
    val b = """{"version":2,"writer":"B"}""".getBytes("UTF-8")
    // the deterministic interleaving: both writers pass the exists
    // check before either puts — both "win", B's entry is silently
    // TRUNCATED-REPLACED by A's. The conditional put forbids this by
    // construction (second putIfAbsent returns false).
    val aSawAbsent = !store.exists(k)
    val bSawAbsent = !store.exists(k)
    assert(aSawAbsent && bSawAbsent)
    store.put(k, b) // B "creates"
    store.put(k, a) // A "creates" too — lost update
    assert(store.objects.get(k).toSeq == a.toSeq,
      "demonstrated: two winners, last write silently replaced the first")
    // same interleaving through the conditional put: one winner
    val k2 = "/bucket/_log/v00000003.json"
    assert(store.putIfAbsent(k2, b))
    assert(!store.putIfAbsent(k2, a))
    assert(store.objects.get(k2).toSeq == b.toSeq)
  }

  test("forFs: local -> HardLink, unknown scheme -> AtomicCreate, " +
      "object-store schemes -> REFUSED naming ConditionalPut") {
    val local = new Path("/tmp").getFileSystem(new Configuration())
    assert(CommitArbiter.forFs(local) eq CommitArbiter.HardLink)
    assert(CommitArbiter.forFs(new InMemoryAtomicFs("mockhdfs")) eq
      CommitArbiter.AtomicCreate)
    for (scheme <- Seq("s3a", "s3", "gs", "abfss", "wasb")) {
      val ex = intercept[IllegalArgumentException] {
        CommitArbiter.forFs(new InMemoryAtomicFs(scheme))
      }
      assert(ex.getMessage.contains("ConditionalPut"),
        s"refusal for $scheme must point at the correct binding")
      assert(ex.getMessage.contains(scheme))
    }
  }

  // ---- the versioned-table race, re-run over the mock store --------

  /** ConditionalPut that write-throughs the winning payload to the
    * carrier filesystem — the test-side emulation of production,
    * where the SDK put and the s3a read path address the SAME
    * objects; here the log entry must also land where
    * [[VersionedTable]]'s reader lists. Losers never touch the
    * path, so the write-through inherits exactly-one-writer. */
  private final class WriteThrough(store: InMemoryObjectStore)
      extends CommitArbiter {
    private val inner = new CommitArbiter.ConditionalPut(store)
    def publish(f: FileSystem, entry: Path,
        payload: Array[Byte]): Boolean = {
      if (!inner.publish(f, entry, payload)) return false
      val out = f.create(entry, true)
      try out.write(payload) finally out.close()
      true
    }
  }

  test("VersionedTable threaded commit race arbitrated by the " +
      "ConditionalPut mock store: exactly one winner, losers " +
      "conflict, snapshot intact (round-13 verdict item 1)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val store = new InMemoryObjectStore
    val arb = new WriteThrough(store)
    val p = s"${TestSpark.fixtures}/arb_vt_${java.util.UUID.randomUUID()}"
    def df(kv: (Long, String)) = Seq(kv).toDF("k", "v")
    val v1 = VersionedTable.commit(spark, p, df(1L -> "base"), 0L,
      arbiterFor = _ => arb)
    val n = 8
    val barrier = new java.util.concurrent.CyclicBarrier(n)
    val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (0 until n).map { i =>
      new Thread(() => {
        val mine = df(100L + i -> s"w$i")
        barrier.await()
        try {
          VersionedTable.commit(spark, p, mine, v1, arbiterFor = _ => arb)
          outcomes.add(s"win:$i")
        } catch {
          case _: VersionedTable.CommitConflictException =>
            outcomes.add(s"lose:$i")
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    val (wins, losses) =
      outcomes.asScala.toSeq.partition(_.startsWith("win"))
    assert(wins.size == 1, s"exactly one winner, got $outcomes")
    assert(losses.size == n - 1)
    // the STORE agrees with the filesystem: one v2 object, and the
    // reader (listing the carrier fs) sees exactly versions 1..2
    assert(store.list(s"$p/_log/").size == 2)
    assert(VersionedTable.currentVersion(spark, p) == v1 + 1)
    val winner = wins.head.stripPrefix("win:").toInt
    val snap = VersionedTable.read(spark, p).get
      .as[(Long, String)].collect().toMap
    assert(snap == Map(1L -> "base", (100L + winner) -> s"w$winner"))
    // losers' staged groups cleaned: base + winner only
    assert(new java.io.File(s"$p/data").listFiles().count(_.isDirectory) == 2)
  }
}
