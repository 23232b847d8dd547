package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the Hilbert-curve clustering kernel: round-trip against
  * an independent reference d→(x,y) inverse, the defining adjacency
  * property (consecutive indices are grid neighbors — the property
  * Z-order does NOT have), bijectivity on a sub-grid, and the SQL
  * registration path.
  */
class HilbertSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent reference: the standard iterative d→(x,y) inverse
    * (builds the point bottom-up from the index quaternary digits —
    * a different recurrence than the kernel's top-down xy→d). */
  private def d2xy(dIn: Long): (Long, Long) = {
    val n = 1L << functions.Hilbert2.Bits
    var t = dIn; var x = 0L; var y = 0L; var s = 1L
    while (s < n) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx; y += s * ry
      t /= 4; s <<= 1
    }
    (x, y)
  }

  test("hilbert2 round-trips the reference inverse on sampled indices") {
    // deterministic sample across the full 32-bit index range
    val idx = (0L until 4096L).map(i => i * 1048573L % (1L << 32))
    for (d <- idx) {
      val (x, y) = d2xy(d)
      assert(functions.Hilbert2.compute(x, y) == d, s"index $d -> ($x,$y)")
    }
  }

  test("consecutive Hilbert indices are Manhattan-adjacent cells") {
    // THE Hilbert property (false for Morton): |Δx| + |Δy| == 1 for
    // every consecutive index pair. Walk several windows, including
    // quadrant boundaries where Z-order jumps.
    val starts = Seq(0L, 65535L, (1L << 16) - 2, (1L << 30) - 500, 123456789L)
    for (s0 <- starts; d <- s0 until (s0 + 1000)) {
      val (x1, y1) = d2xy(d); val (x2, y2) = d2xy(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump at d=$d: ($x1,$y1) -> ($x2,$y2)")
    }
  }

  test("hilbert2 is a bijection on the 64x64 sub-grid") {
    // the low 6 bit-planes of the full 16-bit curve visit 4096 cells
    // with 4096 distinct indices
    val ds = (for (x <- 0L until 64L; y <- 0L until 64L)
      yield functions.Hilbert2.compute(x, y)).toSet
    assert(ds.size == 4096)
  }

  test("kernel masks inputs to the 16-bit grid") {
    assert(functions.Hilbert2.compute(65536L + 7L, 3L) ==
      functions.Hilbert2.compute(7L, 3L))
    assert(functions.Hilbert2.compute(-1L, 0L) ==
      functions.Hilbert2.compute(65535L, 0L))
  }

  test("hilbert blocks are tiles AND consecutive blocks touch; z blocks jump") {
    // the full order-16 curve fills the (0,0) 64x64 subsquare in its
    // first 4096 indices, so sorting the [0,63]^2 grid by hilbert2 and
    // cutting 64-point blocks gives aligned 8x8 tiles (4^3-aligned
    // index ranges are subsquares) — same tiling as Morton. The
    // difference is BETWEEN blocks: the Hilbert walk never jumps, so
    // consecutive files are edge-adjacent; Morton jumps quadrants.
    val n = 64
    def blocksBy(key: (Long, Long) => Long) =
      (for (a <- 0 until n; b <- 0 until n)
        yield (a.toLong, b.toLong, key(a.toLong, b.toLong)))
        .sortBy(_._3).grouped(64).toSeq
    val hb = blocksBy(functions.Hilbert2.compute)
    assert(hb.forall { blk =>
      val (as, bs) = (blk.map(_._1), blk.map(_._2))
      (as.max - as.min) == 7 && (bs.max - bs.min) == 7
    }, "every 64-point hilbert block must be an 8x8 tile")
    def jumps(blocks: Seq[Seq[(Long, Long, Long)]]): Seq[Long] =
      blocks.sliding(2).map { case Seq(x, y) =>
        val (_, (a1, b1, _), (a2, b2, _)) = (0, x.last, y.head)
        math.abs(a1 - a2) + math.abs(b1 - b2)
      }.toSeq
    assert(jumps(hb).forall(_ == 1L),
      "hilbert: consecutive blocks must be edge-adjacent")
    val zj = jumps(blocksBy(functions.ZOrder2.compute))
    assert(zj.max > 8L,
      s"morton should jump quadrants between blocks (max ${zj.max})")
  }

  test("writeHilbertOrdered files cover tight rectangles in both key dims") {
    import org.apache.spark.sql.functions.{avg, max, min}
    val dir = java.nio.file.Files.createTempDirectory("hilbert").toFile
    dir.deleteOnExit()
    val path = s"${dir.getAbsolutePath}/li"
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select("l_partkey", "l_suppkey")
    sources.Sinks.writeHilbertOrdered(li, path, "l_partkey", "l_suppkey", 16)
    val spans = spark.read.parquet(path)
      .select(col("l_partkey"), col("l_suppkey"),
        col("_metadata.file_name").as("f"))
      .groupBy("f")
      .agg((max("l_partkey") - min("l_partkey")).as("pspan"),
        (max("l_suppkey") - min("l_suppkey")).as("sspan"))
      .agg(avg("pspan").as("p"), avg("sspan").as("s"))
      .head()
    val r = li.agg(max("l_partkey") - min("l_partkey"),
      max("l_suppkey") - min("l_suppkey")).head()
    assert(spans.getDouble(0) < r.getLong(0) * 0.6,
      s"partkey span ${spans.getDouble(0)} vs global ${r.getLong(0)}")
    assert(spans.getDouble(1) < r.getLong(1) * 0.6,
      s"suppkey span ${spans.getDouble(1)} vs global ${r.getLong(1)}")
  }

  test("graft_hilbert2 SQL path matches the Column wrapper") {
    functions.Hilbert2.register(spark)
    val df = Seq((3L, 5L), (100L, 200L), (65535L, 65535L)).toDF("a", "b")
    df.createOrReplaceTempView("hilbert_probe")
    val viaSql = spark.sql(
      "SELECT graft_hilbert2(a, b) AS h FROM hilbert_probe ORDER BY h")
      .as[Long].collect().toSeq
    val viaCol = df.select(functions.Hilbert2.hilbert2(col("a"), col("b"))
      .as("h")).orderBy(col("h")).as[Long].collect().toSeq
    assert(viaSql == viaCol)
  }
}
