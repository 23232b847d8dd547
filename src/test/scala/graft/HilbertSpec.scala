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
