package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the Z-order clustering kernel: native expression ==
  * built-in-functions fallback bit-for-bit, reference Morton values,
  * and the layout property that motivates it — z-ordered files cover
  * tight rectangles in key space, so min-max stats prune on either
  * column.
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zorder2 matches hand-computed Morton values") {
    // bit i of a -> bit 2i+1; bit i of b -> bit 2i
    assert(functions.ZOrder2.compute(0L, 0L) == 0L)
    assert(functions.ZOrder2.compute(1L, 0L) == 2L)
    assert(functions.ZOrder2.compute(0L, 1L) == 1L)
    assert(functions.ZOrder2.compute(3L, 3L) == 15L)
    assert(functions.ZOrder2.compute(4L, 0L) == 32L)
    // masking: the 31-bit window ignores higher/sign bits
    assert(functions.ZOrder2.compute(-1L, 0L) ==
      functions.ZOrder2.compute(0x7FFFFFFFL, 0L))
  }

  test("native zorder2 == fallback formulation on adversarial longs") {
    val vals = Seq(0L, 1L, 2L, 3L, 255L, 256L, 65535L, 65536L,
      0x7FFFFFFFL, 0x80000000L, Long.MaxValue, Long.MinValue, -1L, -42L)
    val df = vals.flatMap(a => vals.map(b => (a, b))).toDF("a", "b")
      .select(col("a"), col("b"),
        functions.ZOrder2.zorder2(col("a"), col("b")).as("z_native"),
        functions.ZOrder2.zorder2Fallback(col("a"), col("b")).as("z_fb"))
    assert(df.filter(col("z_native") =!= col("z_fb")).isEmpty)
  }

  test("z-order blocks are square tiles; row-major blocks are stripes") {
    // cut a 64x64 grid sorted by z into 64-point blocks: each block is
    // exactly an aligned 8x8 tile (span 7 in BOTH dims). The same cut
    // of a row-major sort gives 1x64 stripes (span 63 in b).
    val n = 64
    val pts = for (a <- 0 until n; b <- 0 until n)
      yield (a.toLong, b.toLong, functions.ZOrder2.compute(a, b))
    val blocks = pts.sortBy(_._3).grouped(64).toSeq
    assert(blocks.forall { blk =>
      val (as, bs) = (blk.map(_._1), blk.map(_._2))
      (as.max - as.min) == 7 && (bs.max - bs.min) == 7
    }, "every 64-point z block must be an 8x8 tile")
    val stripes = pts.sortBy(p => (p._1, p._2)).grouped(64).toSeq
    assert(stripes.forall { blk => blk.map(_._2).max - blk.map(_._2).min == 63 })
  }

  test("writeZOrdered files cover tight rectangles in both key dims") {
    val dir = Files.createTempDirectory("zorder").toFile
    dir.deleteOnExit()
    val path = s"${dir.getAbsolutePath}/li"
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select("l_partkey", "l_suppkey")
    sources.Sinks.writeZOrdered(li, path, "l_partkey", "l_suppkey", 16)

    val spans = spark.read.parquet(path)
      .select(col("l_partkey"), col("l_suppkey"),
        col("_metadata.file_name").as("f"))
      .groupBy("f")
      .agg((max("l_partkey") - min("l_partkey")).as("pspan"),
        (max("l_suppkey") - min("l_suppkey")).as("sspan"))
      .agg(avg("pspan").as("p"), avg("sspan").as("s"))
      .head()
    val Seq(globalP, globalS) = {
      val r = li.agg(max("l_partkey") - min("l_partkey"),
        max("l_suppkey") - min("l_suppkey")).head()
      Seq(r.getLong(0).toDouble, r.getLong(1).toDouble)
    }
    // 16 files over a 2-D z-curve: each covers a fraction of BOTH
    // ranges (a 1-D sort would leave the second dim at ~full span).
    assert(spans.getDouble(0) < globalP * 0.6,
      s"partkey span ${spans.getDouble(0)} vs global $globalP")
    assert(spans.getDouble(1) < globalS * 0.6,
      s"suppkey span ${spans.getDouble(1)} vs global $globalS")
  }

  test("writeZOrdered survives empty, all-null, and one-null-key input") {
    import spark.implicits._
    val dir = Files.createTempDirectory("zdeg").toFile
    dir.deleteOnExit()
    // empty input: layout contract honored, no head() NPE
    sources.Sinks.writeZOrdered(
      Seq.empty[(Long, Long)].toDF("a", "b"), s"$dir/empty", "a", "b", 4)
    assert(spark.read.parquet(s"$dir/empty").count() == 0)
    // both keys all-null: plain nFiles layout, rows preserved
    val nulls = Seq[(java.lang.Long, java.lang.Long)](
      (null, null), (null, null), (null, null))
      .toDF("a", "b")
    sources.Sinks.writeZOrdered(nulls, s"$dir/nulls", "a", "b", 2)
    assert(spark.read.parquet(s"$dir/nulls").count() == 3)
    // one all-null key: falls back to 1-D range clustering on the other
    val oneNull = Seq[(java.lang.Long, java.lang.Long)](
      (1L, null), (5L, null), (9L, null), (2L, null))
      .toDF("a", "b")
    sources.Sinks.writeZOrdered(oneNull, s"$dir/onenull", "a", "b", 2)
    val back = spark.read.parquet(s"$dir/onenull")
    assert(back.count() == 4)
    assert(back.agg(sum("a")).head().getLong(0) == 17L)
  }

  test("graft_zorder2 SQL path coerces ints, rejects non-numeric args") {
    functions.ZOrder2.register(spark)
    // declared inputTypes make the analyzer widen INT -> LONG
    val z = spark.sql(
      "SELECT graft_zorder2(CAST(3 AS INT), CAST(5 AS INT)) AS z")
      .head().getLong(0)
    assert(z == functions.ZOrder2.compute(3L, 5L))
    // a non-coercible argument is an ANALYSIS error, not a runtime
    // ClassCastException deep in codegen
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_zorder2(array(1L), 2L)").collect()
    }
  }
}
