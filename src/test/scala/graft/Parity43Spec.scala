package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for batch 12 (round 11): the grid radius join vs brute force
  * on the real corpus, including the near-boundary cross-cell case
  * the 3x3 neighborhood exists for.
  */
class Parity43Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("j13_grid_radius: grid + 3x3 neighborhood finds EXACTLY the " +
      "brute-force pair set at sf0.001") {
    import graft.ops.TextOps
    val d = "/root/testdata/sf0.001"
    val grid = graft.queries.Parity43.queries("j13_grid_radius")(spark, d)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over the same derived points
    val pts = Tables.customer(spark, d).select(col("c_custkey").as("id"),
      (TextOps.polyHash60(concat(lit("gx:"),
        col("c_custkey").cast("string"))) % 10000000L).as("x"),
      (TextOps.polyHash60(concat(lit("gy:"),
        col("c_custkey").cast("string"))) % 10000000L).as("y"))
    val a = pts.select(col("id").as("ia"), col("x").as("xa"),
      col("y").as("ya"))
    val b = pts.select(col("id").as("ib"), col("x").as("xb"),
      col("y").as("yb"))
    val brute = a.crossJoin(b).filter(col("ia") < col("ib"))
      .filter((col("xa") - col("xb")) * (col("xa") - col("xb")) +
        (col("ya") - col("yb")) * (col("ya") - col("yb"))
        <= 300000L * 300000L)
      .select("ia", "ib").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(grid == brute, s"grid ${grid.size} vs brute ${brute.size}")
    assert(brute.nonEmpty, "the fixture must exercise real pairs")
  }

  test("j13_grid_radius: a planted pair straddling a cell boundary " +
      "is found only because of the neighbor explode") {
    import spark.implicits._
    import graft.ops.TextOps
    // find two customer keys whose derived points land in DIFFERENT
    // cells but within the radius — proof the 3x3 neighborhood is
    // load-bearing, not decoration
    val d = "/root/testdata/sf0.001"
    val rows = graft.queries.Parity43.queries("j13_grid_radius")(spark, d)
      .collect()
    val pts = Tables.customer(spark, d).select(col("c_custkey").as("id"),
        (TextOps.polyHash60(concat(lit("gx:"),
          col("c_custkey").cast("string"))) % 10000000L).as("x"),
        (TextOps.polyHash60(concat(lit("gy:"),
          col("c_custkey").cast("string"))) % 10000000L).as("y"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val crossCell = rows.exists { r =>
      val (xa, ya) = pts(r.getAs[Long]("id_a"))
      val (xb, yb) = pts(r.getAs[Long]("id_b"))
      (xa / 1000000L, ya / 1000000L) != (xb / 1000000L, yb / 1000000L)
    }
    assert(crossCell,
      "at least one radius pair must straddle cells — otherwise the " +
        "corpus doesn't exercise the neighbor-join path")
  }
}
