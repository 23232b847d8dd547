package graft.queries

import graft.Tables._
import graft.ops.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Round-11 batch 12: the spatial-join family — FULL-equality DuckDB
  * oracle.
  *
  *  - `j13_grid_radius`: all-pairs radius join over 2-D points via
  *    grid bucketing — the spatial join Spark has no native operator
  *    for, built the way a geo engine builds it: bucket points into
  *    cells of side ≥ r, generate candidates by equi-joining each
  *    point's cell against the 3×3 neighborhood of the other's (so
  *    no near-boundary pair is missed — Parity43Spec plants one),
  *    verify with the exact distance. Points are derived
  *    deterministically from customer keys via the hash PRNG
  *    (integer micro-units), and the distance test is pure integer
  *    (Δx² + Δy² ≤ r²) — the join is EXACT end to end, no IEEE
  *    anywhere, so the oracle replays it with a brute-force n²
  *    verify. The same machinery is a geohash/haversine join at
  *    planet scale: swap the cell fn for interleaved bits (the
  *    ZOrder2 expression) and the verify for haversine.
  *
  * Scale posture: THE point of the grid: candidate pairs are
  * Σ (9 · cell-occupancy²) instead of n² — density-bounded, exactly
  * the LSH-band argument in 2-D space. One equi-join shuffle on the
  * cell key; the 9-cell explode multiplies only the probe side.
  * Skewed cells (urban hot spots) are the x8_skew_audit case:
  * sub-split hot cells (smaller cells, more neighbor offsets) or
  * salt them. Output is pair-count rows; the oracle's brute force is
  * sf0.01 scaffolding only.
  */
object Parity43 {
  type Q = (SparkSession, String) => DataFrame

  /** planar domain side in micro-units (points land in [0, Dom)). */
  private val Dom = 10000000L
  /** radius; cell side must be >= r for the 3x3 neighborhood. */
  private val R = 300000L
  private val Cell = 1000000L

  val queries: Map[String, Q] = Map(
    "j13_grid_radius" -> { (s, d) =>
      val pts = customer(s, d).select(col("c_custkey").as("id"),
          (TextOps.polyHash60(concat(lit("gx:"),
            col("c_custkey").cast("string"))) % Dom).as("x"),
          (TextOps.polyHash60(concat(lit("gy:"),
            col("c_custkey").cast("string"))) % Dom).as("y"))
      val cells = pts
        .withColumn("cx", expr(s"x DIV $Cell"))
        .withColumn("cy", expr(s"y DIV $Cell"))
      // probe side visits its own cell plus the 8 neighbors; build
      // side stays single-cell — candidates are cell-equi-join rows
      val offs = Seq(-1L, 0L, 1L)
      val probe = cells.select(col("id").as("id_a"), col("x").as("xa"),
          col("y").as("ya"), explode(array(
            (for (dx <- offs; dy <- offs) yield
              struct((col("cx") + dx).as("cx"), (col("cy") + dy).as("cy"))
            ): _*)).as("c"))
        .select(col("id_a"), col("xa"), col("ya"),
          col("c.cx").as("cx"), col("c.cy").as("cy"))
      val build = cells.select(col("id").as("id_b"), col("x").as("xb"),
        col("y").as("yb"), col("cx"), col("cy"))
      val pairs = probe.join(build, Seq("cx", "cy"))
        .filter(col("id_a") < col("id_b"))
        .filter((col("xa") - col("xb")) * (col("xa") - col("xb")) +
          (col("ya") - col("yb")) * (col("ya") - col("yb")) <= R * R)
        .select(col("id_a"), col("id_b"),
          ((col("xa") - col("xb")) * (col("xa") - col("xb")) +
            (col("ya") - col("yb")) * (col("ya") - col("yb")))
            .as("dist2"))
        .distinct()
      // pair list + the summary row the planner wants: join density
      val tot = pairs.agg(count(lit(1)).as("n_pairs"))
      pairs.crossJoin(broadcast(tot))
        .select(col("id_a"), col("id_b"), col("dist2"), col("n_pairs"))
        .orderBy(col("id_a"), col("id_b"))
    })

  /** DuckDB polyHash60 (Parity20 idiom). */
  private def hx15(e: String): String = OracleSql.hx15(e)

  val oracles: Map[String, String] = Map(
    "j13_grid_radius" ->
      s"""WITH pts AS (SELECT c_custkey AS id,
             ${hx15("'gx:' || CAST(c_custkey AS VARCHAR)")} % $Dom AS x,
             ${hx15("'gy:' || CAST(c_custkey AS VARCHAR)")} % $Dom AS y
           FROM customer),
         pairs AS (SELECT a.id AS id_a, b.id AS id_b,
             (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
               AS dist2
           FROM pts a JOIN pts b ON a.id < b.id
           WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
             <= ${R * R}),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM pairs)
         SELECT id_a, id_b, CAST(dist2 AS BIGINT) AS dist2, n_pairs
         FROM pairs CROSS JOIN tot ORDER BY id_a, id_b"""
  )
}
