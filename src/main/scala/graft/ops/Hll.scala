package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational HyperLogLog (m = 64 registers), oracle-replayable: the
  * cardinality sketch next to KMV/theta (order statistics), CMS
  * (frequency), Misra–Gries (heavy hitters) and t-digest (quantiles).
  *
  * A register set is a SPARSE (j, m) DataFrame — at most 64 rows, the
  * persistable/mergeable state. The contract that makes it a sketch:
  * [[registers]] over a union == [[merge]] of per-part registers
  * (register max is associative/commutative/idempotent), so per-day
  * or per-source register sets roll up without touching raw data —
  * pinned by OpsSpec on a real split.
  *
  * Determinism: the hash is the md5-derived 60-bit `polyHash60` (top
  * 6 bits pick the register, the 54-bit suffix's leading-zero rank is
  * rho via `bin()` bit length — identical in DuckDB); the 2^−M
  * register fold is an EXACT scaled BIGINT (Σ 2^(55−M) ≤ 64·2^55 <
  * 2^62, no IEEE summation order), and only the final alpha·m²/S +
  * linear-counting chain is floating point, mirrored operation for
  * operation in the `x6_hll_poly` oracle.
  *
  * Scale: ONE map-side-combinable grouped max over a map-only
  * projection per input — vs a full distinct shuffle for the exact
  * count. The register set is 64 rows of metadata at any corpus size.
  */
object Hll {
  val M = 64
  /** polyHash60 is 60 bits; the top 6 pick one of the 64 registers,
    * leaving a 54-bit suffix for the rank. */
  val SufBits = 54

  /** Sparse register set (j, m) of a string-value column `sval`:
    * m = max over values of (leading zeros of the 54-bit suffix + 1).
    * Untouched registers are simply absent (conceptually M = 0). */
  def registers(vals: DataFrame, valCol: String = "sval"): DataFrame =
    vals.select(TextOps.polyHash60(col(valCol)).as("h"))
      .select(shiftright(col("h"), SufBits).as("j"),
        col("h").bitwiseAND(lit((1L << SufBits) - 1)).as("suf"))
      // rho = 55 - bitlength(suf); all-zero suffix -> 55
      .select(col("j"),
        when(col("suf") === 0L, lit(SufBits + 1))
          .otherwise(lit(SufBits + 1) - length(bin(col("suf"))))
          .cast("long").as("rho"))
      .groupBy(col("j")).agg(max(col("rho")).as("m"))

  /** Union-merge of register sets: per-register max — associative,
    * commutative, idempotent, so any partition of the data rolls up
    * to the same sketch. */
  def merge(regs: Seq[DataFrame]): DataFrame =
    regs.reduce(_ unionAll _).groupBy(col("j")).agg(max(col("m")).as("m"))

  /** Per-group sparse register sets — (groupCols..., j, m), ≤ 64 rows
    * per group. The persisted per-partition form of the sketch: one
    * row group per source/day, merged downstream by [[mergeBy]]. */
  def registersBy(vals: DataFrame, by: Seq[String],
      valCol: String = "sval"): DataFrame =
    vals.select(by.map(col) :+ TextOps.polyHash60(col(valCol)).as("h"): _*)
      .select(by.map(col) ++ Seq(
        shiftright(col("h"), SufBits).as("j"),
        col("h").bitwiseAND(lit((1L << SufBits) - 1)).as("suf")): _*)
      .select(by.map(col) ++ Seq(col("j"),
        when(col("suf") === 0L, lit(SufBits + 1))
          .otherwise(lit(SufBits + 1) - length(bin(col("suf"))))
          .cast("long").as("rho")): _*)
      .groupBy(by.map(col) :+ col("j"): _*).agg(max(col("rho")).as("m"))

  /** Collapse grouped register sets to the union sketch — the merge
    * side of the persist-then-merge contract, as one keyed max. */
  def mergeBy(regs: DataFrame): DataFrame =
    regs.groupBy(col("j")).agg(max(col("m")).as("m"))

  /** Per-group (groupCols..., v_zero, s_scaled, est) from grouped
    * register sets: densify each group over the 0..m−1 grid, fold,
    * estimate. The grid join is (groups × 64)-sized metadata. */
  def estimateBy(spark: SparkSession, regs: DataFrame,
      by: Seq[String]): DataFrame = {
    val grid = regs.select(by.map(col): _*).distinct()
      .crossJoin(spark.range(M).select(col("id").as("j")))
    grid.join(regs, by :+ "j", "left")
      .select(by.map(col) :+ coalesce(col("m"), lit(0L)).as("m"): _*)
      .groupBy(by.map(col): _*)
      .agg(
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), " +
          s"CAST(${SufBits + 1} - m AS INT))")).as("s_scaled"),
        sum(when(col("m") === 0L, 1L).otherwise(0L)).as("v_zero"))
      .select(by.map(col) ++ Seq(col("v_zero"), col("s_scaled"),
        estimateCol(col("s_scaled"), col("v_zero")).as("est")): _*)
  }

  /** Mirrored estimate chain from the exact scaled register sum and
    * zero-register count: raw = alpha_m · m² · 2^55 / S with the
    * standard V>0 linear-counting branch below 2.5m. */
  def estimateCol(sScaled: Column, vZero: Column): Column = {
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(M.toDouble))
    val raw = alpha * lit(M.toDouble) * lit(M.toDouble) *
      pow(lit(2.0), lit((SufBits + 1).toDouble)) / sScaled.cast("double")
    when(raw <= lit(2.5 * M) && vZero > 0,
      lit(M.toDouble) * log(lit(M.toDouble) / vZero.cast("double")))
      .otherwise(raw)
  }

  /** One-row (v_zero, s_scaled, est) frame from a sparse register
    * set: densify over the 0..m−1 grid (absent register ⇒ M = 0),
    * fold Σ 2^(55−M) as an exact BIGINT, apply [[estimateCol]]. */
  def estimate(spark: SparkSession, regs: DataFrame): DataFrame = {
    val grid = spark.range(M).select(col("id").as("j"))
    grid.join(regs, Seq("j"), "left")
      .select(coalesce(col("m"), lit(0L)).as("m"))
      .agg(
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), " +
          s"CAST(${SufBits + 1} - m AS INT))")).as("s_scaled"),
        sum(when(col("m") === 0L, 1L).otherwise(0L)).as("v_zero"))
      .select(col("v_zero"), col("s_scaled"),
        estimateCol(col("s_scaled"), col("v_zero")).as("est"))
  }
}
