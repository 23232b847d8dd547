package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Oracle-exact arithmetic helpers.
  *
  * The driver hash-compares our results against DuckDB. Floating sums
  * are accumulation-order dependent, so every aggregated money/qty
  * column is routed through exact decimal arithmetic and only cast
  * back to double at the very end: identical exact value -> identical
  * double bits on both engines, regardless of plan shape or
  * parallelism. This also makes results stable across partition
  * counts, which matters for a 1000-executor run.
  */
object Exact {
  /** Pin a double measure to exact decimal(18,2) (inputs in the
    * testdata are 2-decimal money/qty values). */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact sum of a 2-decimal measure, exposed as double. */
  def sumD(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** Exact sum of an already-decimal expression, exposed as double. */
  def sumExprD(c: Column): Column = sum(c).cast(DoubleType)

  /** Order-insensitive average: exact sum divided by count in double
    * space (one deterministic division). */
  def avgD(c: Column): Column =
    (sum(dec2(c)).cast(DoubleType) / count(c)).cast(DoubleType)

  /** revenue term l_extendedprice * (1 - l_discount), exact. */
  def revenue(price: Column, discount: Column): Column =
    dec2(price) * (lit(java.math.BigDecimal.ONE).cast(DecimalType(18, 2)) - dec2(discount))
}
