package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: 2-D Z-order (Morton) curve value of two
  * non-negative long keys — the multi-column clustering key behind
  * data-skipping layouts at 100 TB.
  *
  * Sorting a table by `zorder2(a, b)` and cutting it into files gives
  * every file a tight RECTANGLE in (a, b) space, so per-file/row-group
  * min-max stats prune scans filtered on EITHER column — unlike a
  * lexicographic sort by (a, b), which only prunes on `a`. See
  * `graft.sources.Sinks.writeZOrdered` for the write path and
  * ZOrderSpec for the measured file-span contraction.
  *
  * Semantics: each input is masked to its low 31 bits (keys are
  * non-negative ids; 31+31 interleaved bits stay clear of the sign
  * bit), then bits are interleaved LSB-first with `a` occupying the
  * higher bit of each pair. Bit-spreading uses the constant-time
  * "binary magic numbers" steps, so the same arithmetic is expressible
  * in plain SQL on any engine (the DuckDB oracle for `x8_zorder_curve`
  * replicates it verbatim) and in the built-in-functions fallback
  * (`zorder2Fallback`) that OpsSpec pins bit-identical.
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // Declared input types make the analyzer coerce INT/SHORT arguments
  // to LONG (and reject non-numeric ones at analysis time) for SQL
  // callers of graft_zorder2 — without this, interpreted eval threw
  // ClassCastException on integer columns.
  // (return type inferred: AbstractDataType is private[sql])
  override def inputTypes = Seq(LongType, LongType)
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder2.compute(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrder2.compute($a, $b);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ZOrder2 = copy(left = l, right = r)
  override def prettyName: String = "zorder2"
}

object ZOrder2 {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.functions._

  /** Spread the low 31 bits of v so bit i lands at bit 2i. */
  def spread(v: Long): Long = {
    var x = v & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Called from interpreted eval AND generated code. */
  def compute(a: Long, b: Long): Long = (spread(a) << 1) | spread(b)

  val FuncName = "graft_zorder2"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FuncName, exprs => ZOrder2(exprs.head, exprs(1)), "built-in")

  /** Column wrapper: zorder2(a, b) on the active session. */
  def zorder2(c1: Column, c2: Column): Column = {
    register(SparkSession.active)
    call_function(FuncName, c1.cast(LongType), c2.cast(LongType))
  }

  /** Built-in-functions formulation of the identical arithmetic (the
    * bit-compatibility reference for the native kernel, and the form
    * that runs on a stock session with no graft registration). */
  def zorder2Fallback(c1: Column, c2: Column): Column = {
    def spreadC(c: Column): Column = {
      val masks = Seq(
        16 -> 0x0000FFFF0000FFFFL, 8 -> 0x00FF00FF00FF00FFL,
        4 -> 0x0F0F0F0F0F0F0F0FL, 2 -> 0x3333333333333333L,
        1 -> 0x5555555555555555L)
      masks.foldLeft(c.cast(LongType).bitwiseAND(lit(0x7FFFFFFFL))) {
        case (x, (s, m)) => x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
      }
    }
    shiftleft(spreadC(c1), 1).bitwiseOR(spreadC(c2))
  }
}
