package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: 2-D Hilbert-curve index of two grid
  * coordinates — the locality-preserving alternative to the Morton
  * curve (`ZOrder2`) for multi-column clustering layouts.
  *
  * The Hilbert curve never makes the long diagonal jumps the Z-curve
  * makes at quadrant boundaries, so consecutive index ranges map to
  * tighter, always-edge-connected regions of (a, b) space — files cut
  * from a Hilbert-sorted table have strictly better worst-case min-max
  * extents than Z-sorted ones (the reason Delta/Iceberg OPTIMIZE offer
  * it alongside Z-order). Same usage as `Sinks.writeZOrdered`: sort by
  * `hilbert2(a, b)`, cut into files, prune scans on EITHER column.
  *
  * Semantics: inputs are masked to the low 16 bits (grid 65536×65536 —
  * the production write path normalizes real key ranges onto the grid
  * via min/max first, exactly like `writeZOrdered`), then the standard
  * iterative xy→d transform walks bit planes from the top: at each
  * scale `s` the quadrant contributes `s²·((3·rx) XOR ry)` to the
  * index and the lower bits are rotated/reflected into the quadrant's
  * frame. 16 fixed iterations of integer ops — branch-light, loop
  * constant-bounded, and expressible verbatim as a 16-step recursive
  * CTE in the DuckDB oracle (`x8_hilbert_curve`).
  */
case class Hilbert2(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(LongType, LongType)
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    Hilbert2.compute(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Hilbert2.compute($a, $b);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Hilbert2 = copy(left = l, right = r)
  override def prettyName: String = "hilbert2"
}

object Hilbert2 {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.functions.call_function

  /** Grid order: 16 bits per axis → index fits in 32 bits. */
  val Bits = 16

  /** Standard iterative Hilbert xy→d (Wikipedia "Hilbert curve",
    * converted to flat Long arithmetic). Called from interpreted eval
    * AND generated code. */
  def compute(xIn: Long, yIn: Long): Long = {
    var x = xIn & 0xFFFFL
    var y = yIn & 0xFFFFL
    var d = 0L
    var s = 1L << (Bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the sub-square so the next bit plane is in its frame
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  val FuncName = "graft_hilbert2"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FuncName, exprs => Hilbert2(exprs.head, exprs(1)), "built-in")

  /** Column wrapper: hilbert2(a, b) on the active session. */
  def hilbert2(c1: Column, c2: Column): Column = {
    register(SparkSession.active)
    call_function(FuncName, c1.cast(LongType), c2.cast(LongType))
  }
}
