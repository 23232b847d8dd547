package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: dot product of two `array<long>`
  * micro-unit vectors (see graft.ops.Similarity.quantize) as one tight
  * JVM loop.
  *
  * Why a custom Expression: the built-in formulation
  * `aggregate(zip_with(a, b, _*_), 0L, _+_)` allocates a zipped array
  * and interprets both lambdas per element — and it sits on the PAIR
  * side of similarity joins, so it runs O(candidate-pairs) times, not
  * O(rows). This evaluator is a single static call (real codegen, no
  * interpreted detour), ~10x the HOF path per pair.
  *
  * Semantics match the HOF formulation for equal-length arrays with
  * non-null elements (the only shape `quantize` produces; embeddings
  * in one table share a dimension). Bit-compatibility with the HOF
  * path is pinned in OpsSpec.
  */
case class DotLongs(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    DotLongs.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DotLongs.compute($a, $b);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DotLongs = copy(left = l, right = r)
  override def prettyName: String = "dot_longs"
}

object DotLongs {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.functions.call_function

  /** Called from interpreted eval AND generated code (must stay
    * public + JVM-static-reachable). */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }

  val FuncName = "graft_dot_longs"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FuncName, exprs => DotLongs(exprs.head, exprs(1)), "built-in")

  /** Column wrapper: dot_longs(qa, qb) on the active session. */
  def dot_longs(c1: Column, c2: Column): Column = {
    register(SparkSession.active)
    call_function(FuncName, c1, c2)
  }
}
