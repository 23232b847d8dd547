package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: |A ∩ B| for two SORTED, duplicate-free
  * `array<long>` columns, as one sorted-merge pass.
  *
  * Why a custom Expression: the built-in
  * `size(array_intersect(a, b))` builds a hash set AND materializes
  * the intersection array per call — and it sits on the EDGE side of
  * triangle counting (`x9_triangles`) and neighbor-overlap joins, so
  * it runs O(edges) times with O(sqrt(m))-sized inputs. The merge
  * pass allocates nothing and short-circuits on exhaustion; codegen
  * is a single static call.
  *
  * Precondition (documented, not checked): both arrays sorted
  * ascending with distinct elements — exactly what
  * `array_sort(collect_list(...))` over distinct edges and
  * `array_sort(collect_set(...))` produce. On unsorted input the
  * result undercounts; parity with the `size(array_intersect(...))`
  * formulation on sorted-distinct input is pinned in ExtensionsSpec.
  */
case class IntersectCountSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    IntersectCountSorted.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.IntersectCountSorted.compute($a, $b);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): IntersectCountSorted =
    copy(left = l, right = r)
  override def prettyName: String = "intersect_count_sorted"
}

object IntersectCountSorted {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.functions.call_function

  /** Called from interpreted eval AND generated code. */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  val FuncName = "graft_intersect_count_sorted"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FuncName, exprs => IntersectCountSorted(exprs.head, exprs(1)),
      "built-in")

  /** Column wrapper on the active session. */
  def intersect_count_sorted(c1: Column, c2: Column): Column = {
    register(SparkSession.active)
    call_function(FuncName, c1, c2)
  }
}
