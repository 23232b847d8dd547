package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: DISTINCT word n-gram shingles of an
  * `array<string>` token column, first-occurrence order.
  *
  * Bit-compatible with the built-in formulation in
  * graft.ops.TextOps.shingles (n zipped slices concatenated with a
  * single space, then array_distinct; docs shorter than n yield an
  * empty set). The HOF chain allocates n slice arrays + n-1 zipped
  * arrays per row and interprets the concat lambda per element; this
  * is one static call building the strings in a tight loop — and
  * shingling sits under every near-dup path (MinHash, exact Jaccard),
  * often evaluated 2-3x per plan because the same subtree feeds
  * multiple join legs.
  */
case class ShingleSet(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleSet.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleSet.compute($c, $n);")

  override protected def withNewChildInternal(c: Expression): ShingleSet =
    copy(child = c)
  override def prettyName: String = "shingle_set"
}

object ShingleSet {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.functions.{call_function, lit}

  private val Space = UTF8String.fromString(" ")

  /** Called from interpreted eval AND generated code. */
  def compute(toks: ArrayData, n: Int): GenericArrayData = {
    val cnt = toks.numElements() - (n - 1)
    if (cnt <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](cnt * 2)
    val parts = new Array[UTF8String](2 * n - 1)
    var j = 1
    while (j < parts.length) { parts(j) = Space; j += 2 }
    var i = 0
    while (i < cnt) {
      var k = 0
      while (k < n) { parts(2 * k) = toks.getUTF8String(i + k); k += 1 }
      seen.add(UTF8String.concat(parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  val FuncName = "graft_shingle_set"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FuncName,
      exprs => ShingleSet(exprs.head, exprs(1).eval().asInstanceOf[Int]),
      "built-in")

  def shingle_set(toks: Column, n: Int): Column = {
    register(SparkSession.active)
    call_function(FuncName, toks, lit(n))
  }
}
