package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: random-hyperplane LSH bucket id of a
  * float-vector column — `nBits` sign bits of dot products against
  * deterministic pseudo-planes.
  *
  * Bit-compatible with the HOF formulation in
  * graft.ops.Similarity.lshBucketHof: plane component (j, i) is
  * xxhash64('plane', j, i) / Long.MaxValue (the seed chain is
  * hashInt(i, hashInt(j, hashUTF8String('plane', 42)))), the dot
  * product accumulates left-to-right in double with the float widened
  * per element, and bit j is set iff the dot is >= 0 — the identical
  * IEEE operation sequence, so buckets match exactly. The HOF version
  * interprets nBits x dim lambda evaluations per row; this is one
  * static call.
  */
case class LshBucket(child: Expression, nBits: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    LshBucket.compute(input.asInstanceOf[ArrayData], nBits)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LshBucket.compute($c, $nBits);")

  override protected def withNewChildInternal(c: Expression): LshBucket =
    copy(child = c)
  override def prettyName: String = "lsh_bucket"
}

object LshBucket {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.functions.{call_function, lit}

  private val PlaneSeed: Long =
    XXH64.hashUTF8String(UTF8String.fromString("plane"), 42L)
  private val MaxD: Double = Long.MaxValue.toDouble

  /** Called from interpreted eval AND generated code. */
  def compute(vec: ArrayData, nBits: Int): Long = {
    val dim = vec.numElements()
    var bucket = 0L
    var j = 0
    while (j < nBits) {
      val hj = XXH64.hashInt(j, PlaneSeed)
      var dot = 0.0
      var i = 0
      while (i < dim) {
        dot += vec.getFloat(i).toDouble * (XXH64.hashInt(i, hj).toDouble / MaxD)
        i += 1
      }
      if (dot >= 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  val FuncName = "graft_lsh_bucket"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FuncName,
      exprs => LshBucket(exprs.head, exprs(1).eval().asInstanceOf[Int]),
      "built-in")

  def lsh_bucket(vec: Column, nBits: Int): Column = {
    register(SparkSession.active)
    call_function(FuncName, vec, lit(nBits))
  }
}
