package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: 64-bit SimHash of an `array<string>`
  * token multiset in ONE pass per row.
  *
  * Bit-compatible with graft.ops.Dedup.simhashSignatures' aggregate
  * fallback: per token t, h = xxhash64(t) (XXH64 over UTF8 bytes,
  * seed 42); bit i of the signature is set iff
  * #{tokens with bit i of h set} * 2 > #tokens (i.e. the ±1 bit-sum
  * is positive). The fallback needs explode + a 64-column hash
  * aggregate — a full shuffle of every (doc, token) pair; this is a
  * map-only static call inside whole-stage codegen.
  */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHashSig.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashSig.compute($c);")

  override protected def withNewChildInternal(c: Expression): SimHashSig =
    copy(child = c)
  override def prettyName: String = "simhash_sig"
}

object SimHashSig {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.functions.call_function

  /** Called from interpreted eval AND generated code. */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val ones = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      var j = 0
      while (j < 64) {
        ones(j) += ((h >>> j) & 1L).toInt
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (ones(j) * 2 > n) sig |= (1L << j)
      j += 1
    }
    sig
  }

  val FuncName = "graft_simhash_sig"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FuncName, exprs => SimHashSig(exprs.head), "built-in")

  def simhash_sig(c: Column): Column = {
    register(SparkSession.active)
    call_function(FuncName, c)
  }
}
