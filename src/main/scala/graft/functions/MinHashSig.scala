package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.catalyst.expressions.XXH64

/** Native Catalyst expression computing a k-element MinHash signature
  * from an array<string> of shingles in ONE pass per row.
  *
  * Why a custom Expression (SURVEY.md §4 "custom code budget"):
  * built-in formulations either nest higher-order functions (which
  * re-evaluate the inner tree per outer element — k× the string
  * hashing) or explode + aggregate (an extra shuffle of every
  * (doc, shingle) pair). This evaluator hashes each shingle once and
  * keeps k running minima in a local array — O(shingles·k) cheap long
  * mixes, zero shuffle, map-only at any scale.
  *
  * Hash spec (bit-compatible with the DataFrame fallback in
  * graft.ops.Dedup.signatures): per shingle s,
  *   h  = xxhash64(s)            (XXH64 over UTF8 bytes, seed 42)
  *   m_i = xxhash64(h, i)        (= hashInt(i, hashLong(h, 42)))
  * and the signature element i is min over shingles of m_i.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], k)

  /** Real codegen (not CodegenFallback): emits a single static call,
    * so a projection containing this expression stays inside
    * whole-stage codegen with no interpreted detour per row. */
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSig.compute($c, $k);")

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.functions.{call_function, lit}

  /** One-pass k-minima evaluation; called from interpreted eval AND
    * from generated code (must stay public + JVM-static-reachable). */
  def compute(arr: ArrayData, k: Int): GenericArrayData = {
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUTF8String(s, 42L)
      val hh = XXH64.hashLong(h, 42L)
      var j = 0
      while (j < k) {
        val m = XXH64.hashInt(j, hh)
        if (m < mins(j)) mins(j) = m
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  val FuncName = "graft_minhash_sig"

  /** Idempotently register the expression in the session's function
    * registry so it is reachable from the public Column API. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FuncName,
      exprs => MinHashSig(
        exprs.head,
        exprs(1).eval().asInstanceOf[Int]),
      "built-in")

  /** Column wrapper: minhash_sig(shingles, k). */
  def minhash_sig(spark: SparkSession, c: Column, k: Int): Column = {
    register(spark)
    call_function(FuncName, c, lit(k))
  }
}
