package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Mergeable MinHash sketch aggregate (SURVEY.md §4: the one place a
  * custom `TypedImperativeAggregate` pays — persistable, unionable
  * sketches).
  *
  * Input: per-row k-element MinHash signatures (arrays of longs, e.g.
  * from `MinHashSig`). Buffer: the elementwise minimum — which is, by
  * the MinHash property, exactly the signature of the UNION of the
  * underlying shingle sets. Signatures therefore aggregate like
  * sketches: group partials merge associatively, can be persisted,
  * and unioned later without touching the raw text again.
  *
  * estimated Jaccard(groupA, groupB) = matching positions / k.
  */
case class MinHashUnionAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long],
      input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(k, arr.numElements())
      var i = 0
      while (i < n) {
        val x = arr.getLong(i)
        if (x < buf(i)) buf(i) = x
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MinHashUnionAgg = copy(child = c.head)
  override def prettyName: String = "minhash_union"
}

object MinHashUnionAgg {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.functions.{call_function, lit}

  val FuncName = "graft_minhash_union"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FuncName,
      exprs => MinHashUnionAgg(
        exprs.head,
        exprs(1).eval().asInstanceOf[Int]).toAggregateExpression(),
      "built-in")

  /** Column wrapper: minhash_union(sigArray, k) — aggregate. */
  def minhash_union(spark: SparkSession, c: Column, k: Int): Column = {
    register(spark)
    call_function(FuncName, c, lit(k))
  }
}
