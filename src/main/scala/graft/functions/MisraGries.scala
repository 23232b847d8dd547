package graft.functions

import java.nio.charset.StandardCharsets
import java.nio.ByteBuffer
import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch: at most k counters, mergeable
  * (Agarwal et al. mergeable-summaries merge: add counts, then
  * subtract the (k+1)-th largest and drop non-positives). Guarantees
  * after any merge tree: every item with true frequency > n/(k+1) is
  * present, and each kept counter underestimates its true count by at
  * most n/(k+1).
  *
  * The frequency-domain sibling of the MinHash/HLL/t-digest sketches:
  * builds map-side, merges associatively, is k-counters-sized no
  * matter the corpus — the top-token/top-URL/top-key monitor a
  * 100 TB pipeline ships instead of a full group-by when only the
  * heavy tail matters. Counter values depend on partition order
  * within the error bound, so correctness is a BOUNDED oracle (the
  * t-digest pattern), not hash equality.
  *
  * eval output: array<struct<item string, cnt long>> sorted by
  * (cnt desc, item asc).
  */
case class MisraGriesAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow)
      : mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None =>
          if (buf.size < k) buf.update(key, 1L)
          else {
            // classic MG decrement-all step; drop zeroed counters
            val dead = mutable.ArrayBuffer.empty[String]
            buf.foreach { case (ki, c) =>
              if (c == 1L) dead += ki else buf.update(ki, c - 1)
            }
            dead.foreach(buf.remove)
          }
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (ki, c) => a.update(ki, a.getOrElse(ki, 0L) + c) }
    if (a.size > k) {
      // subtract the (k+1)-th largest count from all; keep positives
      val cut = a.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      a.foreach { case (ki, c) =>
        if (c - cut <= 0L) dead += ki else a.update(ki, c - cut)
      }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toArray.sortBy { case (item, c) => (-c, item) }
      .map { case (item, c) =>
        InternalRow(UTF8String.fromString(item), c)
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val items = buf.toArray
    val bytes = items.map(_._1.getBytes(StandardCharsets.UTF_8))
    val size = 4 + bytes.map(b => 4 + b.length + 8).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(items.length)
    items.indices.foreach { i =>
      bb.putInt(bytes(i).length)
      bb.put(bytes(i))
      bb.putLong(items(i)._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val sb = new Array[Byte](len)
      bb.get(sb)
      out.update(new String(sb, StandardCharsets.UTF_8), bb.getLong)
    }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MisraGriesAgg = copy(child = c.head)
  override def prettyName: String = "misra_gries"
}

object MisraGries {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.functions.{call_function, lit}

  val FuncName = "graft_misra_gries"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FuncName,
      exprs => MisraGriesAgg(exprs.head,
        exprs(1).eval().asInstanceOf[Int]).toAggregateExpression(),
      "built-in")

  def misra_gries(spark: SparkSession, c: Column, k: Int): Column = {
    register(spark)
    call_function(FuncName, c, lit(k))
  }
}
