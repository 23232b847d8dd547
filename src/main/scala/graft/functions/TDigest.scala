package graft.functions

import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Merging t-digest (Dunning's k1-scale variant): a MERGEABLE
  * quantile sketch — the percentile primitive a 100 TB pipeline
  * actually ships, because exact percentiles need a global sort but
  * digests build map-side, merge associatively like the MinHash/HLL
  * sketches, persist as small arrays, and answer any quantile later.
  *
  * Scale function: centroid at center-quantile q may hold at most
  * `4·W·q(1-q)/delta` points — fine resolution at the tails, coarse
  * in the middle, giving rank error ~ q(1-q)·4/delta (≈1% at the
  * median for delta=100).
  *
  * Digest wire format: array<double> of interleaved (mean, weight)
  * pairs, centroids in ascending mean order — readable by
  * `TDigestQuantile` and re-aggregable by `TDigestMergeAgg`.
  *
  * Estimates depend (within the rank-error bound) on partition merge
  * order, like every t-digest; correctness is therefore pinned by
  * BOUNDED oracles (rank-error assertions, the HLL/KMV pattern) and
  * exact-on-small-input spec pins, not hash equality.
  */
object TDigestOps {
  /** Max centroid weight at center quantile q (k1 scale). */
  private def weightLimit(delta: Int, total: Double, q: Double): Double =
    math.max(1.0, 4.0 * total * q * (1.0 - q) / delta)

  /** Merge-compress sorted (mean, weight) pairs in place of a new
    * buffer. Input need not be sorted; output is. Deterministic for
    * a given input multiset ORDER (sorts by (mean, weight) first). */
  def compress(cents: ArrayBuffer[Double], delta: Int): ArrayBuffer[Double] = {
    val n = cents.length / 2
    if (n <= 1) return cents
    val idx = Array.tabulate(n)(identity).sortBy(i => (cents(2 * i), cents(2 * i + 1)))
    var total = 0.0
    idx.foreach(i => total += cents(2 * i + 1))
    val out = new ArrayBuffer[Double](cents.length)
    var curM = cents(2 * idx(0))
    var curW = cents(2 * idx(0) + 1)
    var done = 0.0 // weight fully to the left of the current centroid
    var k = 1
    while (k < n) {
      val m = cents(2 * idx(k))
      val w = cents(2 * idx(k) + 1)
      val proposed = curW + w
      val qCenter = (done + proposed / 2.0) / total
      if (proposed <= weightLimit(delta, total, qCenter)) {
        // weighted-mean merge
        curM = (curM * curW + m * w) / proposed
        curW = proposed
      } else {
        out += curM += curW
        done += curW
        curM = m
        curW = w
      }
      k += 1
    }
    out += curM += curW
    out
  }

  /** Quantile estimate by linear interpolation between centroid
    * centers (centroids sorted by mean). */
  def quantile(cents: ArrayData, q: Double): Double = {
    val n = cents.numElements() / 2
    if (n == 0) return Double.NaN
    if (n == 1) return cents.getDouble(0)
    var total = 0.0
    var i = 0
    while (i < n) { total += cents.getDouble(2 * i + 1); i += 1 }
    val target = q * total
    // cumulative weight at centroid centers
    var cum = 0.0
    var prevCenter = 0.0
    var prevMean = cents.getDouble(0)
    i = 0
    while (i < n) {
      val w = cents.getDouble(2 * i + 1)
      val center = cum + w / 2.0
      val mean = cents.getDouble(2 * i)
      if (target < center) {
        if (i == 0) return mean // below first center: clamp
        val f = (target - prevCenter) / (center - prevCenter)
        return prevMean + f * (mean - prevMean)
      }
      prevCenter = center
      prevMean = mean
      cum += w
      i += 1
    }
    prevMean // above last center: clamp
  }

  def serialize(buf: ArrayBuffer[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): ArrayBuffer[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new ArrayBuffer[Double](bytes.length / 8)
    while (bb.hasRemaining) out += bb.getDouble
    out
  }
}

/** Aggregate raw doubles into a t-digest (array<double> interleaved
  * (mean, weight), ascending mean). */
case class TDigestAgg(
    child: Expression, delta: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private val compressAt = 16 * delta // unmerged-point high-water mark

  override def createAggregationBuffer(): ArrayBuffer[Double] =
    new ArrayBuffer[Double]

  override def update(buf: ArrayBuffer[Double], input: InternalRow)
      : ArrayBuffer[Double] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      buf += v.asInstanceOf[Double] += 1.0
      if (buf.length >= 2 * compressAt) TDigestOps.compress(buf, delta)
      else buf
    }
  }

  override def merge(a: ArrayBuffer[Double], b: ArrayBuffer[Double])
      : ArrayBuffer[Double] = TDigestOps.compress(a ++= b, delta)

  override def eval(buf: ArrayBuffer[Double]): Any =
    new GenericArrayData(TDigestOps.compress(buf, delta).toArray)

  override def serialize(buf: ArrayBuffer[Double]): Array[Byte] =
    TDigestOps.serialize(TDigestOps.compress(buf, delta))
  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Double] =
    TDigestOps.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): TDigestAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TDigestAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TDigestAgg = copy(child = c.head)
  override def prettyName: String = "tdigest"
}

/** Union pre-built digests (array<double> interleaved) into one —
  * the persist-then-merge path (per-partition/per-day digests rolled
  * up later without re-reading the raw data). */
case class TDigestMergeAgg(
    child: Expression, delta: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private val compressAt = 16 * delta // accumulated-centroid high-water mark

  override def createAggregationBuffer(): ArrayBuffer[Double] =
    new ArrayBuffer[Double]

  override def update(buf: ArrayBuffer[Double], input: InternalRow)
      : ArrayBuffer[Double] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) { buf += arr.getDouble(i); i += 1 }
      // accumulate incoming centroids and compress only past the
      // high-water mark (mirroring TDigestAgg) — an O(n log n) sort
      // per input digest would make unioning many small digests
      // quadratic in total centroid count; eval/serialize still
      // compress once at the end
      if (buf.length >= 2 * compressAt) TDigestOps.compress(buf, delta)
      else buf
    }
  }

  override def merge(a: ArrayBuffer[Double], b: ArrayBuffer[Double])
      : ArrayBuffer[Double] = TDigestOps.compress(a ++= b, delta)

  override def eval(buf: ArrayBuffer[Double]): Any =
    new GenericArrayData(TDigestOps.compress(buf, delta).toArray)

  override def serialize(buf: ArrayBuffer[Double]): Array[Byte] =
    TDigestOps.serialize(TDigestOps.compress(buf, delta))
  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Double] =
    TDigestOps.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): TDigestMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TDigestMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TDigestMergeAgg = copy(child = c.head)
  override def prettyName: String = "tdigest_merge"
}

/** Scalar: quantile estimate from a digest array. */
case class TDigestQuantile(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(d: Any, q: Any): Any =
    TDigestOps.quantile(d.asInstanceOf[ArrayData], q.asInstanceOf[Double])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (d, q) =>
      s"${ev.value} = graft.functions.TDigestOps.quantile($d, $q);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): TDigestQuantile = copy(left = l, right = r)
  override def prettyName: String = "tdigest_quantile"
}

object TDigest {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.functions.{call_function, lit}

  val AggName = "graft_tdigest"
  val MergeName = "graft_tdigest_merge"
  val QuantileName = "graft_tdigest_quantile"

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(AggName,
      exprs => TDigestAgg(exprs.head,
        exprs(1).eval().asInstanceOf[Int]).toAggregateExpression(),
      "built-in")
    reg.createOrReplaceTempFunction(MergeName,
      exprs => TDigestMergeAgg(exprs.head,
        exprs(1).eval().asInstanceOf[Int]).toAggregateExpression(),
      "built-in")
    reg.createOrReplaceTempFunction(QuantileName,
      exprs => TDigestQuantile(exprs.head, exprs(1)), "built-in")
  }

  def tdigest(spark: SparkSession, c: Column, delta: Int): Column = {
    register(spark); call_function(AggName, c, lit(delta))
  }
  def tdigest_merge(spark: SparkSession, c: Column, delta: Int): Column = {
    register(spark); call_function(MergeName, c, lit(delta))
  }
  def tdigest_quantile(spark: SparkSession, c: Column, q: Double): Column = {
    register(spark); call_function(QuantileName, c, lit(q))
  }
}
