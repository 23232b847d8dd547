package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Buffer: micro-unit (1e-6) component sums + row count. Mergeable
  * across partitions in any order (long addition is associative). */
case class VecMeanBuf(sums: Array[Long], n: Long)

/** Typed Dataset `Aggregator`: exact per-group mean of float vectors
  * (class prototypes / cluster centroids) via the
  * `KeyValueGroupedDataset` API —
  * `ds.groupByKey(_.label).mapValues(_.embedding).agg(VecMeanAgg.toColumn)`.
  *
  * Each float component quantizes to micro-unit longs with the same
  * double→decimal(18,6) HALF_UP rounding as ops/Similarity.quantize,
  * so the result is partitioning-independent and bit-identical to the
  * DataFrame/SQL formulation in queries.Parity5 `x3_centroids`
  * (pinned in SemanticsSpec). This is the typed-API counterpart of
  * the same operator — use whichever API the pipeline speaks.
  */
object VecMeanAgg extends Aggregator[Array[Float], VecMeanBuf, Array[Double]] {

  private def micro(f: Float): Long =
    new java.math.BigDecimal(java.lang.Double.toString(f.toDouble))
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  override def zero: VecMeanBuf = VecMeanBuf(Array.emptyLongArray, 0L)

  override def reduce(b: VecMeanBuf, a: Array[Float]): VecMeanBuf = {
    val sums = if (b.sums.length == 0) new Array[Long](a.length) else b.sums
    var i = 0
    while (i < a.length) { sums(i) += micro(a(i)); i += 1 }
    VecMeanBuf(sums, b.n + 1)
  }

  override def merge(x: VecMeanBuf, y: VecMeanBuf): VecMeanBuf = {
    if (x.n == 0) return y
    if (y.n == 0) return x
    val sums = x.sums.clone()
    var i = 0
    while (i < y.sums.length) { sums(i) += y.sums(i); i += 1 }
    VecMeanBuf(sums, x.n + y.n)
  }

  /** Same rounding chain as the SQL path: micro-sum / 1e6 (one
    * correctly-rounded division == decimal-sum cast to double), then
    * / n in double. */
  override def finish(b: VecMeanBuf): Array[Double] =
    b.sums.map(s => (s / 1e6) / b.n)

  override def bufferEncoder: Encoder[VecMeanBuf] = Encoders.product[VecMeanBuf]
  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}
