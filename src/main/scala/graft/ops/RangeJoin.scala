package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Binned point-in-interval range join (SURVEY.md §2.8 X5 family —
  * the interval analog of the as-of join).
  *
  * A naive `points JOIN intervals ON lo <= p AND p <= hi` has no
  * equi-key, so Spark plans BroadcastNestedLoopJoin — O(|points| ×
  * |intervals|) comparisons and a broadcast of a whole side; at
  * 100 TB it is the canonical scale-killer. The standard fix (as in
  * production range-join optimizers) is binning: pick a bin width W,
  * explode each interval onto the bins it covers
  * (`sequence(lo div W, hi div W)` — one output row per covered bin),
  * map each point to its single bin, and equi-join on the bin before
  * re-checking the exact predicate.
  *
  * A point lies in exactly one bin, so every qualifying
  * (point, interval) pair meets in exactly one bin — no post-join
  * dedup. Cost: shuffle of |points| + Σ(span/W) interval rows, then
  * hash/sort-merge join — fully partitioned by bin, no broadcast of
  * a big side, no nested loop. Choose W near the median interval
  * span: smaller W → more interval replication; larger W → more
  * false candidates filtered by the residual predicate.
  */
object RangeJoin {

  /** floor(c / w) on longs — Spark's `div` truncates toward zero, so
    * shift negative non-exact quotients down one. */
  private def binOf(c: Column, w: Long): Column = {
    val q = call_function("div", c.cast(LongType), lit(w))
    when(c.cast(LongType) < 0 && pmod(c.cast(LongType), lit(w)) =!= 0,
      q - 1).otherwise(q)
  }

  /** Join `points` to the `intervals` whose [lo, hi] (inclusive)
    * contains the point. All three key columns must be integral
    * (epoch-days, epoch-micros, ids…); `binWidth` is in the same
    * unit. Non-key columns of both inputs are carried through.
    */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"points and intervals share columns $overlap — both sides are " +
        "carried through, so alias one side first")
    require(!points.columns.contains("__bin") &&
      !intervals.columns.contains("__bin"),
      "__bin is reserved by the binned join")
    val iv = intervals.withColumn("__bin",
      explode(sequence(binOf(col(loCol), binWidth), binOf(col(hiCol), binWidth))))
    val pt = points.withColumn("__bin", binOf(col(pointCol), binWidth))
    pt.join(iv, Seq("__bin"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }

  /** Interval-overlap join: pairs from `a` × `b` whose inclusive
    * [lo, hi] ranges intersect. Same binning as the point form, but
    * BOTH sides explode onto their covered bins — and since two
    * overlapping intervals can now share several bins, each pair is
    * emitted only in the FIRST bin they share, which is always the
    * bin of `greatest(lo_a, lo_b)` (the later start falls inside the
    * overlap, so both sides cover its bin). One equi-join, no
    * post-join dedup, shuffles sized by Σ(span/W) — the standard
    * distributed interval-join rewrite.
    */
  def intervalOverlapJoin(
      a: DataFrame, loA: String, hiA: String,
      b: DataFrame, loB: String, hiB: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val overlap = a.columns.toSet.intersect(b.columns.toSet)
    require(overlap.isEmpty,
      s"interval sides share columns $overlap — alias one side first")
    require(!a.columns.contains("__bin") && !b.columns.contains("__bin"),
      "__bin is reserved by the binned join")
    val ea = a.withColumn("__bin",
      explode(sequence(binOf(col(loA), binWidth), binOf(col(hiA), binWidth))))
    val eb = b.withColumn("__bin",
      explode(sequence(binOf(col(loB), binWidth), binOf(col(hiB), binWidth))))
    ea.join(eb, Seq("__bin"))
      .where(col(loA) <= col(hiB) && col(loB) <= col(hiA) &&
        col("__bin") === binOf(greatest(col(loA), col(loB)), binWidth))
      .drop("__bin")
  }
}
