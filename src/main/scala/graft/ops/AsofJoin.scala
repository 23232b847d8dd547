package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of (backward) join: for each left row, attach the
  * most recent right row with the same key whose time is <= the left
  * time. The classic enrich-events-with-latest-dimension operator
  * Spark lacks natively.
  *
  * Implementation is the union-merge pattern (SURVEY.md §2 custom-op
  * preference (a) — composition of built-ins, no custom planner
  * node): tag and union both sides, sort within each key by (time,
  * side), and carry the right side's payload forward with
  * last_value(ignoreNulls) over the running window. One shuffle on
  * the key, per-key sort — the same cost shape as a sort-merge join,
  * scales like any window aggregation (no point lookups, no
  * broadcast of the big side).
  *
  * Ties (left.time == right.time) take the right row (<=, matching
  * DuckDB/standard ASOF semantics).
  */
object AsofJoin {

  /** @param left      probe side (events)
    * @param right     reference side (versioned dimension)
    * @param keyCol    equi-key column name present on both sides
    * @param leftTime  event-time column on `left` (numeric/timestamp)
    * @param rightTime version-time column on `right`
    * @param payload   right-side columns to attach */
  def asofBackward(left: DataFrame, right: DataFrame, keyCol: String,
      leftTime: String, rightTime: String, payload: Seq[String],
      tolerance: Option[Long] = None): DataFrame =
    asofImpl(left, right, keyCol, leftTime, rightTime, payload,
      forward = false, tolerance)

  /** Forward as-of: attach the EARLIEST right row with time >= the
    * left time (next-event semantics — "the purchase after this
    * view"). Same union-merge machinery run in descending time order;
    * ties (left.time == right.time) take the right row (>=). */
  def asofForward(left: DataFrame, right: DataFrame, keyCol: String,
      leftTime: String, rightTime: String, payload: Seq[String],
      tolerance: Option[Long] = None): DataFrame =
    asofImpl(left, right, keyCol, leftTime, rightTime, payload,
      forward = true, tolerance)

  /** Union-merge as-of with optional match tolerance: the matched
    * right TIME is carried beside the payload, and when `tolerance`
    * is set, matches farther than it (backward: right < left - tol;
    * forward: right > left + tol) null the payload — the standard
    * bounded-staleness as-of (pandas merge_asof `tolerance`). One
    * shuffle on the key either direction. */
  private def asofImpl(left: DataFrame, right: DataFrame, keyCol: String,
      leftTime: String, rightTime: String, payload: Seq[String],
      forward: Boolean, tolerance: Option[Long]): DataFrame = {
    val leftCols = left.columns.toSeq
    // side 0 = right: sorts before left on equal time in BOTH
    // directions => inclusive (<= / >=) semantics
    val taggedRight = right.select(
      Seq(col(keyCol), col(rightTime).as("_t"), lit(0).as("_side")) ++
        payload.map(c => col(c).as(s"_p_$c")) ++
        leftCols.filterNot(_ == keyCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      Seq(col(keyCol), col(leftTime).as("_t"), lit(1).as("_side")) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(s"_p_$c")) ++
        leftCols.filterNot(_ == keyCol).map(col): _*)
    val order =
      if (forward) Seq(col("_t").desc, col("_side").asc)
      else Seq(col("_t").asc, col("_side").asc)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = taggedRight.unionByName(taggedLeft)
      .withColumn("_rt", when(col("_side") === 0, col("_t")))
    val carried = payload.foldLeft(merged) { (df, c) =>
      df.withColumn(s"_p_$c", last(col(s"_p_$c"), ignoreNulls = true).over(w))
    }.withColumn("_mt", last(col("_rt"), ignoreNulls = true).over(w))
    val inTol = tolerance match {
      case None => lit(true)
      case Some(tol) =>
        if (forward) col("_mt") <= col("_t") + tol
        else col("_mt") >= col("_t") - tol
    }
    carried
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        payload.map(c =>
          when(inTol, col(s"_p_$c")).otherwise(lit(null)).as(c)): _*)
  }
}
