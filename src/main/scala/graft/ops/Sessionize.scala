package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Event-time windowing and sessionization (SURVEY.md §2.8 X5).
  *
  * The testdata `events.ts` is INT64 epoch-nanoseconds (read via
  * `spark.sql.legacy.parquet.nanosAsLong`), so all event-time math is
  * integer arithmetic on the nano value — exact, timezone-free, and
  * bit-identical to the DuckDB oracle's `epoch_us` arithmetic.
  *
  * Scale: tumbling windows are a single hash aggregate on
  * (bucket, keys); sessionization is the gaps-and-islands pattern —
  * one shuffle on user_id, then per-partition window functions. Both
  * survive 1000-executor scale (no driver-side state, no sorts beyond
  * the per-key window sort).
  */
object Sessionize {
  private val HourUs = 3600L * 1000000L

  /** epoch-nanos BIGINT -> epoch-micros BIGINT. Integer division —
    * double division would lose precision above 2^53 (epoch-nanos is
    * ~1.7e18) and drift from the oracle's epoch_us. */
  def nsToUs(ns: Column): Column =
    call_function("div", ns, lit(1000L)).cast(LongType)

  /** Tumbling-window bucket start as a micros-precision timestamp. */
  def tumblingStart(ns: Column, widthUs: Long = HourUs): Column =
    timestamp_micros(
      call_function("div", nsToUs(ns), lit(widthUs)) * widthUs)

  /** Tumbling count/sum per (window, event_type). */
  def tumblingAgg(events: DataFrame, widthUs: Long = HourUs): DataFrame =
    events
      .groupBy(
        tumblingStart(col("ts"), widthUs).as("window_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        graft.queries.Exact.sumD(col("value")).as("sum_value"))

  /** Gaps-and-islands sessionization: a new session starts when the
    * gap to the previous event of the same user exceeds `gapUs`.
    * Deterministic ordering: (ts, event_id). */
  def sessionize(events: DataFrame, gapUs: Long = 30L * 60 * 1000000)
      : DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
    val cum = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("event_id"), col("user_id"), nsToUs(col("ts")).as("ts_us"),
        col("value"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(cum))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("session_start_us"),
        max(col("ts_us")).as("session_end_us"),
        graft.queries.Exact.sumD(col("value")).as("session_value"))
  }
}
