package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD2 history build with `flatMapGroupsWithState` — the
  * continuous form of the batch `x1_scd2_history` query: a CDC stream
  * of (key, time, value) events folds into slowly-changing-dimension
  * validity intervals. A closed interval is emitted the moment the
  * value changes; the open (current) interval lives in the state
  * store, one entry per key.
  *
  * Same state-transition function for bounded replays
  * (Trigger.AvailableNow) and unbounded streams. Within a micro-batch
  * events are sorted by (time, event_id); ACROSS micro-batches arrival
  * order must respect event time per key (the usual CDC-source
  * contract — e.g. a partitioned log keyed by the same key). A
  * late-arriving change would need a watermark + reordering buffer in
  * front; with AvailableNow's single batch the fold is exact.
  */
object StatefulScd2 {

  final case class Change(user_id: Long, us: Long, event_id: Long,
      event_type: String)
  final case class Current(event_type: String, valid_from_us: Long,
      last_us: Long, last_event_id: Long)
  final case class Interval(user_id: Long, event_type: String,
      valid_from_us: Long, valid_to_us: Long)

  /** Fold a key's new events into its open interval, emitting every
    * interval the new events close.
    *
    * The cross-batch ordering contract (per key, a batch's events are
    * not older than the stored interval) is ENFORCED: a violating
    * event throws rather than silently producing inverted/overlapping
    * intervals, so a mis-partitioned CDC source surfaces as a stream
    * failure instead of corrupt history. */
  def updateScd2(userId: Long, events: Iterator[Change],
      state: GroupState[Current]): Iterator[Interval] = {
    val sorted = events.toSeq.sortBy(e => (e.us, e.event_id))
    var cur = state.getOption
    for (c <- cur; e <- sorted.headOption)
      if (e.us < c.last_us) throw new IllegalStateException(
        s"SCD2 ordering contract violated for key $userId: batch event at " +
          s"us=${e.us} precedes stored state at us=${c.last_us}; feed this " +
          "operator from a per-key-ordered CDC source or add a reordering " +
          "buffer (watermark) in front.")
    val closed = Seq.newBuilder[Interval]
    sorted.foreach { e =>
      cur match {
        case None =>
          cur = Some(Current(e.event_type, e.us, e.us, e.event_id))
        case Some(c) if c.event_type == e.event_type =>
          cur = Some(c.copy(last_us = e.us, last_event_id = e.event_id))
        case Some(c) =>
          closed += Interval(userId, c.event_type, c.valid_from_us, e.us - 1)
          cur = Some(Current(e.event_type, e.us, e.us, e.event_id))
      }
    }
    cur.foreach(state.update)
    closed.result().iterator
  }

  /** Apply to a (possibly streaming) typed change set. */
  def scd2(spark: SparkSession, changes: Dataset[Change]): Dataset[Interval] = {
    import spark.implicits._
    changes
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Current, Interval](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(updateScd2)
  }

  /** Raw events frame (ns-long `ts`) -> typed change stream. */
  def fromRaw(spark: SparkSession, raw: DataFrame): Dataset[Change] = {
    import spark.implicits._
    raw.select(
      col("user_id").cast("long").as("user_id"),
      call_function("div", col("ts"), lit(1000L)).cast("long").as("us"),
      col("event_id").cast("long").as("event_id"),
      col("event_type").cast("string").as("event_type"))
      .as[Change]
  }
}
