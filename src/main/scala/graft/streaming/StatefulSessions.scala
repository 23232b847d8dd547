package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization with `flatMapGroupsWithState`
  * (SURVEY.md §2.7 — the Structured Streaming state-store path the
  * reference's batch-shaped incrementality grows into).
  *
  * Per user, events accumulate into an open session held in the state
  * store; when a gap larger than `gapUs` appears (or the state times
  * out), the closed session is emitted. The same function runs over a
  * bounded stream (Trigger.AvailableNow in tests) and an unbounded
  * one — state handling is identical.
  */
object StatefulSessions {

  final case class Event(user_id: Long, ts_us: Long, value: Double)
  final case class OpenSession(start_us: Long, end_us: Long, n: Long,
      sum_value: Double)
  final case class ClosedSession(user_id: Long, session_start_us: Long,
      session_end_us: Long, n_events: Long, sum_value: Double)

  val DefaultGapUs: Long = 30L * 60 * 1000000

  /** State-transition function: fold sorted events into sessions,
    * emitting every closed one, keeping the open one in state. */
  def updateSessions(gapUs: Long)(
      userId: Long, events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    val sorted = events.toSeq.sortBy(_.ts_us)
    var open = state.getOption
    val closed = Seq.newBuilder[ClosedSession]
    sorted.foreach { e =>
      open match {
        case Some(s) if e.ts_us - s.end_us <= gapUs =>
          open = Some(OpenSession(s.start_us, e.ts_us, s.n + 1,
            s.sum_value + e.value))
        case Some(s) =>
          closed += ClosedSession(userId, s.start_us, s.end_us, s.n,
            s.sum_value)
          open = Some(OpenSession(e.ts_us, e.ts_us, 1L, e.value))
        case None =>
          open = Some(OpenSession(e.ts_us, e.ts_us, 1L, e.value))
      }
    }
    open match {
      case Some(s) => state.update(s)
      case None => state.remove()
    }
    closed.result().iterator
  }

  /** Apply the stateful sessionizer to a (possibly streaming) typed
    * event dataset. Caller picks output mode / trigger. */
  def sessionize(spark: SparkSession, events: Dataset[Event],
      gapUs: Long = DefaultGapUs): Dataset[ClosedSession] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        updateSessions(gapUs))
  }

  /** Convenience: nanoseconds-long raw events -> typed Event. */
  def fromRaw(spark: SparkSession,
      raw: org.apache.spark.sql.DataFrame): Dataset[Event] = {
    import spark.implicits._
    raw.select(
      col("user_id").cast("long").as("user_id"),
      call_function("div", col("ts"), lit(1000L)).cast("long").as("ts_us"),
      col("value").cast("double").as("value"))
      .as[Event]
  }
}
