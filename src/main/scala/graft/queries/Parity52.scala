package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 batch 1: the stream-stream attribution join's driver row
  * — FULL-equality DuckDB oracle.
  *
  *  - `x5_stream_attrib`: click→impression attribution through
  *    `streaming/StreamJoin.attribute` — THE two-unbounded-sides
  *    Structured Streaming operator (watermarked event-time interval
  *    join). StreamingSpec already proves the streaming execution
  *    equals the batch execution of the SAME method body
  *    (withWatermark is a no-op in batch); this row pins that shared
  *    body against a DuckDB interval-join oracle, closing the one
  *    §2.9 operator that had no CORRECTNESS entry. Timestamps are
  *    projected back to epoch-microsecond BIGINTs so the hash compare
  *    is representation-independent.
  *
  * Scale posture: both sides shuffle once on user_id; in streaming
  * mode buffered state is bounded by the time condition (an
  * impression is evicted once the click watermark passes
  * `i_ts + window`), so state ≈ events-per-user-per-window,
  * independent of stream length.
  */
object Parity52 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "x5_stream_attrib" -> { (s, d) =>
      val ev = eventsNs(s, d)
      val att = graft.streaming.StreamJoin.attribute(
        clicks = ev.filter(col("event_type") === "click"),
        impressions = ev.filter(col("event_type") === "view"),
        window = "1 hour", delay = "10 minutes")
      att.select(col("click_id"), col("user_id"),
          unix_micros(col("c_ts")).as("c_us"),
          col("imp_id"), unix_micros(col("i_ts")).as("i_us"))
        .orderBy(col("click_id"), col("imp_id"))
    })

  val oracles: Map[String, String] = Map(
    "x5_stream_attrib" ->
      """SELECT c.event_id AS click_id, c.user_id,
           epoch_us(c.ts) AS c_us, i.event_id AS imp_id,
           epoch_us(i.ts) AS i_us
         FROM events c JOIN events i
           ON c.user_id = i.user_id
          AND c.event_type = 'click' AND i.event_type = 'view'
          AND epoch_us(i.ts) >= epoch_us(c.ts) - 3600000000
          AND epoch_us(i.ts) <= epoch_us(c.ts)
         ORDER BY click_id, imp_id"""
  )
}
