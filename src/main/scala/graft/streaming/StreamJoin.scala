package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream event-time join — the attribution
  * primitive (click ⋈ preceding impressions of the same user within
  * a trailing window). The one Structured Streaming operator class
  * the streaming package lacked next to stateful dedup/near-dup/
  * sessions/SCD2: two unbounded sides, neither materializable.
  *
  * Semantics: a click attributes to every impression of the same
  * user with `i_ts ∈ [c_ts − window, c_ts]`. Inner mode emits
  * matches as both sides arrive; leftOuter additionally emits
  * unmatched clicks once the watermark proves no impression can
  * still arrive (so outer rows trail by watermark + window — the
  * documented Structured Streaming contract).
  *
  * Scale posture: both sides shuffle on user_id — the same keyed
  * exchange a batch join takes — but buffered state is BOUNDED by
  * the time condition: Spark evicts an impression once the click
  * watermark passes `i_ts + window`, and a click once its outer
  * result is safe. Without the time bound the state would grow with
  * the stream; with it, state ≈ (events per user per window+delay),
  * independent of stream length. The same method body runs as a
  * plain batch join when handed batch frames (withWatermark is a
  * no-op in batch) — one code path, spec-pinned stream == batch.
  */
object StreamJoin {

  /** `window`/`delay` must be a simple `<n> <unit>` SQL interval —
    * validated up front so a malformed caller value fails fast with a
    * clear message instead of an opaque analysis-time parse error
    * (the strings are spliced into an `expr`, so the whitelist is
    * also the injection fence). */
  private val IntervalPat =
    "(?i)^\\d{1,9}\\s+(second|minute|hour|day)s?$".r
  private def checkInterval(name: String, v: String): Unit =
    require(IntervalPat.matches(v.trim),
      s"$name must look like '<n> seconds|minutes|hours|days', got: '$v'")

  /** `clicks`/`impressions`: frames (streaming or batch) with
    * `event_id`, `user_id` and an `ts` event-time column in
    * NANOSECONDS (the Tables.eventsNs convention). `window` and
    * `delay` are SQL interval strings. */
  def attribute(clicks: DataFrame, impressions: DataFrame,
      window: String = "1 hour", delay: String = "10 minutes",
      outer: Boolean = false): DataFrame = {
    checkInterval("window", window)
    checkInterval("delay", delay)
    val c = clicks.select(col("event_id").as("click_id"), col("user_id"),
        timestamp_micros(expr("ts DIV 1000")).as("c_ts"))
      .withWatermark("c_ts", delay)
    val i = impressions.select(col("event_id").as("imp_id"),
        col("user_id").as("i_user"),
        timestamp_micros(expr("ts DIV 1000")).as("i_ts"))
      .withWatermark("i_ts", delay)
    c.join(i,
      col("user_id") === col("i_user") &&
        expr(s"i_ts >= c_ts - INTERVAL $window") && col("i_ts") <= col("c_ts"),
      if (outer) "leftOuter" else "inner")
      .select(col("click_id"), col("user_id"), col("c_ts"),
        col("imp_id"), col("i_ts"))
  }
}
