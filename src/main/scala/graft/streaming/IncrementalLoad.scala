package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming form of the reference's incremental load
  * (SURVEY.md §2 rows S7/S9, §2.7): the file-source checkpoint plays
  * the role of Snowflake's COPY INTO load history — each staged file
  * is processed exactly once, replays are no-ops, and the FileSensor
  * (ref: nhl_api_dag.py:179-193) is subsumed by the source's
  * file-arrival tracking.
  *
  * `Trigger.AvailableNow` drains everything currently staged and
  * stops — the batch-cadence operating mode of the reference's DAGs,
  * but with streaming-grade exactly-once bookkeeping. The same code
  * runs continuously by switching the trigger.
  */
object IncrementalLoad {

  /** Backfill rate limits (round-13 verdict item 7): a 100 TB
    * backlog must NOT land as one giant AvailableNow batch — one
    * batch means one shuffle/write whose task state, shuffle files,
    * and output commit all scale with the WHOLE backlog, and a
    * mid-batch failure replays all of it. `maxFilesPerTrigger` /
    * `maxBytesPerTrigger` bound each micro-batch; AvailableNow still
    * drains EVERYTHING staged (it plans the full backlog as a
    * sequence of bounded batches), and the checkpoint keeps each
    * file exactly-once across batch boundaries and restarts —
    * StreamingSpec pins a multi-wave backlog landing as ≥3 bounded
    * batches with content equal to the unbounded run. */
  private def rateLimited(
      r: org.apache.spark.sql.streaming.DataStreamReader,
      maxFilesPerTrigger: Option[Int],
      maxBytesPerTrigger: Option[String]) = {
    val f = maxFilesPerTrigger.fold(r)(n =>
      r.option("maxFilesPerTrigger", n.toLong))
    maxBytesPerTrigger.fold(f)(b => f.option("maxBytesPerTrigger", b))
  }

  /** Ingest staged CSV files into a parquet table, exactly once per
    * file. `transform` is the per-batch COPY INTO subquery (projection
    * + md5 keys), applied to the streaming frame. */
  def runCsv(spark: SparkSession, schema: StructType, srcDir: String,
      targetDir: String, checkpointDir: String,
      transform: DataFrame => DataFrame,
      pathGlob: String = "*.csv",
      maxFilesPerTrigger: Option[Int] = None,
      maxBytesPerTrigger: Option[String] = None): StreamingQuery = {
    val src = rateLimited(spark.readStream
      .schema(schema)
      .option("pathGlobFilter", pathGlob), // ref S6: PATTERN '.*csv.*'
      maxFilesPerTrigger, maxBytesPerTrigger)
      .csv(srcDir)
    transform(src).writeStream
      .format("parquet")
      .option("path", targetDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Same for multiLine JSON staging (SportRadar payloads). */
  def runJson(spark: SparkSession, schema: StructType, srcDir: String,
      targetDir: String, checkpointDir: String,
      transform: DataFrame => DataFrame,
      pathGlob: String = "*.json",
      maxFilesPerTrigger: Option[Int] = None,
      maxBytesPerTrigger: Option[String] = None): StreamingQuery = {
    val src = rateLimited(spark.readStream
      .schema(schema)
      .option("pathGlobFilter", pathGlob),
      maxFilesPerTrigger, maxBytesPerTrigger)
      .option("multiLine", true)
      .json(srcDir)
    transform(src).writeStream
      .format("parquet")
      .option("path", targetDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Event-time windowed aggregation with watermarking (SURVEY.md
    * §2.8 X5 streaming form): 10-minute tumbling counts per type,
    * tolerating 5 minutes of lateness. The batch testdata drives it
    * through Trigger.AvailableNow in tests. */
  def windowedEventCounts(events: DataFrame): DataFrame =
    events
      .withColumn("ts_ts", timestamp_micros(
        call_function("div", col("ts"), lit(1000L))))
      .withWatermark("ts_ts", "5 minutes")
      .groupBy(window(col("ts_ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))

  /** Native `session_window` sessionization of the ns-long event
    * stream — the built-in state-store path (merging session state,
    * watermark-gated append emission), same gap semantics as the
    * batch `x5_session_window` query and the flatMapGroupsWithState
    * sessionizer. In append mode a session emits once the watermark
    * passes its end; state is evicted with it, so per-key state is
    * bounded by the watermark delay, not the stream length. */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
      delay: String = "10 minutes"): DataFrame =
    events
      .withColumn("ts_ts", timestamp_micros(
        call_function("div", col("ts"), lit(1000L))))
      .withWatermark("ts_ts", delay)
      .groupBy(session_window(col("ts_ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("session_start_us"),
        unix_micros(col("sw.end")).as("session_end_us"),
        col("n_events"))
}
