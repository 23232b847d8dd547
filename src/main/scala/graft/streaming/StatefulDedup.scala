package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Streaming exact dedup over an unbounded stream with Spark 4's
  * `transformWithState` (the arbitrary-state v2 API): the continuous
  * form of the batch A3/S7 content-key dedup (`dropDuplicates` +
  * ingestion ledger), with the state problem an unbounded stream
  * actually has — the seen-set grows forever — solved by native
  * per-value state TTL instead of a hand-rolled timer loop.
  *
  * State: one boolean ValueState per content key, RocksDB-backed, with
  * `TTLConfig` expiry, so the state store holds only the TTL window's
  * keys. Within a micro-batch the smallest doc_id survives
  * (deterministic regardless of source order); across batches
  * first-batch-wins. At 100 TB/day scale the state size is bounded by
  * (distinct keys per TTL window), and RocksDB spills it off-heap —
  * the executor heap never holds the seen-set.
  *
  * Semantics (dedup-within-TTL) match the reference's COPY INTO
  * load-history window (Snowflake expires load metadata after 64
  * days — /root/reference dags load path); an infinite-retention
  * dedup is `TTLConfig.NONE`.
  *
  * Operational note: TTL requires TimeMode.ProcessingTime, and a
  * processing-time stateful query keeps scheduling micro-batches, so
  * a TTL'd query is for genuinely continuous streams (stop it
  * explicitly). For bounded replays pass `ttl = Duration.ZERO`
  * (infinite retention, TimeMode.None) — `Trigger.AvailableNow`
  * then drains exactly like the flatMapGroupsWithState operators.
  */
object StatefulDedup {

  final case class Doc(key: String, doc_id: Long, text: String)

  /** @param ttlMillis state retention; <= 0 means keep forever */
  class DedupProcessor(ttlMillis: Long)
      extends StatefulProcessor[String, Doc, Doc] {
    @transient private var seen: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val ttl = if (ttlMillis > 0) TTLConfig(Duration.ofMillis(ttlMillis))
        else TTLConfig.NONE
      seen = getHandle.getValueState[Boolean]("seen", Encoders.scalaBoolean, ttl)
    }

    override def handleInputRows(key: String, rows: Iterator[Doc],
        timerValues: TimerValues): Iterator[Doc] = {
      if (seen.exists()) {
        Iterator.empty
      } else {
        seen.update(true)
        // smallest doc_id in the batch survives — iterator order from
        // the shuffle is not deterministic, the min is
        Iterator.single(rows.minBy(_.doc_id))
      }
    }
  }

  /** Dedup a (streaming or batch-replayed) typed doc stream by `key`,
    * keeping state only for `ttl` (processing time; ZERO = forever).
    *
    * Works on BATCH datasets too (Spark executes `transformWithState`
    * over an in-memory state store, one "micro-batch" holding
    * everything, so the whole input is one batch and the minimum
    * doc_id per key survives deterministically). Batch execution
    * loads per-partition state stores, which resolve the driver's
    * StateStoreCoordinator RPC endpoint — created as a field of the
    * lazily-instantiated StreamingQueryManager — so touch
    * `spark.streams` first or the tasks fail with
    * CANNOT_LOAD_STATE_STORE on a session that never ran a stream. */
  def dedup(docs: Dataset[Doc], ttl: Duration): Dataset[Doc] = {
    import docs.sparkSession.implicits._
    if (!docs.isStreaming) docs.sparkSession.streams
    val mode = if (ttl.isZero || ttl.isNegative) TimeMode.None()
      else TimeMode.ProcessingTime()
    docs.groupByKey(_.key)
      .transformWithState(new DedupProcessor(ttl.toMillis),
        mode, OutputMode.Append())
  }
}
