package graft.streaming

import java.time.Duration

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues}
import org.apache.spark.util.LongAccumulator

/** Continuous near-duplicate CANDIDATE generation over an unbounded
  * document stream — the streaming half of MinHash LSH. Input is one
  * row per (band-bucket key, doc id) (any banding that emits string
  * bucket keys works: the xxhash production banding or the
  * SQL-replayable poly banding from
  * [[graft.ops.Dedup.polyBandsAndSets]]). State per bucket is the id
  * list of every doc that has ever hit the bucket (TTL-bounded like
  * [[StatefulDedup]]); an arriving doc emits one candidate pair per
  * stored id plus the in-batch pairs, then joins the bucket. Exact
  * verification (Jaccard over shingle sets) happens downstream — in a
  * stream it is a stream-static join against the corpus set table; in
  * the oracle-checked batch replay it is the same `verifyPairs` tail
  * the batch LSH join uses.
  *
  * Semantics pin: run in BATCH (everything in one micro-batch) with no
  * cap, the emitted candidate multiset is exactly the bucket
  * self-join's — all unordered pairs per bucket, once each — so the
  * full candidates → distinct → verify pipeline REPRODUCES
  * `minhashNearDupPairsPoly` row for row and inherits its DuckDB
  * oracle (`x2_stream_neardup`). Across micro-batches each pair is
  * emitted at most once per bucket (new×stored + new×new, never
  * stored×stored), and re-delivered (key, id) rows are no-ops —
  * StreamingSpec pins the two-batch replay.
  *
  * 100 TB: state size = Σ per-bucket ids inside the TTL window
  * (RocksDB-backed, off-heap), and `maxBucket` hard-bounds BOTH the
  * per-bucket state and the pair fan-out: a bucket admits at most
  * `maxBucket` member ids; every later arrival to a saturated bucket
  * is dropped and counted (via the optional `capped` accumulator),
  * exactly the df-cap postings trade from
  * [[graft.ops.Dedup.ngramJaccardPairsCapped]] — a band bucket hot
  * enough to saturate the cap is boilerplate (stopword-like band
  * values) whose pairs carry no near-dup signal, so the recall loss
  * is confined to pairs only discoverable through that one saturated
  * band (any OTHER shared band still surfaces them). With the cap,
  * per-bucket emission is ≤ maxBucket·(maxBucket−1)/2 over the bucket
  * lifetime and an arriving doc pays O(min(bucket, maxBucket)), never
  * O(corpus).
  */
object StatefulNearDup {

  final case class BandRow(key: String, doc_id: Long)
  final case class CandPair(id_a: Long, id_b: Long)

  /** @param ttlMillis state retention; <= 0 keeps buckets forever
    * @param maxBucket per-bucket member cap (drop-and-count past it)
    * @param capped    optional accumulator surfacing dropped arrivals */
  class CandidateProcessor(ttlMillis: Long,
      maxBucket: Int = Int.MaxValue,
      capped: Option[LongAccumulator] = None)
      extends StatefulProcessor[String, BandRow, CandPair] {
    @transient private var seen: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val ttl = if (ttlMillis > 0) TTLConfig(Duration.ofMillis(ttlMillis))
        else TTLConfig.NONE
      seen = getHandle.getListState[Long]("ids", Encoders.scalaLong, ttl)
    }

    private def ordered(a: Long, b: Long): CandPair =
      if (a < b) CandPair(a, b) else CandPair(b, a)

    override def handleInputRows(key: String, rows: Iterator[BandRow],
        timerValues: TimerValues): Iterator[CandPair] = {
      // sort + distinct for deterministic in-batch pair order; drop
      // re-delivered ids so replays cannot re-emit a stored pair
      val stored = if (seen.exists()) seen.get().toArray else Array.empty[Long]
      val storedSet = stored.toSet
      val arrived = rows.map(_.doc_id).toArray.distinct.sorted
        .filterNot(storedSet)
      // saturated-bucket drop: admit only up to the cap (in sorted
      // order, deterministic); the rest neither pair nor persist
      val room = math.max(maxBucket - stored.length, 0)
      val (fresh, dropped) = arrived.splitAt(math.min(room, arrived.length))
      if (dropped.nonEmpty) capped.foreach(_.add(dropped.length.toLong))
      val out = ArrayBuffer.empty[CandPair]
      for (n <- fresh; o <- stored) out += ordered(o, n)
      for (i <- fresh.indices; j <- i + 1 until fresh.length)
        out += CandPair(fresh(i), fresh(j))
      if (fresh.nonEmpty) seen.appendList(fresh)
      out.iterator
    }
  }

  /** Candidate pairs from a (streaming or batch-replayed) band-row
    * stream; `ttl` bounds bucket state in time (ZERO = keep forever),
    * `maxBucket` bounds it in size (drop-and-count past the cap —
    * see the class doc for the recall trade; `Int.MaxValue` keeps the
    * exact bucket-self-join semantics the batch oracle replays). Same
    * batch-execution note as [[StatefulDedup.dedup]]. */
  def candidates(bands: Dataset[BandRow], ttl: Duration,
      maxBucket: Int = Int.MaxValue,
      capped: Option[LongAccumulator] = None): Dataset[CandPair] = {
    import bands.sparkSession.implicits._
    if (!bands.isStreaming) bands.sparkSession.streams
    val mode = if (ttl.isZero || ttl.isNegative) TimeMode.None()
      else TimeMode.ProcessingTime()
    bands.groupByKey(_.key)
      .transformWithState(new CandidateProcessor(ttl.toMillis, maxBucket, capped),
        mode, OutputMode.Append())
  }
}
