package graft.streaming

import java.time.Duration

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues}

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
  * Semantics pin: run in BATCH (everything in one micro-batch), the
  * emitted candidate multiset is exactly the bucket self-join's —
  * all unordered pairs per bucket, once each — so the full
  * candidates → distinct → verify pipeline REPRODUCES
  * `minhashNearDupPairsPoly` row for row and inherits its DuckDB
  * oracle (`x2_stream_neardup`). Across micro-batches each pair is
  * emitted at most once per bucket (new×stored + new×new, never
  * stored×stored), and re-delivered (key, id) rows are no-ops —
  * StreamingSpec pins the two-batch replay.
  *
  * 100 TB: state size = Σ per-bucket ids inside the TTL window
  * (RocksDB-backed, off-heap); a hot boilerplate bucket makes its
  * list long and its pair fan-out quadratic — the same hot-band skew
  * the batch path has, with the same mitigations (more bands / rows
  * per band, stop-shingle prefilter upstream). Emission is
  * incremental: a new doc pays O(bucket size), not O(corpus).
  */
object StatefulNearDup {

  final case class BandRow(key: String, doc_id: Long)
  final case class CandPair(id_a: Long, id_b: Long)

  class CandidateProcessor(ttlMillis: Long)
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
      val fresh = rows.map(_.doc_id).toArray.distinct.sorted
        .filterNot(storedSet)
      val out = ArrayBuffer.empty[CandPair]
      for (n <- fresh; o <- stored) out += ordered(o, n)
      for (i <- fresh.indices; j <- i + 1 until fresh.length)
        out += CandPair(fresh(i), fresh(j))
      if (fresh.nonEmpty) seen.appendList(fresh)
      out.iterator
    }
  }

  /** Candidate pairs from a (streaming or batch-replayed) band-row
    * stream; `ttl` bounds bucket state (ZERO = keep forever). Same
    * batch-execution note as [[StatefulDedup.dedup]]. */
  def candidates(bands: Dataset[BandRow], ttl: Duration): Dataset[CandPair] = {
    import bands.sparkSession.implicits._
    if (!bands.isStreaming) bands.sparkSession.streams
    val mode = if (ttl.isZero || ttl.isNegative) TimeMode.None()
      else TimeMode.ProcessingTime()
    bands.groupByKey(_.key)
      .transformWithState(new CandidateProcessor(ttl.toMillis),
        mode, OutputMode.Append())
  }
}
