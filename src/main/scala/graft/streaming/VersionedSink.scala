package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.VersionedTable

/** Structured Streaming sink INTO the versioned table — the
  * streaming-ingest-to-lake closure: each micro-batch commits as one
  * append version through the same optimistic protocol every batch
  * writer uses, with EXACTLY-ONCE effect per batch.
  *
  * Exactly-once, minimum viable form (the Delta streaming-sink idea):
  * the commit entry is tagged with the micro-batch id. Structured
  * Streaming re-runs a FAILED batch with the SAME batchId after
  * recovery, so the sink checks the HEAD entry's tag before
  * committing — a retry of an already-committed batch is a no-op
  * (prior batches are known-committed by the sink's own sequencing,
  * so head inspection is the sufficient check; a lost commit race
  * against a concurrent writer retries at the new head like any
  * writer). Appends carry per-group key stats when `statsCol` is
  * set, so downstream [[graft.sources.VersionedTable.mergePruned]]
  * keeps pruning over streamed-in groups.
  *
  * Use with `writeStream.foreachBatch(VersionedSink.into(path))` —
  * foreachBatch is the documented Structured Streaming seam for
  * sinks with their own transactional story.
  *
  * Scale posture: one parquet group + one tiny JSON per micro-batch;
  * the small-file accumulation this produces is exactly what
  * [[graft.sources.VersionedTable.optimize]] compacts, and
  * `expireVersions` + `vacuum` bound the log and dead storage.
  */
object VersionedSink {

  /** Idempotently append one micro-batch as a table version. Returns
    * the (existing or new) version holding this batch. */
  def appendBatch(spark: SparkSession, path: String, df: DataFrame,
      batchId: Long, statsCol: Option[String] = None): Long = {
    val head = VersionedTable.currentVersion(spark, path)
    if (VersionedTable.headBatchId(spark, path).contains(batchId)) head
    else VersionedTable.commit(spark, path, df, head,
      statsCol = statsCol, batchId = Some(batchId))
  }

  /** foreachBatch adapter: `writeStream.foreachBatch(into(path))`. */
  def into(path: String, statsCol: Option[String] = None)
      : (DataFrame, Long) => Unit = { (df, batchId) =>
    appendBatch(df.sparkSession, path, df, batchId, statsCol)
    ()
  }
}
