package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative operators (connected components,
  * k-means, PQ codebook training): each round's result must cut the
  * exponentially growing plan or the optimizer re-walks the whole
  * history every iteration.
  *
  * Two modes:
  *  - `checkpointDir = None` (default): `localCheckpoint` — executor-
  *    local blocks, fastest, the right choice for a single-JVM
  *    sandbox or short-lived jobs. NOT fault-tolerant: losing an
  *    executor loses the blocks and the lineage needed to recompute
  *    them is gone.
  *  - `checkpointDir = Some(dir)`: RELIABLE checkpoint — materialized
  *    to the (typically HDFS/S3) directory, survives executor loss.
  *    The 100 TB posture for long iterative jobs; costs a
  *    write+read per round.
  */
private[graft] object Iter {

  def truncate(df: DataFrame, checkpointDir: Option[String]): DataFrame =
    checkpointDir match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        // setCheckpointDir appends a UUID subdir; only (re)set when
        // the configured root changes
        if (!sc.getCheckpointDir.exists(_.contains(dir))) {
          sc.setCheckpointDir(dir)
        }
        // RDD checkpointing runs TWO jobs over the plan (materialize,
        // then write); persist first so the write pass reads cached
        // partitions instead of recomputing the round's joins — this
        // also keeps convergence accumulators single-counted
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // capStats: Spark copies the ORIGIN plan's statistics through
        // the checkpoint, so iterative self-joins square sizeInBytes
        // every round — by round ~25 the stats visitor grinds on
        // million-digit BigIntegers; capping bounds the product while
        // keeping small-state broadcast planning (see Bridge.capStats)
        try org.apache.spark.sql.graft.Bridge.capStats(
          df.checkpoint(eager = true))
        finally df.unpersist(blocking = false)
      case None =>
        org.apache.spark.sql.graft.Bridge.capStats(
          df.localCheckpoint(eager = true))
    }

  /** Order-independent 64-bit mix for edge-set checksums accumulated
    * across tasks (Java long addition wraps, so per-row mixes sum to
    * a stable commutative checksum). */
  def mix(a: Long, b: Long): Long = {
    var x = a * 0x9E3779B97F4A7C15L + (b ^ 0xC2B2AE3D27D4EB4FL)
    x ^= (x >>> 31)
    x * 0xFF51AFD7ED558CCDL
  }
}
