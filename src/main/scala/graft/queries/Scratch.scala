package graft.queries

import org.apache.spark.sql.SparkSession

/** Shared scratch-directory helpers for the stateful load-path /
  * table-protocol replay queries (Parity60/62/63) — one copy of the
  * naming scheme and the recursive cleanup, for the same
  * edited-once reason as [[OracleSql]].
  */
private[queries] object Scratch {

  /** Deterministic per-(family, tag, data-dir) scratch path —
    * re-running the same query against the same sf dir reuses (and
    * overwrites) one directory; different sf dirs never collide.
    * Unsigned-hex encoding of the hash avoids the `math.abs`
    * Int.MinValue edge the per-file copies had. */
  def dir(family: String, tag: String, d: String): String =
    f"target/${family}_${tag}_${d.hashCode & 0xffffffffL}%08x"

  /** Recursive delete — fresh state for stateful load replays. */
  def clean(s: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (f.exists(p)) f.delete(p, true)
  }
}
