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
    * Keyed on the first 16 hex chars of md5(path), not the 32-bit
    * String.hashCode (round-13 advice): two distinct sf dirs
    * colliding on hashCode would silently clean/overwrite each
    * other's scratch state. */
  def dir(family: String, tag: String, d: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8"))
    s"target/${family}_${tag}_${md.take(8).map(b => f"$b%02x").mkString}"
  }

  /** Recursive delete — fresh state for stateful load replays. */
  def clean(s: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (f.exists(p)) f.delete(p, true)
  }
}
