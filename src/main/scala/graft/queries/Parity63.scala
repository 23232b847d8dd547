package graft.queries

import graft.Tables._
import graft.sources.VersionedTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 batch 2: the versioned table's MAINTENANCE half in the
  * driver gate. `x1_versioned_merge` / `x1_merge_pruned` /
  * `x1_time_travel` already hash-check the WRITE protocol; these two
  * rows replay the table-keeping jobs a production lakehouse runs on
  * a schedule (the Delta OPTIMIZE / VACUUM pair), same in-query
  * template: build the table fresh in a scratch dir, run the
  * maintenance op, and emit values a stateless DuckDB query must
  * reproduce.
  *
  *  - `x1_optimize_roundtrip`: four small append commits (the
  *    small-file state every incremental load accumulates) →
  *    OPTIMIZE (read snapshot, rewrite at target size, commit as
  *    replace) → read back. Content must be IDENTICAL through the
  *    rewrite (hash-checked), the optimized commit must be version 5,
  *    and the planned file count 1 (targetBytes far above the data).
  *  - `x1_vacuum_orphans`: two committed groups + one PLANTED orphan
  *    (staged parquet never published — the debris a writer crash
  *    between staging and commit leaves) → vacuum with a zero fence →
  *    exactly the orphan reclaimed, both live groups intact, content
  *    unchanged.
  *
  * Scale posture: optimize reads each live group once and writes
  * ceil(bytes/target) files — one job whose output partitioning IS
  * the desired layout (the Sinks.compact claim, through the commit
  * protocol so a lost race surfaces as CommitConflictException, not
  * a clobber). Vacuum is pure metadata: one log fold for the
  * referenced set + one directory listing; deletes never touch
  * referenced groups, so time travel stays intact (VersionedTableSpec
  * pins the fence + referenced-set semantics).
  */
object Parity63 {
  type Q = (SparkSession, String) => DataFrame

  private def scratch(tag: String, d: String): String =
    Scratch.dir("vtm", tag, d)

  private def clean(s: SparkSession, path: String): Unit =
    Scratch.clean(s, path)

  val queries: Map[String, Q] = Map(
    // ---- OPTIMIZE round trip ---------------------------------------
    "x1_optimize_roundtrip" -> { (s, d) =>
      val target = scratch("opt", d)
      clean(s, target)
      val src = orders(s, d).filter(col("o_orderkey") % 300 === 0)
        .select(col("o_orderkey"), col("o_totalprice"))
      var v = 0L
      (0 until 4).foreach { i =>
        v = VersionedTable.commit(s, target,
          src.filter(expr("(o_orderkey DIV 300) % 4") === i), v)
      }
      // 1 TiB target >> data: the rewrite plans exactly one file
      val (ov, nFiles) = VersionedTable.optimize(s, target,
        targetBytes = 1L << 40)
      VersionedTable.read(s, target).get
        .orderBy(col("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .withColumn("opt_version", lit(ov))
        .withColumn("n_files", lit(nFiles))
    },

    // ---- VACUUM orphan reclaim -------------------------------------
    "x1_vacuum_orphans" -> { (s, d) =>
      val target = scratch("vac", d)
      clean(s, target)
      val src = orders(s, d).filter(col("o_orderkey") % 600 === 0)
        .select(col("o_orderkey"), col("o_totalprice"))
      val v1 = VersionedTable.commit(s, target,
        src.filter(expr("(o_orderkey DIV 600) % 2") === 0), 0L)
      VersionedTable.commit(s, target,
        src.filter(expr("(o_orderkey DIV 600) % 2") === 1), v1)
      // plant the crash debris: a staged group no log entry references
      src.limit(3).write.mode("overwrite")
        .parquet(s"$target/data/orphan-planted")
      val reclaimed = VersionedTable.vacuum(s, target, minAgeMs = 0L)
      val dataDir = new org.apache.hadoop.fs.Path(s"$target/data")
      val nGroups = dataDir
        .getFileSystem(s.sparkContext.hadoopConfiguration)
        .listStatus(dataDir).count(_.isDirectory).toLong
      VersionedTable.read(s, target).get
        .orderBy(col("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .withColumn("n_reclaimed", lit(reclaimed.size.toLong))
        .withColumn("n_groups", lit(nGroups))
    })

  val oracles: Map[String, String] = Map(
    "x1_optimize_roundtrip" ->
      """SELECT o_orderkey, o_totalprice,
           CAST(5 AS BIGINT) AS opt_version, CAST(1 AS BIGINT) AS n_files
         FROM orders WHERE o_orderkey % 300 = 0
         ORDER BY o_orderkey""",
    "x1_vacuum_orphans" ->
      """SELECT o_orderkey, o_totalprice,
           CAST(1 AS BIGINT) AS n_reclaimed, CAST(2 AS BIGINT) AS n_groups
         FROM orders WHERE o_orderkey % 600 = 0
         ORDER BY o_orderkey"""
  )
}
