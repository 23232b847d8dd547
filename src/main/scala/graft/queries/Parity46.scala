package graft.queries

import graft.Tables._
import graft.sources.VersionedTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-11 batch 15: the versioned-table commit protocol exercised
  * END TO END inside the driver gate — FULL-equality DuckDB oracle.
  *
  *  - `x1_versioned_merge`: build a versioned table from the
  *    pre-cutoff per-user state (commit v1), MERGE the post-cutoff
  *    changes (commit v2 through the optimistic protocol — staged
  *    uuid file group, atomic log create, keyed anti-join rewrite),
  *    then read BOTH versions back through the log-resolved reader
  *    and emit the per-user before/after comparison. The oracle
  *    replays the same state relationally (latest-per-user before
  *    the cutoff, merged with latest-per-user after), so the
  *    hash-compare proves the whole protocol — stage, commit, log
  *    resolution, time travel, merge semantics — produces exactly
  *    the relational answer. The physical table lives in a
  *    per-invocation temp dir (content is deterministic; the path is
  *    scaffolding).
  *
  * Scale posture: the MERGE is the ledger's keyed anti-join — one
  * shuffle on the merge key — plus metadata-sized log I/O; reads
  * resolve the log (tiny JSON) and scan only live parquet groups,
  * keeping every pushdown property.
  */
object Parity46 {
  type Q = (SparkSession, String) => DataFrame

  /** 2024-01-15T00:00:00Z in epoch nanos (the x1_time_travel cutoff). */
  private val CutoffNs = 1705276800000000000L

  val queries: Map[String, Q] = Map(
    "x1_versioned_merge" -> { (s, d) =>
      def latestState(ev: DataFrame): DataFrame = {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)
        ev.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_type").as("last_type"),
            col("value").as("last_value"))
      }
      val ev = eventsNs(s, d)
      val path = java.nio.file.Files
        .createTempDirectory("vmerge").toString
      val v1 = VersionedTable.commit(s, path,
        latestState(ev.filter(col("ts") <= CutoffNs)), 0L)
      VersionedTable.merge(s, path,
        latestState(ev.filter(col("ts") > CutoffNs)), "user_id")
      val before = VersionedTable.read(s, path, Some(v1)).get
        .select(col("user_id"), col("last_type").as("type_before"),
          col("last_value").as("value_before"))
      val after = VersionedTable.read(s, path).get
        .select(col("user_id"), col("last_type").as("type_after"),
          col("last_value").as("value_after"))
      before.join(after, Seq("user_id"), "full_outer")
        .select(col("user_id"), col("type_before"), col("value_before"),
          col("type_after"), col("value_after"),
          when(col("type_before").isNull, "inserted")
            .when(col("type_before") === col("type_after") &&
              col("value_before") === col("value_after"), "carried")
            .otherwise("updated").as("change"))
        .orderBy(col("user_id"))
    })

  val oracles: Map[String, String] = Map(
    "x1_versioned_merge" ->
      s"""WITH ev AS (SELECT event_id, user_id, event_type, value,
             epoch_us(ts) * 1000 AS tsn FROM events),
         bf AS (SELECT user_id, event_type AS type_before,
             value AS value_before FROM (
             SELECT user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY tsn DESC, event_id DESC) AS rn
             FROM ev WHERE tsn <= $CutoffNs) WHERE rn = 1),
         af0 AS (SELECT user_id, event_type AS type_after,
             value AS value_after FROM (
             SELECT user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY tsn DESC, event_id DESC) AS rn
             FROM ev WHERE tsn > $CutoffNs) WHERE rn = 1),
         af AS (SELECT coalesce(a.user_id, b.user_id) AS user_id,
             coalesce(a.type_after, b.type_before) AS type_after,
             coalesce(a.value_after, b.value_before) AS value_after
           FROM af0 a FULL OUTER JOIN bf b ON a.user_id = b.user_id)
         SELECT af.user_id, bf.type_before, bf.value_before,
           af.type_after, af.value_after,
           CASE WHEN bf.type_before IS NULL THEN 'inserted'
                WHEN bf.type_before = af.type_after AND
                  bf.value_before = af.value_after THEN 'carried'
                ELSE 'updated' END AS change
         FROM af LEFT JOIN bf ON af.user_id = bf.user_id
         ORDER BY af.user_id"""
  )
}
