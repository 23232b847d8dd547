package graft.queries

import graft.Tables._
import graft.sources.VersionedTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-12 batch 2: stats-pruned MERGE exercised END TO END inside
  * the driver gate — FULL-equality DuckDB oracle.
  *
  *  - `x1_merge_pruned`: build a KEY-CLUSTERED versioned table (four
  *    append commits, one per clustering-key band, each entry
  *    carrying the band's [min,max] stats), then MERGE an update
  *    batch confined to band 1 through `VersionedTable.mergePruned`.
  *    The pruning decision itself is hash-checked: the emitted
  *    `rewritten_groups` column must equal 1 — stats from THREE of
  *    the four log entries proved their groups disjoint from the
  *    batch and were carried by reference, and the final state read
  *    back through the log must equal the relational merge replay
  *    row-for-row. The clustering key `ck = (user_id % 4)·10⁶ +
  *    user_id` makes the bands range-disjoint at every scale factor
  *    (the layout a range-partitioned ingest produces naturally).
  *
  * Scale posture: pruned MERGE shuffles only the one touched group on
  * the merge key; the other groups move zero bytes (entry metadata
  * re-referenced). ScaleBench `vtable_prune` measures the consequence
  * — flat merge cost across a decade of table growth vs the full
  * rewrite's linear slope (SCALE.md).
  */
object Parity53 {
  type Q = (SparkSession, String) => DataFrame

  /** 2024-01-15T00:00:00Z in epoch nanos (the x1_time_travel cutoff). */
  private val CutoffNs = 1705276800000000000L

  val queries: Map[String, Q] = Map(
    "x1_merge_pruned" -> { (s, d) =>
      def state(ev: DataFrame): DataFrame = {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)
        ev.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_type").as("last_type"),
            col("value").as("last_value"))
          .withColumn("ck",
            pmod(col("user_id"), lit(4L)) * 1000000L + col("user_id"))
      }
      val ev = eventsNs(s, d)
      val pre = state(ev.filter(col("ts") <= CutoffNs))
      val path = java.nio.file.Files
        .createTempDirectory("vprune").toString
      var v = 0L
      (0L until 4L).foreach { b =>
        v = VersionedTable.commit(s, path,
          pre.filter(pmod(col("user_id"), lit(4L)) === b), v,
          statsCol = Some("ck"))
      }
      val updates = state(ev.filter(col("ts") > CutoffNs))
        .filter(pmod(col("user_id"), lit(4L)) === 1L)
      val (_, rewritten) =
        VersionedTable.mergePruned(s, path, updates, "ck")
      VersionedTable.read(s, path).get
        .select(col("user_id"), col("last_type"), col("last_value"))
        .withColumn("rewritten_groups", lit(rewritten).cast("long"))
        .orderBy(col("user_id"))
    })

  val oracles: Map[String, String] = Map(
    "x1_merge_pruned" ->
      s"""WITH ev AS (SELECT event_id, user_id, event_type, value,
             epoch_us(ts) * 1000 AS tsn FROM events),
         pre AS (SELECT user_id, event_type AS last_type,
             value AS last_value FROM (
             SELECT user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY tsn DESC, event_id DESC) AS rn
             FROM ev WHERE tsn <= $CutoffNs) WHERE rn = 1),
         upd AS (SELECT user_id, event_type AS last_type,
             value AS last_value FROM (
             SELECT user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY tsn DESC, event_id DESC) AS rn
             FROM ev WHERE tsn > $CutoffNs)
           WHERE rn = 1 AND user_id % 4 = 1),
         merged AS (
           SELECT user_id, last_type, last_value FROM pre
           WHERE user_id NOT IN (SELECT user_id FROM upd)
           UNION ALL
           SELECT user_id, last_type, last_value FROM upd)
         SELECT user_id, last_type, last_value,
           CAST(1 AS BIGINT) AS rewritten_groups
         FROM merged ORDER BY user_id"""
  )
}
