package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-11 batch 14: the video pipeline shape — FULL-equality
  * DuckDB oracle.
  *
  *  - `mm_scene_cuts`: demux the synthetic frame container, decode
  *    every frame with the REAL PNG codec, and detect shot
  *    boundaries relationally — per-frame luminance from the decode,
  *    a lag window for the inter-frame diff, cuts where the diff is
  *    non-zero. The synthesis plants exactly one formula shift per
  *    video (frames are static inside a scene), so ground truth is
  *    arithmetic: the oracle recomputes per-frame luminance — mod-256
  *    wraparound and all — from the pixel formula alone and replays
  *    the diff chain. The container is a REAL standard one since
  *    round 12: Motion-PNG-in-AVI (RIFF chunk grammar, hdrl/movi/idx1
  *    structure), demuxed by a generic RIFF walker — the same
  *    credibility bar as the WAV audio path; the pipeline shape —
  *    demux → frame decode → per-frame features → temporal diff — is
  *    the production shot-boundary job end to end.
  *
  * Scale posture: demux+decode is mapPartitions over payloads
  * (per-partition codec setup); per-frame rows are (videos × frames)
  * — the temporal window partitions by media_id, so the shuffle is
  * media-keyed and scenes never cross executors.
  */
object Parity45 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "mm_scene_cuts" -> { (s, d) =>
      val media = graft.ops.Multimodal.synthVideos(s, documents(s, d))
      val frames = graft.ops.Multimodal.decodeFrameStats(s, media).toDF()
      val w = Window.partitionBy(col("media_id")).orderBy(col("frame_idx"))
      val diffs = frames
        .withColumn("prev_lum", lag(col("lum_sum"), 1).over(w))
        .withColumn("diff",
          when(col("prev_lum").isNotNull,
            abs(col("lum_sum") - col("prev_lum"))))
        .withColumn("is_cut",
          when(col("diff").isNotNull && col("diff") > 0, 1L).otherwise(0L))
      diffs.groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(col("is_cut")).as("n_cuts"),
          min(when(col("is_cut") === 1, col("frame_idx")))
            .cast("long").as("cut_at"),
          sum(col("lum_sum")).as("lum_total"))
        .orderBy(col("media_id"))
    })

  val oracles: Map[String, String] = Map(
    "mm_scene_cuts" ->
      """WITH d AS (SELECT doc_id,
             CAST(4 + doc_id % 4 AS BIGINT) AS nf,
             CAST(1 + doc_id % (4 + doc_id % 4 - 1) AS BIGINT) AS cut
           FROM documents),
         j AS (SELECT CAST(unnest(generate_series(0, 6)) AS BIGINT) AS j),
         xs AS (SELECT CAST(unnest(generate_series(0, 7)) AS BIGINT) AS x),
         ys AS (SELECT CAST(unnest(generate_series(0, 5)) AS BIGINT) AS y),
         px AS (SELECT d.doc_id, d.nf, d.cut, j.j, xs.x, ys.y,
             ((d.doc_id * 31 + xs.x * 7 + ys.y * 13) % 256 +
               CASE WHEN j.j >= d.cut THEN 50 ELSE 0 END) % 256 AS v
           FROM d CROSS JOIN j CROSS JOIN xs CROSS JOIN ys
           WHERE j.j < d.nf),
         fl AS (SELECT doc_id, j, CAST(sum(v) AS BIGINT) AS lum
           FROM px GROUP BY doc_id, j),
         df AS (SELECT doc_id, j, lum,
             lag(lum) OVER (PARTITION BY doc_id ORDER BY j) AS pl
           FROM fl),
         cuts AS (SELECT doc_id, j, lum,
             CASE WHEN pl IS NOT NULL AND abs(lum - pl) > 0 THEN 1
               ELSE 0 END AS is_cut
           FROM df)
         SELECT doc_id AS media_id, CAST(count(*) AS BIGINT) AS n_frames,
           CAST(sum(is_cut) AS BIGINT) AS n_cuts,
           CAST(min(CASE WHEN is_cut = 1 THEN j END) AS BIGINT) AS cut_at,
           CAST(sum(lum) AS BIGINT) AS lum_total
         FROM cuts GROUP BY doc_id ORDER BY media_id"""
  )
}
