package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 batch 13: the real audio decode path — FULL-equality
  * DuckDB oracle.
  *
  *  - `mm_audio`: synthesize deterministic 16-bit mono PCM WAV
  *    payloads (real RIFF containers), parse them back with the pure
  *    JDK decoder (`Multimodal.decodeWavPcm16` — header validation +
  *    little-endian sample decode), and emit exact integer audio
  *    features: sample count, header-derived duration, Σ|s|, energy
  *    Σs², zero crossings. The oracle recomputes every feature from
  *    the synthesis formula ALONE — agreement proves the encode →
  *    WAV bytes → header parse → sample decode → aggregate chain
  *    bit-exact, the same contract as the PNG image path
  *    (mm_features). This replaces the byte-fold fallback for audio:
  *    the stated "audio stays opaque" limitation is closed for the
  *    one container a JVM parses codec-free.
  *
  * Scale posture: identical to the image path — the decode runs in
  * `mapPartitions` (per-partition setup amortized), features are
  * map-only per payload, and everything downstream is the usual
  * keyed relational algebra over BIGINT features.
  */
object Parity44 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "mm_audio" -> { (s, d) =>
      val media = graft.ops.Multimodal.synthAudio(s, documents(s, d))
      graft.ops.Multimodal.decodeAudioStats(s, media).toDF()
        .orderBy(col("media_id"))
    })

  val oracles: Map[String, String] = Map(
    "mm_audio" ->
      """WITH d AS (SELECT doc_id,
             CAST(64 + doc_id % 64 AS BIGINT) AS n FROM documents),
         i AS (SELECT CAST(unnest(generate_series(0, 127)) AS BIGINT)
             AS i),
         sm AS (SELECT d.doc_id, d.n, i.i,
             (d.doc_id * 31 + i.i * 17) % 2048 - 1024 AS v
           FROM d CROSS JOIN i WHERE i.i < d.n),
         zc AS (SELECT doc_id, i, v,
             lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
           FROM sm)
         SELECT doc_id AS media_id, n AS n_samples,
           CAST(n * 1000 // 8000 AS BIGINT) AS duration_ms,
           CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
           CAST(sum(v * v) AS BIGINT) AS energy,
           CAST(sum(CASE WHEN pv IS NOT NULL
             AND ((pv < 0) <> (v < 0)) THEN 1 ELSE 0 END) AS BIGINT)
             AS zero_cross
         FROM zc JOIN d USING (doc_id)
         GROUP BY doc_id, n ORDER BY media_id"""
  )
}
