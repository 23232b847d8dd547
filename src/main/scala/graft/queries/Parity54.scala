package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 batch 3: perceptual image dedup — FULL-equality DuckDB
  * oracle.
  *
  *  - `mm_phash_pairs`: byte-exact image dedup (`mm_dedup`, md5 over
  *    the payload) misses re-encoded or retouched duplicates; this is
  *    the production perceptual-hash path. A variant corpus plants,
  *    per document, a base image and either a NEAR-DUP (one pixel
  *    bumped — at most two dHash comparison bits move) or a
  *    structurally different image; every payload is REALLY encoded
  *    and decoded through the JDK PNG codec, dHash63 reads the
  *    decoded raster on a clamped 9×8 grid, and near-dup pairs come
  *    from the 16-bit-chunk candidate equi-join (complete for
  *    Hamming ≤ 3 by pigeonhole — the SimHash argument) + the exact
  *    Hamming filter. The oracle recomputes the hashes from the
  *    pixel-synthesis arithmetic alone and brute-forces all pairs, so
  *    agreement proves encode → PNG → decode → grid → hash → banded
  *    join end to end, and proves the banding lost nothing vs n².
  *
  * Scale posture: hashing is map-only over payload partitions
  * (per-partition codec setup); candidates are an equi-join on
  * (chunk index, chunk value) — Σ bucket² work, never all-pairs —
  * and the exact filter touches candidates only. The same shape runs
  * at billions of images; the oracle's n² exists only as small-scale
  * ground truth.
  */
object Parity54 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "mm_phash_pairs" -> { (s, d) =>
      val media = graft.ops.Multimodal.synthVariantImages(s, documents(s, d))
      val hashes = graft.ops.Multimodal.decodeDHash(s, media)
      graft.ops.Multimodal.phashNearDupPairs(hashes, maxHamming = 3)
        .orderBy(col("id_a"), col("id_b"))
    })

  val oracles: Map[String, String] = Map(
    "mm_phash_pairs" ->
      """WITH d AS (SELECT doc_id FROM documents),
         imgs AS (
           SELECT doc_id*2 AS mid, doc_id AS src, 0 AS tweak FROM d
           UNION ALL
           SELECT doc_id*2+1,
             CASE WHEN doc_id % 3 = 0 THEN doc_id
                  ELSE doc_id + 1000000 END,
             CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
           FROM d),
         xs AS (SELECT CAST(unnest(generate_series(0, 8)) AS BIGINT) AS x),
         ys AS (SELECT CAST(unnest(generate_series(0, 7)) AS BIGINT) AS y),
         gc AS (SELECT i.mid, i.src, i.tweak, xs.x, ys.y,
             least(xs.x, 8 + i.src % 5 - 1) AS gx,
             least(ys.y, 6 + i.src % 3 - 1) AS gy
           FROM imgs i CROSS JOIN xs CROSS JOIN ys),
         g AS (SELECT mid, x, y,
             ((((src*31 + gx*131 + gy*1009 + 7) % 65536) *
               ((src*31 + gx*131 + gy*1009 + 7) % 65536) // 64) % 256
              + CASE WHEN tweak = 1 AND gx = 1 AND gy = 1
                THEN 1 ELSE 0 END) % 256 AS v
           FROM gc),
         bits AS (SELECT g1.mid, g1.y, g1.x,
             CASE WHEN g2.v > g1.v THEN 1 ELSE 0 END AS b
           FROM g g1 JOIN g g2 ON g1.mid = g2.mid AND g2.y = g1.y
             AND g2.x = g1.x + 1
           WHERE g1.x < 8 AND NOT (g1.x = 7 AND g1.y = 7)),
         h AS (SELECT mid, CAST(sum(b *
             (1::BIGINT << CAST(y*8 + x AS INTEGER))) AS BIGINT) AS dh
           FROM bits GROUP BY mid)
         SELECT a.mid AS id_a, b.mid AS id_b,
           CAST(bit_count(xor(a.dh, b.dh)) AS BIGINT) AS hamming
         FROM h a JOIN h b ON a.mid < b.mid
         WHERE bit_count(xor(a.dh, b.dh)) <= 3
         ORDER BY id_a, id_b"""
  )
}
