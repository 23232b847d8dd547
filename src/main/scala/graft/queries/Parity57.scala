package graft.queries

import graft.Tables._
import graft.ops.{Multimodal, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Round-12 batch 6: the remaining multimodal-curation pair plus the
  * data-constrained budget planner — all FULL-equality DuckDB oracles.
  *
  *  - `mm_video_fp`: video near-dup dedup, the third modality through
  *    the fingerprint machinery. Payloads are REAL Motion-PNG AVI
  *    containers (the same RIFF writer/parser as `mm_scene_cuts`);
  *    every frame is PNG-decoded, dHashed, and the per-frame hashes
  *    XOR-fold into one 63-bit signature — editing one frame flips
  *    only the bits that frame's dHash flipped (≤ 2 for the planted
  *    one-pixel retouch), unrelated videos scatter. Pairs come from
  *    the same 16-bit-chunk banded Hamming join as images and audio.
  *    The oracle recomputes per-frame dHashes from the pixel
  *    synthesis arithmetic and XOR-folds with `bit_xor`, then
  *    brute-forces n² — proving encode → AVI demux → PNG decode →
  *    dHash → fold → banding end to end.
  *
  *  - `mm_caption_align`: LAION-style image–text alignment filtering
  *    (the CLIP-score gate, reduced to a deterministic shared space).
  *    Images go through the REAL PNG decode to an 8-bin intensity
  *    histogram; captions are a bag of "b<bin>" tokens embedded into
  *    the same space by ordinary tokenize + aggregate; the score is
  *    the integer overlap coefficient (milli), thresholded at 900.
  *    Every 5th caption is planted to describe a DIFFERENT image —
  *    measured on this corpus aligned pairs score exactly 1000 and
  *    misalignments 187–437, so the gate separates cleanly. A
  *    production system swaps both featurizers for a joint-embedding
  *    model; the decode → featurize → join → score → threshold
  *    plumbing is the operator.
  *
  *  - `x7_epoch_plan`: data-constrained mixture allocation
  *    (Muennighoff et al., "Scaling Data-Constrained Language
  *    Models", arXiv:2305.16264, reduced to its allocator shape):
  *    given per-source token supply and a non-uniform target mixture
  *    (deterministic md5-hash weights, 50–200 milli-ish spread), each
  *    source's requested allocation is budget·w/Σw; allocations past
  *    the 4-epoch repeat ceiling (the paper's value-decay knee) are
  *    capped, and the stranded budget is redistributed one round
  *    proportional to remaining headroom, capped again. All integer
  *    DIVs — the whole plan replays bit-identically in SQL.
  *
  * Scale posture: mm_video_fp hashing is map-only (demux + decode per
  * payload partition) and candidates stay Σ bucket²-bounded, never
  * all-pairs. mm_caption_align is two media-keyed histogram
  * aggregates (both map-side combinable) and one (media_id, bin)
  * equi-join — at 100 TB the join carries ≤ 8 rows per media.
  * x7_epoch_plan collapses the scan to one row per source and runs
  * the allocator with unpartitioned windows on that tiny frame (the
  * doremi pattern — measured flat through the 100× tier).
  */
object Parity57 {
  type Q = (SparkSession, String) => DataFrame

  /** 4-epoch repeat ceiling and budget multiple for the planner. */
  private val EpochCapMilli = 4000L
  private val BudgetMult = 3L

  val queries: Map[String, Q] = Map(
    // ---- video near-dup fingerprint pairs --------------------------
    "mm_video_fp" -> { (s, d) =>
      val media = Multimodal.synthVariantVideos(s, documents(s, d))
      val fps = Multimodal.decodeVideoFp(s, media)
      Multimodal.phashNearDupPairs(fps, maxHamming = 3,
          idCol = "media_id", hashCol = "vfp")
        .orderBy(col("id_a"), col("id_b"))
    },

    // ---- image–caption alignment gate ------------------------------
    "mm_caption_align" -> { (s, d) =>
      val docs = documents(s, d)
      val hi = Multimodal.decodeHistogram(s, Multimodal.synthImages(s, docs))
      val hc = Multimodal.synthCaptions(s, docs)
        .select(col("media_id"),
          explode(TextOps.tokens(col("caption"))).as("tok"))
        .select(col("media_id"),
          expr("CAST(substring(tok, 2) AS BIGINT)").as("bin"))
        .groupBy("media_id", "bin").agg(count(lit(1)).as("cap_cnt"))
      hi.join(hc, Seq("media_id", "bin"), "full_outer")
        .groupBy("media_id")
        .agg(
          sum(least(coalesce(col("img_cnt"), lit(0L)),
            coalesce(col("cap_cnt"), lit(0L)))).as("inter"),
          sum(coalesce(col("img_cnt"), lit(0L))).as("n_img"),
          sum(coalesce(col("cap_cnt"), lit(0L))).as("n_cap"))
        .select(col("media_id"),
          expr("CAST((inter * 1000) DIV greatest(n_img, n_cap) AS BIGINT)")
            .as("score_milli"))
        .withColumn("aligned", (col("score_milli") >= 900).cast(LongType))
        .orderBy("media_id")
    },

    // ---- data-constrained epoch/mixture allocation -----------------
    "x7_epoch_plan" -> { (s, d) =>
      documents(s, d).groupBy("source")
        .agg(expr("CAST(sum(n_chars) DIV 4 AS BIGINT)").as("toks"))
        .withColumn("w_tgt", TextOps.polyHash60(col("source")) % 151 + 50)
        .withColumn("budget", expr(s"$BudgetMult * (sum(toks) OVER ())"))
        .withColumn("alloc",
          expr("(budget * w_tgt) DIV (sum(w_tgt) OVER ())"))
        .withColumn("cap", expr(s"($EpochCapMilli * toks) DIV 1000"))
        .withColumn("base", least(col("alloc"), col("cap")))
        .withColumn("capped", (col("alloc") > col("cap")).cast(LongType))
        .withColumn("extra",
          expr("""((sum(alloc - base) OVER ()) * (cap - base))
                 DIV greatest(sum(cap - base) OVER (), 1)"""))
        .withColumn("final_alloc", least(col("cap"), col("base") + col("extra")))
        .withColumn("epochs_milli",
          expr("(final_alloc * 1000) DIV greatest(toks, 1)"))
        .select(col("source"), col("toks"), col("w_tgt").cast(LongType).as("w_tgt"),
          col("alloc").cast(LongType).as("alloc"), col("capped"),
          col("final_alloc").cast(LongType).as("final_alloc"),
          col("epochs_milli").cast(LongType).as("epochs_milli"))
        .orderBy("source")
    })

  /** DuckDB replay of `TextOps.polyHash60` (the Parity20/55 idiom). */
  private def hx15(e: String): String = OracleSql.hx15(e)

  val oracles: Map[String, String] = Map(
    "mm_video_fp" ->
      """WITH d AS (SELECT doc_id FROM documents),
         vids AS (
           SELECT doc_id*2 AS mid, doc_id AS src, 0 AS tweak FROM d
           UNION ALL
           SELECT doc_id*2+1,
             CASE WHEN doc_id % 3 = 0 THEN doc_id
                  ELSE doc_id + 1000000 END,
             CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
           FROM d),
         js AS (SELECT CAST(unnest(generate_series(0, 3)) AS BIGINT) AS j),
         xs AS (SELECT CAST(unnest(generate_series(0, 8)) AS BIGINT) AS x),
         ys AS (SELECT CAST(unnest(generate_series(0, 7)) AS BIGINT) AS y),
         gc AS (SELECT v.mid, v.src, v.tweak, js.j, xs.x, ys.y,
             least(xs.x, 7) AS gx, least(ys.y, 5) AS gy
           FROM vids v CROSS JOIN js CROSS JOIN xs CROSS JOIN ys),
         g AS (SELECT mid, j, x, y,
             ((((src*31 + j*977 + gx*131 + gy*1009 + 7) % 65536) *
               ((src*31 + j*977 + gx*131 + gy*1009 + 7) % 65536) // 64)
               % 256
              + CASE WHEN tweak = 1 AND j = 0 AND gx = 1 AND gy = 1
                THEN 1 ELSE 0 END) % 256 AS v
           FROM gc),
         bits AS (SELECT g1.mid, g1.j, g1.y, g1.x,
             CASE WHEN g2.v > g1.v THEN 1 ELSE 0 END AS b
           FROM g g1 JOIN g g2 ON g1.mid = g2.mid AND g1.j = g2.j
             AND g2.y = g1.y AND g2.x = g1.x + 1
           WHERE g1.x < 8 AND NOT (g1.x = 7 AND g1.y = 7)),
         fh AS (SELECT mid, j, CAST(sum(b *
             (1::BIGINT << CAST(y*8 + x AS INTEGER))) AS BIGINT) AS dh
           FROM bits GROUP BY mid, j),
         h AS (SELECT mid, CAST(bit_xor(dh) AS BIGINT) AS vfp
           FROM fh GROUP BY mid)
         SELECT a.mid AS id_a, b.mid AS id_b,
           CAST(bit_count(xor(a.vfp, b.vfp)) AS BIGINT) AS hamming
         FROM h a JOIN h b ON a.mid < b.mid
         WHERE bit_count(xor(a.vfp, b.vfp)) <= 3
         ORDER BY id_a, id_b""",
    "mm_caption_align" ->
      """WITH d AS (SELECT doc_id AS id FROM documents),
         xs AS (SELECT CAST(unnest(generate_series(0, 12)) AS BIGINT) AS x),
         ys AS (SELECT CAST(unnest(generate_series(0, 8)) AS BIGINT) AS y),
         img AS (SELECT id, ((id*31 + x*7 + y*13) % 256) // 32 AS b
           FROM d CROSS JOIN xs CROSS JOIN ys
           WHERE x < 8 + id % 5 AND y < 6 + id % 3),
         hi AS (SELECT id, b, CAST(count(*) AS BIGINT) AS c
           FROM img GROUP BY id, b),
         cap0 AS (SELECT id,
             CASE WHEN id % 5 = 0 THEN id + 1000000 ELSE id END AS did
           FROM d),
         capx AS (SELECT c0.id, ((did*31 + x*7 + y*13) % 256) // 32 AS b
           FROM cap0 c0 CROSS JOIN xs CROSS JOIN ys
           WHERE x < 8 + did % 5 AND y < 6 + did % 3),
         hc AS (SELECT id, b, CAST(count(*) AS BIGINT) AS c
           FROM capx GROUP BY id, b),
         j AS (SELECT COALESCE(hi.id, hc.id) AS id,
             sum(least(COALESCE(hi.c, 0), COALESCE(hc.c, 0))) AS inter,
             sum(COALESCE(hi.c, 0)) AS n_img,
             sum(COALESCE(hc.c, 0)) AS n_cap
           FROM hi FULL JOIN hc ON hi.id = hc.id AND hi.b = hc.b
           GROUP BY 1)
         SELECT id AS media_id,
           CAST((inter * 1000) // greatest(n_img, n_cap) AS BIGINT)
             AS score_milli,
           CAST((inter * 1000) // greatest(n_img, n_cap) >= 900 AS BIGINT)
             AS aligned
         FROM j ORDER BY media_id""",
    "x7_epoch_plan" ->
      s"""WITH s AS (SELECT source,
             CAST(sum(n_chars) // 4 AS BIGINT) AS toks
           FROM documents GROUP BY source),
         w AS (SELECT source, toks, (${hx15("source")}) % 151 + 50 AS w_tgt,
             3 * (sum(toks) OVER ()) AS budget FROM s),
         a AS (SELECT *, (budget * w_tgt) // (sum(w_tgt) OVER ()) AS alloc,
             (4000 * toks) // 1000 AS cap FROM w),
         b AS (SELECT *, least(alloc, cap) AS base,
             CAST(alloc > cap AS BIGINT) AS capped FROM a),
         r AS (SELECT *, ((sum(alloc - base) OVER ()) * (cap - base))
               // greatest(sum(cap - base) OVER (), 1) AS extra FROM b),
         f AS (SELECT source, toks, w_tgt, alloc, capped,
             least(cap, base + extra) AS final_alloc, toks AS t FROM r)
         SELECT source, toks, CAST(w_tgt AS BIGINT) AS w_tgt,
           CAST(alloc AS BIGINT) AS alloc, capped,
           CAST(final_alloc AS BIGINT) AS final_alloc,
           CAST((final_alloc * 1000) // greatest(t, 1) AS BIGINT)
             AS epochs_milli
         FROM f ORDER BY source"""
  )
}
