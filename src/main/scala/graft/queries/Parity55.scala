package graft.queries

import graft.Tables._
import graft.ops.TextOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Round-12 batch 4: importance resampling, acoustic near-dup, outer
  * attribution — all FULL-equality DuckDB oracles.
  *
  *  - `x7_dsir_sample`: DSIR-shaped data selection via hashed n-gram
  *    importance weights (Xie et al.'s "Data Selection for Language
  *    Models via Importance Resampling", arXiv:2302.03169, reduced to
  *    its pipeline shape): featurize every document into hashed
  *    unigram buckets (`polyHash60 % 256` — the engine-portable
  *    hash), estimate the TARGET distribution from the in-domain
  *    slice (lang = 'en') and the RAW distribution from the whole
  *    corpus, score each document by the per-token target/raw
  *    likelihood ratio, and keep the top slice. The ratio is computed
  *    in integer micro/milli units (two exact integer divides with
  *    +1-smoothing at each stage) instead of summed log-probabilities
  *    — the repo-wide move that makes a resampling score hash-stable
  *    across engines while preserving the ranking semantics. Output:
  *    the 200 highest-scoring docs, deterministic tie-break on
  *    doc_id.
  *
  *  - `mm_audio_fp`: acoustic near-dup dedup through the REAL codec
  *    path — the audio twin of `mm_phash_pairs`. A variant corpus
  *    plants, per document, a base recording and either a near-dup
  *    (one PCM sample bumped — at most two energy-delta bits move) or
  *    a different recording; every payload is genuinely encoded to
  *    RIFF/WAV bytes and parsed back (`Multimodal.decodeWavPcm16`),
  *    fingerprinted by 63-bit energy-delta binarization
  *    (`Multimodal.audioFp63`), and paired by the same 16-bit-chunk
  *    candidate equi-join the image path uses (complete for
  *    Hamming ≤ 3 by pigeonhole). The oracle recomputes fingerprints
  *    from the synthesis arithmetic alone and brute-forces all pairs,
  *    so agreement proves synth → WAV encode → RIFF parse → framing →
  *    fingerprint → banded join end to end, and that banding lost
  *    nothing vs n².
  *
  *  - `x5_attrib_outer`: the left-outer arm of the stream-stream
  *    attribution join (`streaming/StreamJoin.attribute(outer =
  *    true)`) — clicks with NO impression in the trailing window
  *    survive with null imp columns (the "unattributed conversions"
  *    report). In streaming mode those rows emit once the watermark
  *    proves no match can arrive; the batch execution of the same
  *    body is a plain left-outer interval join, which the DuckDB
  *    LEFT JOIN oracle pins. Closes the outer-mode gap next to the
  *    inner-mode `x5_stream_attrib` row.
  *
  * Scale posture: dsir's bucket tables are 256 rows (broadcast) and
  * the doc score is one map-side-combinable aggregate over the token
  * explode — linear in the scan. mm_audio_fp hashing is map-only;
  * candidates stay Σ bucket²-bounded (and the class-collapse arm from
  * the image path applies unchanged when duplicate classes grow).
  * attrib_outer shuffles both sides once on user_id; streaming state
  * stays bounded by the watermark + window eviction.
  */
object Parity55 {
  type Q = (SparkSession, String) => DataFrame

  private val DsirBuckets = 256
  private val DsirKeep = 200

  /** Hashed-unigram bucket id of a token column. */
  private def bucketOf(tok: Column): Column =
    TextOps.polyHash60(tok) % DsirBuckets

  val queries: Map[String, Q] = Map(
    // ---- DSIR importance resampling --------------------------------
    "x7_dsir_sample" -> { (s, d) =>
      val bt = documents(s, d)
        .select(col("doc_id"), col("lang"),
          explode(TextOps.tokens(lower(col("text")))).as("tok"))
        .filter(length(col("tok")) > 0)
        .select(col("doc_id"), col("lang"), bucketOf(col("tok")).as("b"))
      val raw = bt.groupBy(col("b")).agg(count(lit(1)).as("r_b"))
      val tgt = bt.filter(col("lang") === "en")
        .groupBy(col("b")).agg(count(lit(1)).as("t_b"))
      val tot = bt.agg(count(lit(1)).as("r_tot"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("t_tot"))
      // 256-row likelihood-ratio table: micro-probabilities with +1
      // smoothing, then the milli-ratio — all integer DIVs, exact in
      // both engines; broadcast onto the token stream
      val lr = raw.join(tgt, Seq("b"), "left").crossJoin(tot)
        .select(col("b"),
          expr("""CAST((1000 * ((1000000 * (COALESCE(t_b, 0) + 1))
                 DIV (t_tot + 256) + 1))
               DIV ((1000000 * (r_b + 1)) DIV (r_tot + 256) + 1)
               AS BIGINT)""").as("ratio_milli"))
      bt.join(broadcast(lr), Seq("b"))
        .groupBy(col("doc_id"))
        .agg(max(col("lang")).as("lang"), count(lit(1)).as("n_toks"),
          sum(col("ratio_milli")).as("w_sum"))
        .select(col("doc_id"), col("lang"), col("n_toks"),
          col("w_sum").cast(LongType).as("w_sum"),
          expr("CAST(w_sum DIV n_toks AS BIGINT)").as("w_avg_milli"))
        .orderBy(col("w_avg_milli").desc, col("doc_id"))
        .limit(DsirKeep)
    },

    // ---- acoustic near-dup fingerprint pairs -----------------------
    "mm_audio_fp" -> { (s, d) =>
      val media = graft.ops.Multimodal.synthVariantAudio(s, documents(s, d))
      val fps = graft.ops.Multimodal.decodeAudioFp(s, media)
      graft.ops.Multimodal.phashNearDupPairs(fps, maxHamming = 3,
          idCol = "media_id", hashCol = "afp")
        .orderBy(col("id_a"), col("id_b"))
    },

    // ---- left-outer stream-stream attribution ----------------------
    "x5_attrib_outer" -> { (s, d) =>
      val ev = eventsNs(s, d)
      val att = graft.streaming.StreamJoin.attribute(
        clicks = ev.filter(col("event_type") === "click"),
        impressions = ev.filter(col("event_type") === "view"),
        window = "1 hour", delay = "10 minutes", outer = true)
      att.select(col("click_id"), col("user_id"),
          unix_micros(col("c_ts")).as("c_us"),
          col("imp_id"), unix_micros(col("i_ts")).as("i_us"))
        .orderBy(col("click_id"), col("imp_id"))
    })

  val oracles: Map[String, String] = Map(
    "x7_dsir_sample" ->
      s"""WITH tok AS (SELECT d.doc_id, d.lang, t.tok
           FROM documents d,
           unnest(string_split_regex(trim(lower(d.text)), '\\s+')) AS t(tok)
         WHERE length(t.tok) > 0),
         bt AS (SELECT doc_id, lang, (${hx15("tok")}) % 256 AS b FROM tok),
         raw AS (SELECT b, CAST(count(*) AS BIGINT) AS r_b
           FROM bt GROUP BY b),
         tgt AS (SELECT b, CAST(count(*) AS BIGINT) AS t_b
           FROM bt WHERE lang = 'en' GROUP BY b),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS r_tot,
             CAST(count(*) FILTER (lang = 'en') AS BIGINT) AS t_tot
           FROM bt),
         lr AS (SELECT raw.b,
             (1000 * ((1000000 * (COALESCE(t_b, 0) + 1))
                // (t_tot + 256) + 1))
               // ((1000000 * (r_b + 1)) // (r_tot + 256) + 1)
               AS ratio_milli
           FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN tot),
         w AS (SELECT doc_id, max(lang) AS lang,
             CAST(count(*) AS BIGINT) AS n_toks,
             CAST(sum(ratio_milli) AS BIGINT) AS w_sum
           FROM bt JOIN lr ON bt.b = lr.b GROUP BY doc_id)
         SELECT doc_id, lang, n_toks, w_sum,
           CAST(w_sum // n_toks AS BIGINT) AS w_avg_milli
         FROM w ORDER BY w_avg_milli DESC, doc_id LIMIT 200""",
    "mm_audio_fp" ->
      """WITH d AS (SELECT doc_id FROM documents),
         auds AS (SELECT doc_id*2 AS mid, doc_id AS src, 0 AS tweak FROM d
           UNION ALL
           SELECT doc_id*2+1,
             CASE WHEN doc_id % 3 = 0 THEN doc_id
                  ELSE doc_id + 1000000 END,
             CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
           FROM d),
         idx AS (SELECT CAST(unnest(generate_series(0, 511)) AS BIGINT)
           AS i),
         s AS (SELECT a.mid, idx.i // 8 AS f,
             abs((((a.src*131 + idx.i*1009 + 7) % 65536) *
                  ((a.src*131 + idx.i*1009 + 7) % 65536) // 64) % 2048
               - 1024
               + CASE WHEN a.tweak = 1 AND idx.i = 5 THEN 1 ELSE 0 END)
               AS v
           FROM auds a CROSS JOIN idx),
         e AS (SELECT mid, f, sum(v) AS en FROM s GROUP BY mid, f),
         bits AS (SELECT e1.mid, e1.f AS j,
             CASE WHEN e2.en > e1.en THEN 1 ELSE 0 END AS b
           FROM e e1 JOIN e e2 ON e2.mid = e1.mid AND e2.f = e1.f + 1
           WHERE e1.f < 63),
         h AS (SELECT mid, CAST(sum(b *
             (1::BIGINT << CAST(j AS INTEGER))) AS BIGINT) AS fp
           FROM bits GROUP BY mid)
         SELECT a.mid AS id_a, b.mid AS id_b,
           CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
         FROM h a JOIN h b ON a.mid < b.mid
         WHERE bit_count(xor(a.fp, b.fp)) <= 3
         ORDER BY id_a, id_b""",
    "x5_attrib_outer" ->
      """SELECT c.event_id AS click_id, c.user_id,
           epoch_us(c.ts) AS c_us, i.event_id AS imp_id,
           epoch_us(i.ts) AS i_us
         FROM (SELECT * FROM events WHERE event_type = 'click') c
         LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') i
           ON c.user_id = i.user_id
          AND epoch_us(i.ts) >= epoch_us(c.ts) - 3600000000
          AND epoch_us(i.ts) <= epoch_us(c.ts)
         ORDER BY click_id, imp_id"""
  )

  /** DuckDB has no conv(): fold the first 15 md5 hex digits into the
    * same 60-bit BIGINT polyHash60 yields (the Parity20 idiom). */
  private def hx15(e: String): String = OracleSql.hx15(e)
}
