package graft.queries

import graft.Tables._
import graft.ops.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Round-9 batch: three training-data-pipeline operators the engine
  * still lacked —
  *
  *  - `x4_substr_dedup`: exact duplicated-SUBSTRING span detection at
  *    token-n-gram granularity (the "Deduplicating Training Data
  *    Makes Language Models Better" shape, Lee et al. 2022): find
  *    every token 8-gram shared verbatim across >= 2 documents, merge
  *    each document's duplicated positions into maximal spans, and
  *    report per-doc span count / covered tokens / coverage ratio.
  *    Unlike MinHash/SimHash (whole-doc set similarity) this catches
  *    PARTIAL duplication — boilerplate headers, quoted paragraphs,
  *    licence blocks — the signal used to cut exact substring
  *    repeats out of LLM corpora.
  *  - `x4_chunk_rag`: overlapping fixed-budget chunking (window 64
  *    tokens, stride 48) — the RAG / retrieval-index preprocessing
  *    step that splits every document into deterministic
  *    content-addressed chunks.
  *  - `x7_temperature_sample`: temperature-weighted domain sampling
  *    (alpha = 0.5) — the training-mix step that upsamples small
  *    domains: per-source quotas proportional to sqrt(token mass),
  *    largest-remainder rounded, filled by deterministic hash rank.
  *
  * Scale rules as every earlier batch: shuffles only on natural keys,
  * domain-count-sized frames broadcast, exact integer arithmetic with
  * single final IEEE divisions, no collect(), and a deterministic
  * total ORDER BY on every output (the driver's correctness hash is
  * row-order-sensitive).
  */
object Parity13 {
  type Q = (SparkSession, String) => DataFrame

  /** Duplicated-substring granularity: token 8-grams. Long enough
    * that natural-language collisions are rare, short enough that the
    * planted near-duplicate segments in the corpus collide. */
  private val SubN = 8
  /** RAG chunk window / stride (tokens). */
  private val ChunkC = 64L
  private val ChunkS = 48L
  /** Temperature-sample target: total_docs DIV SampleDen docs. */
  private val SampleDen = 5L

  val queries: Map[String, Q] = Map(
    // ---- exact duplicated-substring spans --------------------------
    // Four stages, each a natural Spark shape: (1) positional 8-gram
    // explode (map-only, the zipped-slice shingleSeq kernel); (2) one
    // keyed aggregate marks grams seen in >= 2 DISTINCT docs — as
    // min(doc) <> max(doc), no count-distinct Expand; (3) the hit
    // positions flow through the classic island merge (two windows on
    // the SAME doc_id partitioning — one shuffle family, identical to
    // x5_interval_merge); (4) per-doc rollup left-joined back so
    // clean documents report zeros. 100 TB: the gram aggregate/join
    // key would be xxhash64(gram) (64-bit slim shuffle) — the string
    // key here keeps the DuckDB oracle verbatim; everything else is
    // doc_id-partitioned. No all-pairs stage anywhere: cost is linear
    // in corpus token count regardless of how many docs share a gram.
    "x4_substr_dedup" -> { (s, d) =>
      val tk = documents(s, d)
        .select(col("doc_id"), TextOps.tokens(lower(col("text"))).as("t"))
        .withColumn("m", size(col("t")).cast(LongType))
      val g = tk
        .select(col("doc_id"),
          posexplode(TextOps.shingleSeq(col("t"), SubN)))
        .withColumnRenamed("col", "gram")
      val dup = g.groupBy(col("gram"))
        .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
        .filter(col("mn") =!= col("mx"))
        .select(col("gram"))
      val hits = g.join(dup, Seq("gram")).select(col("doc_id"), col("pos"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val spans = hits
        .withColumn("pme", max(col("pos") + lit(SubN - 1))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)))
        // contiguous coverage merges: a gram at pos extends the span
        // when its first token is <= one past the furthest covered
        .withColumn("ns",
          when(col("pme").isNull || col("pos") > col("pme") + 1, 1L)
            .otherwise(0L))
        .withColumn("isl", sum(col("ns")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("doc_id"), col("isl"))
        .agg(min(col("pos")).as("ss"), max(col("pos")).as("mp"))
        .withColumn("se", col("mp") + lit(SubN - 1))
      val perDoc = spans.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"),
          sum(col("se") - col("ss") + 1).cast(LongType).as("dup_tokens"))
      val grams = hits.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_dup_grams"))
      tk.select(col("doc_id"), col("m").as("n_tokens"))
        .join(perDoc, Seq("doc_id"), "left")
        .join(grams, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"),
          coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
        .withColumn("dup_ratio",
          (col("dup_tokens").cast(DoubleType) /
            col("n_tokens").cast(DoubleType)).cast(DoubleType))
        .orderBy(col("doc_id"))
    },

    // ---- RAG chunking (overlapping token windows) ------------------
    // Map-only: every document independently yields
    // 1 + ceil(max(m-C,0)/S) chunks — start k*S, length
    // min(C, m - k*S) — so the last chunk always reaches the final
    // token and consecutive chunks overlap by C-S tokens. Chunk
    // identity is the md5 of the token-joined text: deterministic,
    // content-addressed (ready for chunk-level dedup / retrieval
    // indexing), and engine-independent. No shuffle at all until the
    // output sort; at 100 TB this is pure scan throughput.
    "x4_chunk_rag" -> { (s, d) =>
      documents(s, d)
        .select(col("doc_id"), TextOps.tokens(lower(col("text"))).as("t"))
        .withColumn("m", size(col("t")).cast(LongType))
        .withColumn("kmax",
          expr(s"(greatest(m - $ChunkC, 0L) + ${ChunkS - 1}) DIV $ChunkS"))
        .select(col("doc_id"), col("m"), col("t"),
          explode(expr("sequence(0L, kmax)")).as("chunk_id"))
        .withColumn("tok_start", col("chunk_id") * lit(ChunkS))
        .withColumn("n_toks", least(lit(ChunkC), col("m") - col("tok_start")))
        .withColumn("chunk_fp", md5(array_join(
          slice(col("t"), (col("tok_start") + 1).cast("int"),
            col("n_toks").cast("int")), " ")))
        .select(col("doc_id"), col("chunk_id"), col("tok_start"),
          col("n_toks"), col("chunk_fp"))
        .orderBy(col("doc_id"), col("chunk_id"))
    },

    // ---- temperature-weighted domain sampling ----------------------
    // The multi-domain training-mix step (alpha=0.5 temperature):
    // per-source weights sqrt(token mass) flatten the domain
    // distribution, quotas are largest-remainder rounded so they sum
    // exactly to N = total_docs/5, and each quota is filled by
    // md5-hash rank (deterministic, uniform, engine-replayable).
    // EVERYTHING is integer arithmetic: sqrt goes through an
    // isqrt-with-correction (floor(sqrt) then +-1 fixup), so no
    // float sum ever crosses partitions. The per-source frame is
    // domain-count-sized -> the unpartitioned windows over it are a
    // few dozen rows (broadcast back to the corpus for the rank
    // filter); the only corpus-scale shuffle is the per-source rank
    // window.
    "x7_temperature_sample" -> { (s, d) =>
      val tok = documents(s, d)
        .select(col("source"), col("doc_id"),
          size(TextOps.tokens(lower(col("text")))).cast(LongType).as("m"))
      val s0 = floor(sqrt(col("tt").cast(DoubleType))).cast(LongType)
      val wAll = Window.partitionBy()
      val quota = tok.groupBy(col("source"))
        .agg(sum(col("m")).as("tt"), count(lit(1)).as("nd"))
        .withColumn("s0", s0)
        .withColumn("u",
          when((col("s0") + 1) * (col("s0") + 1) <= col("tt"), col("s0") + 1)
            .when(col("s0") * col("s0") > col("tt"), col("s0") - 1)
            .otherwise(col("s0")))
        .withColumn("uu", sum(col("u")).over(wAll))
        .withColumn("nn", expr(s"sum(nd) over () DIV $SampleDen"))
        .withColumn("base", expr("(nn * u) DIV uu"))
        .withColumn("rem", expr("(nn * u) % uu"))
        .withColumn("lft", col("nn") - sum(col("base")).over(wAll))
        .withColumn("rr", row_number().over(
          Window.orderBy(col("rem").desc, col("source"))))
        .withColumn("n_i",
          col("base") + when(col("rr") <= col("lft"), 1L).otherwise(0L))
        .select(col("source"), col("n_i"))
      documents(s, d)
        .select(col("doc_id"), col("source"))
        .withColumn("hk", md5(col("doc_id").cast("string")))
        .withColumn("sel_rank", row_number().over(
          Window.partitionBy(col("source"))
            .orderBy(col("hk"), col("doc_id"))).cast(LongType))
        .join(broadcast(quota), Seq("source"))
        .filter(col("sel_rank") <= col("n_i"))
        .select(col("source"), col("doc_id"), col("sel_rank"))
        .orderBy(col("source"), col("sel_rank"))
    })

  val oracles: Map[String, String] = Map(
    "x4_substr_dedup" ->
      """WITH tk AS (SELECT doc_id,
             string_split_regex(trim(lower(text)), '\s+') AS t FROM documents),
         g AS (SELECT doc_id,
             unnest(generate_series(1, greatest(length(t) - 7, 0))) AS pos,
             unnest(list_transform(generate_series(1, greatest(length(t) - 7, 0)),
               i -> array_to_string(t[i:i+7], ' '))) AS gram
           FROM tk),
         dup AS (SELECT gram FROM g GROUP BY gram
           HAVING min(doc_id) <> max(doc_id)),
         h AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram)),
         i AS (SELECT doc_id, pos,
             max(pos + 7) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
           FROM h),
         j AS (SELECT doc_id, pos,
             CASE WHEN pme IS NULL OR pos > pme + 1 THEN 1 ELSE 0 END AS ns
           FROM i),
         k AS (SELECT doc_id, pos,
             sum(ns) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
           FROM j),
         sp AS (SELECT doc_id, isl, min(pos) AS ss, max(pos) + 7 AS se
           FROM k GROUP BY doc_id, isl),
         pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
             CAST(sum(se - ss + 1) AS BIGINT) AS dup_tokens
           FROM sp GROUP BY doc_id),
         gr AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_grams
           FROM h GROUP BY doc_id)
         SELECT tk.doc_id, CAST(length(t) AS BIGINT) AS n_tokens,
           coalesce(gr.n_dup_grams, 0) AS n_dup_grams,
           coalesce(pd.n_spans, 0) AS n_spans,
           coalesce(pd.dup_tokens, 0) AS dup_tokens,
           CAST(CAST(coalesce(pd.dup_tokens, 0) AS DOUBLE) /
                CAST(length(t) AS DOUBLE) AS DOUBLE) AS dup_ratio
         FROM tk LEFT JOIN pd USING (doc_id) LEFT JOIN gr USING (doc_id)
         ORDER BY doc_id""",
    "x4_chunk_rag" ->
      """WITH tk AS (SELECT doc_id,
             string_split_regex(trim(lower(text)), '\s+') AS t FROM documents),
         p AS (SELECT doc_id, t, CAST(length(t) AS BIGINT) AS m,
             (greatest(CAST(length(t) AS BIGINT) - 64, 0) + 47) // 48 AS kmax
           FROM tk)
         SELECT doc_id,
           unnest(generate_series(0, kmax)) AS chunk_id,
           unnest(list_transform(generate_series(0, kmax),
             k -> k * 48)) AS tok_start,
           unnest(list_transform(generate_series(0, kmax),
             k -> least(64, m - k * 48))) AS n_toks,
           unnest(list_transform(generate_series(0, kmax),
             k -> md5(array_to_string(
               t[CAST(k*48+1 AS BIGINT):CAST(k*48 + least(64, m - k*48) AS BIGINT)],
               ' ')))) AS chunk_fp
         FROM p ORDER BY doc_id, chunk_id""",
    "x7_temperature_sample" ->
      """WITH tok AS (SELECT source, doc_id,
             CAST(length(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS m
           FROM documents),
         agg AS (SELECT source, CAST(sum(m) AS BIGINT) AS tt,
             CAST(count(*) AS BIGINT) AS nd
           FROM tok GROUP BY source),
         sq AS (SELECT source, tt, nd,
             CAST(floor(sqrt(CAST(tt AS DOUBLE))) AS BIGINT) AS s0
           FROM agg),
         uq AS (SELECT source, nd,
             CASE WHEN (s0 + 1) * (s0 + 1) <= tt THEN s0 + 1
                  WHEN s0 * s0 > tt THEN s0 - 1
                  ELSE s0 END AS u
           FROM sq),
         win AS (SELECT source, u,
             CAST(sum(u) OVER () AS BIGINT) AS uu,
             CAST(sum(nd) OVER () AS BIGINT) // 5 AS nn
           FROM uq),
         q0 AS (SELECT source, (nn * u) // uu AS base, (nn * u) % uu AS rem,
             nn, uu FROM win),
         q1 AS (SELECT source, base, nn,
             nn - CAST(sum(base) OVER () AS BIGINT) AS lft,
             row_number() OVER (ORDER BY rem DESC, source) AS rr
           FROM q0),
         quota AS (SELECT source,
             base + CASE WHEN rr <= lft THEN 1 ELSE 0 END AS n_i
           FROM q1),
         ranked AS (SELECT source, doc_id,
             CAST(row_number() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
               AS sel_rank
           FROM documents)
         SELECT r.source, r.doc_id, r.sel_rank
         FROM ranked r JOIN quota q ON r.source = q.source
         WHERE r.sel_rank <= q.n_i
         ORDER BY r.source, r.sel_rank""")
}
