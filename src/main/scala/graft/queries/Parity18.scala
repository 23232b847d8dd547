package graft.queries

import graft.Tables._
import graft.ops.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Round-10 batch 5: the two text-dedup operators that complete the
  * Lee-et-al-style substring pipeline —
  *
  *  - `x4_substr_scrub`: duplicated-span REMOVAL — `x4_substr_dedup`
  *    finds the verbatim-shared spans; this query actually cuts them
  *    and emits the scrubbed document (content-addressed fingerprint
  *    of the kept tokens + kept/cut counts). The write-side half of
  *    exact substring dedup.
  *  - `x4_cdc_chunk`: content-defined chunking — chunk boundaries
  *    where the 4-token-gram hash ≡ 0 (mod 16), so boundaries move
  *    WITH the content: insertions shift fixed windows (x4_chunk_rag
  *    re-fingerprints everything downstream) but leave CDC chunk
  *    identities untouched outside the edited chunk. The
  *    storage-dedup / incremental-sync primitive, at token
  *    granularity.
  *
  * Scale: both are the substr_dedup shuffle family — positional gram
  * explode (map-only), one keyed aggregate, doc_id-partitioned
  * windows; the scrub adds one anti-join of positions vs spans
  * (spans per doc are few — the join input is the hit list, not the
  * corpus).
  */
object Parity18 {
  type Q = (SparkSession, String) => DataFrame

  private val SubN = 8    // scrub: same 8-gram granularity as substr_dedup
  private val CdcN = 4    // chunking gram width
  private val CdcMod = 16 // expected chunk length ~ 16 tokens

  val queries: Map[String, Q] = Map(
    // ---- duplicated-span scrubbing ---------------------------------
    "x4_substr_scrub" -> { (s, d) =>
      val tk = documents(s, d)
        .select(col("doc_id"), TextOps.tokens(lower(col("text"))).as("t"))
        .withColumn("m", size(col("t")).cast(LongType))
      val g = tk.select(col("doc_id"),
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
        .withColumn("ns",
          when(col("pme").isNull || col("pos") > col("pme") + 1, 1L)
            .otherwise(0L))
        .withColumn("isl", sum(col("ns")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("doc_id"), col("isl"))
        .agg(min(col("pos")).as("ss"),
          (max(col("pos")) + lit(SubN - 1)).as("se"))
      // kept tokens = positions outside every span (anti join on the
      // span range; spans per doc are few). posexplode is 0-based.
      val toks = tk.select(col("doc_id"), col("m"),
        posexplode(col("t"))).withColumnRenamed("col", "tok")
      val kept = toks.join(spans,
          toks("doc_id") === spans("doc_id") &&
            col("pos") >= col("ss") && col("pos") <= col("se"),
          "left_anti")
      kept.groupBy(col("doc_id"), col("m"))
        .agg(count(lit(1)).as("kept_tokens"),
          md5(array_join(transform(
            array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok")), " ")).as("scrub_fp"))
        .select(col("doc_id"), col("m").as("n_tokens"),
          col("kept_tokens"),
          (col("m") - col("kept_tokens")).as("cut_tokens"),
          col("scrub_fp"))
        .orderBy(col("doc_id"))
    },

    // ---- content-defined chunking ----------------------------------
    // Boundary gram at position p (0-based) cuts AFTER its last token
    // (between token p+CdcN-1 and p+CdcN): token j starts a new chunk
    // iff the gram at p = j-CdcN was a boundary. chunk_id(j) is then
    // a per-doc running sum of start flags — one window over the
    // doc_id partitioning.
    "x4_cdc_chunk" -> { (s, d) =>
      val tk = documents(s, d)
        .select(col("doc_id"), TextOps.tokens(lower(col("text"))).as("t"))
      val bounds = tk.select(col("doc_id"),
          posexplode(TextOps.shingleSeq(col("t"), CdcN)))
        .withColumnRenamed("col", "gram")
        .filter(TextOps.polyHash60(col("gram")) % CdcMod === 0)
        .select(col("doc_id"), (col("pos") + CdcN).as("cut_at"))
      val toks = tk.select(col("doc_id"), posexplode(col("t")))
        .withColumnRenamed("col", "tok")
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      toks.join(bounds,
          toks("doc_id") === bounds("doc_id") &&
            col("pos") === col("cut_at"), "left")
        .select(toks("doc_id"), col("pos"), col("tok"),
          when(col("cut_at").isNotNull, 1L).otherwise(0L).as("flag"))
        .withColumn("chunk_id", sum(col("flag")).over(w))
        .groupBy(col("doc_id"), col("chunk_id"))
        .agg(min(col("pos")).as("tok_start"),
          count(lit(1)).as("n_toks"),
          md5(array_join(transform(
            array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok")), " ")).as("chunk_fp"))
        .orderBy(col("doc_id"), col("chunk_id"))
    })

  /** polyHash60 in DuckDB: 15-hex-digit md5 prefix as BIGINT (the
    * same strpos digit fold every poly oracle uses). */
  private def hx(e: String): String =
    s"""CAST(list_sum(list_transform(generate_series(1, 15),
       p -> (CAST(strpos('0123456789abcdef', substring(md5($e), p, 1))
         AS BIGINT) - 1) << (4 * (15 - p)))) AS BIGINT)"""

  val oracles: Map[String, String] = Map(
    "x4_substr_scrub" ->
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
         sp AS (SELECT doc_id, min(pos) AS ss, max(pos) + 7 AS se
           FROM k GROUP BY doc_id, isl),
         -- oracle positions are 1-based; Spark's posexplode is 0-based,
         -- so spans here are [ss, se] in 1-based token positions too
         tok AS (SELECT doc_id, CAST(length(t) AS BIGINT) AS m,
             unnest(generate_series(1, length(t))) AS pos,
             unnest(t) AS tok
           FROM tk),
         kept AS (SELECT tok.doc_id, tok.m, tok.pos, tok.tok
           FROM tok WHERE NOT EXISTS (SELECT 1 FROM sp
             WHERE sp.doc_id = tok.doc_id
               AND tok.pos BETWEEN sp.ss AND sp.se))
         SELECT doc_id, m AS n_tokens,
           CAST(count(*) AS BIGINT) AS kept_tokens,
           CAST(m - count(*) AS BIGINT) AS cut_tokens,
           md5(array_to_string(list(tok ORDER BY pos), ' ')) AS scrub_fp
         FROM kept GROUP BY doc_id, m
         ORDER BY doc_id""",
    "x4_cdc_chunk" ->
      s"""WITH tk AS (SELECT doc_id,
             string_split_regex(trim(lower(text)), '\\s+') AS t FROM documents),
         g AS (SELECT doc_id,
             unnest(generate_series(1, greatest(length(t) - ${CdcN - 1}, 0)))
               AS pos,
             unnest(list_transform(
               generate_series(1, greatest(length(t) - ${CdcN - 1}, 0)),
               i -> array_to_string(t[i:i+${CdcN - 1}], ' '))) AS gram
           FROM tk),
         b AS (SELECT doc_id, pos + $CdcN AS cut_at FROM g
           WHERE ${hx("gram")} % $CdcMod = 0),
         tok AS (SELECT doc_id,
             unnest(generate_series(1, length(t))) AS pos,
             unnest(t) AS tok
           FROM tk),
         f AS (SELECT tok.doc_id, tok.pos, tok.tok,
             CASE WHEN b.cut_at IS NOT NULL THEN 1 ELSE 0 END AS flag
           FROM tok LEFT JOIN b
             ON tok.doc_id = b.doc_id AND tok.pos = b.cut_at),
         c AS (SELECT doc_id, pos, tok,
             CAST(sum(flag) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS chunk_id
           FROM f)
         SELECT doc_id, chunk_id,
           -- Spark's posexplode is 0-based; this CTE's positions are
           -- 1-based, so shift the emitted start back
           CAST(min(pos) - 1 AS BIGINT) AS tok_start,
           CAST(count(*) AS BIGINT) AS n_toks,
           md5(array_to_string(list(tok ORDER BY pos), ' ')) AS chunk_fp
         FROM c GROUP BY doc_id, chunk_id
         ORDER BY doc_id, chunk_id""")
}
