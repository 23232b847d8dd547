package graft.queries

import graft.Tables._
import graft.ops.{Dedup, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Round-11 batch 3: the remaining data-skipping index and the LSH
  * design table — FULL-equality DuckDB oracles.
  *
  *  - `x8_bloom_prune`: bloom-filter file skipping — the POINT-lookup
  *    companion to `x8_zonemap_prune`'s range pruning (zone maps
  *    cannot skip on high-cardinality equality predicates; blooms
  *    can, which is why lakehouse formats ship both). Per file
  *    (l_orderkey DIV 1024, the zonemap row's file model): a sparse
  *    word-array bloom (144 × 63-bit words, two md5-derived hash
  *    positions per key) over the file's distinct part keys, built
  *    with `bit_or` aggregation per (file, word); a deterministic
  *    probe set then asks "which files must this key read". Emits
  *    per (file, probe) the bloom verdict NEXT TO exact membership,
  *    so the oracle replay checks both the never-false-negative
  *    guarantee and the exact false-positive set of this hash
  *    family. At 100 TB the bloom table is file-count-sized metadata
  *    (like the zone maps) and the probe side is a broadcast — the
  *    scan-planning decision never touches data.
  *  - `x2_lsh_scurve`: the MinHash-LSH s-curve design table — for the
  *    production banding (k=32, b=16 bands, r=2 rows), per exact-
  *    Jaccard decile of the corpus's intersecting pairs: pair count,
  *    mean candidate probability 1−(1−j^r)^b, and expected candidate
  *    pairs. THE table that decides banding before anyone pays the
  *    shuffle: it makes the recall/cost trade (j=0.5 → p=0.98 here;
  *    j=0.2 → p=0.47) a measured corpus property instead of folklore.
  *    Probabilities quantize to DECIMAL(18,12) before summation so
  *    the per-bin sums are exact (order-free); the pow chain is
  *    mirrored operation for operation.
  *
  * Scale posture: bloom build = one distinct + one 64-bit bit_or per
  * file (map-side combinable; the result is metadata). The s-curve
  * table rides the SAME inverted-index pair join the dedup pipeline
  * already runs (tau=0 disables only the size prune; intersecting
  * pairs are the candidate universe by construction) — at 100 TB you
  * compute it on the df-capped variant or a corpus sample, machinery
  * unchanged.
  */
object Parity34 {
  type Q = (SparkSession, String) => DataFrame

  /** File model shared with x8_zonemap_prune / x8_overlap_depth. */
  private val FileKeys = 1024L
  /** Probe stride + cap: the 10 smallest part keys at every 211th —
    * a fixed probe BATCH at any corpus size. */
  private val ProbeMod = 211L
  /** Bloom geometry: 144 sparse 63-bit words = 9072 slots, k = 2. */
  private val BloomWords = 144
  private val LshBands = 16
  private val LshRows = 2

  val queries: Map[String, Q] = Map(
    // ---- bloom-filter file pruning ---------------------------------
    // Bloom as SPARSE (file, word) bitmask rows — 144 words × 63 bits
    // = 9072 slots per file (63-bit words keep every shift inside
    // signed-64 in both engines; DuckDB raises on 1<<63). Sized for
    // the ~900 distinct keys a file carries here: m ≈ 10·n, k = 2 →
    // measured fp is a few percent, so the prune actually prunes —
    // a 63-bit toy bloom saturates at this key count and reads
    // everything. The bloom relation IS the production shape: it
    // bit_or-aggregates per (file, word) and joins probes by word,
    // never materializing a dense bitmap type.
    "x8_bloom_prune" -> { (s, d) =>
      val m = BloomWords * 63
      def positions(key: org.apache.spark.sql.Column) = {
        val h = TextOps.polyHash60(key.cast("string"))
        array(pmod(h, lit(m.toLong)),
          pmod(shiftright(h, 11), lit(m.toLong)))
      }
      val fk = lineitem(s, d)
        .select(expr(s"l_orderkey DIV $FileKeys").as("file_id"),
          col("l_partkey"))
        .distinct()
      val blooms = fk
        .select(col("file_id"),
          explode(positions(col("l_partkey"))).as("p"))
        .select(col("file_id"), (col("p") / 63).cast("long").as("word"),
          (col("p") % 63).cast("int").as("bit"))
        .groupBy(col("file_id"), col("word"))
        .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").as("bits"))
      // the probe set is a FIXED batch (the 10 smallest matching
      // keys), not corpus-proportional: a planner answers per probe,
      // and letting probes scale with the corpus made the verdict
      // grid itself quadratic (files × probes both growing — measured
      // 200 s at the 100× tier from 139 M output rows alone)
      val probePos = part(s, d)
        .filter(col("p_partkey") % ProbeMod === 0)
        .orderBy(col("p_partkey")).limit(10)
        .select(col("p_partkey").as("probe_key"),
          posexplode(positions(col("p_partkey"))).as(Seq("k_idx", "p")))
        .select(col("probe_key"), col("k_idx"),
          (col("p") / 63).cast("long").as("word"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 63 AS INT))")
            .as("pmask"))
      // a probe position whose word row is absent, or present with the
      // bit unset, is a miss; bloom_hit needs BOTH positions set
      val hits = blooms.join(broadcast(probePos), Seq("word"))
        .filter(col("bits").bitwiseAND(col("pmask")) === col("pmask"))
        .groupBy(col("file_id"), col("probe_key"))
        .agg(countDistinct(col("k_idx")).as("n_set"))
      val grid = blooms.select(col("file_id")).distinct()
        .crossJoin(broadcast(probePos.select(col("probe_key")).distinct()))
      val present = fk.select(col("file_id"),
        col("l_partkey").as("probe_key"), lit(true).as("present"))
      grid.join(hits, Seq("file_id", "probe_key"), "left")
        .join(present, Seq("file_id", "probe_key"), "left")
        .select(col("file_id"), col("probe_key"),
          (coalesce(col("n_set"), lit(0L)) === 2L).as("bloom_hit"),
          coalesce(col("present"), lit(false)).as("present"))
        .orderBy(col("file_id"), col("probe_key"))
    },

    // ---- MinHash-LSH s-curve design table --------------------------
    "x2_lsh_scurve" -> { (s, d) =>
      val pairs = Dedup.ngramJaccardPairs(documents(s, d), tau = 0.0,
        blockCol = "lang")
      val withP = pairs.select(col("jaccard"),
        floor(col("jaccard") * 10).cast("long").as("j_bin"),
        round(lit(1.0) -
          pow(lit(1.0) - pow(col("jaccard"), lit(LshRows.toDouble)),
            lit(LshBands.toDouble)), 12)
          .cast("decimal(18,12)").as("p"))
      withP.groupBy(col("j_bin"))
        .agg(count(lit(1)).as("n_pairs"), sum(col("p")).as("sp"))
        .select(col("j_bin"), col("n_pairs"),
          round(col("sp").cast(DoubleType) /
            col("n_pairs").cast(DoubleType), 8).as("avg_p"),
          round(col("sp").cast(DoubleType), 8).as("expected_candidates"))
        .orderBy(col("j_bin"))
    })

  private def hx15(e: String): String = OracleSql.hx15(e)

  val oracles: Map[String, String] = Map(
    "x8_bloom_prune" -> {
      val m = BloomWords * 63
      s"""WITH fk AS (
           SELECT DISTINCT l_orderkey // $FileKeys AS file_id, l_partkey
           FROM lineitem),
         pos AS (SELECT file_id,
             unnest([h % $m, (h // 2048) % $m]) AS p
           FROM (SELECT file_id, ${hx15("CAST(l_partkey AS VARCHAR)")} AS h
                 FROM fk)),
         blooms AS (SELECT file_id, p // 63 AS word,
             bit_or(CAST(1 AS BIGINT) << CAST(p % 63 AS INTEGER)) AS bits
           FROM pos GROUP BY file_id, p // 63),
         probes AS (SELECT p_partkey AS probe_key,
             ${hx15("CAST(p_partkey AS VARCHAR)")} AS h
           FROM part WHERE p_partkey % $ProbeMod = 0
           ORDER BY p_partkey LIMIT 10),
         ppos AS (SELECT probe_key, k_idx,
             CASE WHEN k_idx = 0 THEN h % $m ELSE (h // 2048) % $m END AS p
           FROM probes CROSS JOIN (SELECT unnest([0, 1]) AS k_idx)),
         pmask AS (SELECT probe_key, k_idx, p // 63 AS word,
             CAST(1 AS BIGINT) << CAST(p % 63 AS INTEGER) AS mask
           FROM ppos),
         hits AS (SELECT b.file_id, pm.probe_key,
             count(DISTINCT pm.k_idx) AS n_set
           FROM blooms b JOIN pmask pm ON b.word = pm.word
           WHERE (b.bits & pm.mask) = pm.mask
           GROUP BY b.file_id, pm.probe_key),
         grid AS (SELECT DISTINCT f.file_id, p.probe_key
           FROM (SELECT DISTINCT file_id FROM fk) f
           CROSS JOIN (SELECT DISTINCT probe_key FROM pmask) p)
         SELECT g.file_id, g.probe_key,
           coalesce(h.n_set, 0) = 2 AS bloom_hit,
           EXISTS (SELECT 1 FROM fk
             WHERE fk.file_id = g.file_id
               AND fk.l_partkey = g.probe_key) AS present
         FROM grid g LEFT JOIN hits h
           ON g.file_id = h.file_id AND g.probe_key = h.probe_key
         ORDER BY g.file_id, g.probe_key"""
    },
    "x2_lsh_scurve" ->
      s"""WITH tk AS (
           SELECT doc_id, lang,
             string_split_regex(trim(lower(text)), '\\s+') AS t
           FROM documents),
         sh AS (SELECT doc_id, lang,
             list_distinct(CASE WHEN length(t) >= 3
               THEN list_transform(generate_series(1, length(t) - 2),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
               ELSE CAST([] AS VARCHAR[]) END) AS s
           FROM tk),
         sz AS (SELECT doc_id, lang, len(s) AS sz, s FROM sh
           WHERE len(s) > 0),
         inv AS (SELECT doc_id, lang, sz, unnest(s) AS shingle FROM sz),
         shared AS (SELECT a.lang, a.doc_id AS id_a, b.doc_id AS id_b,
             any_value(a.sz) AS sz_a, any_value(b.sz) AS sz_b,
             count(*) AS shared
           FROM inv a JOIN inv b
             ON a.lang = b.lang AND a.shingle = b.shingle
               AND a.doc_id < b.doc_id
           GROUP BY a.lang, a.doc_id, b.doc_id),
         jc AS (SELECT CAST(shared AS DOUBLE) /
             CAST(sz_a + sz_b - shared AS DOUBLE) AS j
           FROM shared),
         wp AS (SELECT CAST(floor(j * 10) AS BIGINT) AS j_bin,
             CAST(round(1.0 - pow(1.0 - pow(j, ${LshRows}.0),
               ${LshBands}.0), 12) AS DECIMAL(18,12)) AS p
           FROM jc)
         SELECT j_bin, CAST(count(*) AS BIGINT) AS n_pairs,
           round(CAST(sum(p) AS DOUBLE) / CAST(count(*) AS DOUBLE), 8)
             AS avg_p,
           round(CAST(sum(p) AS DOUBLE), 8) AS expected_candidates
         FROM wp GROUP BY j_bin ORDER BY j_bin"""
  )
}
