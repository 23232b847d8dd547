package graft.queries

import graft.Tables._
import graft.ops.{Dedup, TextOps}
import graft.streaming.StatefulDedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 batch: three operators a 100 TB ingest loop needs that the
  * engine had no oracle-checked story for —
  *
  *  - `x1_stream_dedup`: the `transformWithState` streaming dedup
  *    ([[graft.streaming.StatefulDedup]]) run through Spark's BATCH
  *    execution — the state-store code path the stream drives per
  *    micro-batch, checked against a DuckDB arg-min oracle (per
  *    content fingerprint the smallest doc_id survives). StreamingSpec
  *    additionally pins a real AvailableNow stream == batch.
  *  - `x2_minhash_incr`: incremental near-dup
  *    ([[graft.ops.Dedup.minhashNearDupPairsIncremental]]) — today's
  *    batch probed against a persisted corpus signature index
  *    ([[graft.ops.Dedup.minhashIndex]]); the corpus is never
  *    re-shingled. Emits exactly the `minhashNearDupPairs` set
  *    restricted to pairs touching the batch, so the brute-force
  *    full-equality oracle argument from `x2_minhash_lsh` carries
  *    over with the same restriction.
  *  - `x2_containment`: asymmetric containment dedup
  *    ([[graft.ops.Dedup.containmentPairs]]) — |A∩B|/|A|, the measure
  *    that catches subset duplicates (quotes, boilerplate wrappers,
  *    chunk-of-a-doc extractions) which Jaccard structurally misses;
  *    df-capped postings keep the pair stage linear exactly like
  *    `x2_jaccard_dfcap`.
  */
object Parity12 {
  type Q = (SparkSession, String) => DataFrame

  /** Incremental-dedup split: doc_id mod 10 ∈ {8,9} plays "today's
    * batch" (~20% of the corpus), the rest is the indexed corpus. */
  private val NewMod = 10L
  private val NewFrom = 8L

  /** Containment threshold: planted near-dups (J >= 0.7) always
    * satisfy cont >= J, and true subset pairs sit near 1.0. */
  private val ContTau = 0.8
  /** Same df cap as x2_jaccard_dfcap. */
  private val DfCap = 25L

  val queries: Map[String, Q] = Map(
    // ---- streaming dedup, batch-executed ---------------------------
    "x1_stream_dedup" -> { (s, d) =>
      import s.implicits._
      val docs = documents(s, d)
        .select(TextOps.fingerprint(col("text")).as("key"),
          col("doc_id").cast("long").as("doc_id"), col("text"))
        .as[StatefulDedup.Doc]
      StatefulDedup.dedup(docs, java.time.Duration.ZERO)
        .toDF()
        .select(col("key").as("fp"), col("doc_id"), col("text"))
        .orderBy(col("fp"))
    },

    // ---- incremental near-dup against a corpus index ---------------
    "x2_minhash_incr" -> { (s, d) =>
      val docs = documents(s, d)
      val corpus = docs.filter(col("doc_id") % NewMod < NewFrom)
      val batch = docs.filter(col("doc_id") % NewMod >= NewFrom)
      Dedup.minhashNearDupPairsIncremental(batch,
          Dedup.minhashIndex(corpus), tau = 0.5)
        .orderBy(col("id_a"), col("id_b"))
    },

    // ---- asymmetric containment pairs ------------------------------
    "x2_containment" -> { (s, d) =>
      Dedup.containmentPairs(documents(s, d), tau = ContTau,
        dfCap = DfCap, blockCol = "lang")
        .orderBy(col("blk"), col("id_a"), col("id_b"))
    },

    // ---- streaming LSH candidates, batch-executed ------------------
    // The stateful bucket processor ([[graft.streaming.StatefulNearDup]])
    // replaces the band self-join; run in batch its candidate multiset
    // is exactly the self-join's, so after the shared verify tail the
    // query must reproduce x2_minhash_poly row for row — it reuses
    // that oracle verbatim.
    //
    // Occupancy prune: a bucket with one occupant emits no pair, so
    // dropping single-member buckets BEFORE the stateful processor
    // leaves the candidate multiset — and therefore the oracle —
    // EXACTLY unchanged, while the state-store traffic falls from
    // ~n_docs·bands nearly-distinct keys (each paying per-key state
    // ops — measured 66 s of the sf0.1 bench, 26% of the total) to
    // only the colliding buckets (~pairs·bands). The prune is a
    // batch-replay device only: a live stream cannot know a bucket's
    // future occupancy — there the state bound is maxBucket + TTL
    // (see StatefulNearDup's scaladoc).
    "x2_stream_neardup" -> { (s, d) =>
      import s.implicits._
      val (bands0, sets) = Dedup.polyBandsAndSets(documents(s, d))
      // three consumers below (occupancy count, prune join) — compute
      // the banding once
      val bands = bands0
        .select(col("bk").as("key"), col("id").as("doc_id"))
        .localCheckpoint()
      val multi = bands.groupBy(col("key"))
        .agg(count(lit(1)).as("n_occ"))
        .filter(col("n_occ") >= 2)
        .select(col("key"))
      val cand = graft.streaming.StatefulNearDup.candidates(
          bands.join(multi, Seq("key"))
            .as[graft.streaming.StatefulNearDup.BandRow],
          java.time.Duration.ZERO)
        .toDF().distinct()
      Dedup.verifyPairs(cand, sets, tau = 0.5)
        .orderBy(col("id_a"), col("id_b"))
    })

  val oracles: Map[String, String] = Map(
    // batch-executed streaming candidates must equal the batch LSH
    // join exactly — same oracle, same rows
    "x2_stream_neardup" -> ExtQueries.oracles("x2_minhash_poly"),
    // arg-min per content fingerprint (fp unique after dedup, so the
    // ORDER BY is total)
    "x1_stream_dedup" ->
      """WITH f AS (SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp,
             doc_id, text FROM documents),
         r AS (SELECT fp, doc_id, text,
             row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
           FROM f)
         SELECT fp, doc_id, text FROM r WHERE rn = 1 ORDER BY fp""",
    // brute-force all-pairs exact Jaccard restricted to pairs that
    // touch the new batch — the x2_minhash_lsh full-equality oracle
    // (recall-1 banding + exact verify; size-ratio prune lossless at
    // tau=0.5) with the incremental restriction applied
    "x2_minhash_incr" ->
      """WITH tk AS (SELECT doc_id,
             string_split_regex(trim(text), '\s+') AS t FROM documents),
         sh AS (SELECT doc_id,
             list_distinct(CASE WHEN length(t) >= 3
               THEN list_transform(generate_series(1, length(t) - 2),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
               ELSE CAST([] AS VARCHAR[]) END) AS s
           FROM tk)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(CAST(length(list_intersect(a.s, b.s)) AS DOUBLE) /
                (length(a.s) + length(b.s) - length(list_intersect(a.s, b.s))) AS DOUBLE) AS jaccard
         FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           AND (a.doc_id % 10 >= 8 OR b.doc_id % 10 >= 8)
           AND length(a.s) <= 2 * length(b.s)
           AND length(b.s) <= 2 * length(a.s)
         WHERE length(a.s) > 0 AND length(b.s) > 0
           AND CAST(CAST(length(list_intersect(a.s, b.s)) AS DOUBLE) /
                (length(a.s) + length(b.s) - length(list_intersect(a.s, b.s))) AS DOUBLE) >= 0.5
         ORDER BY id_a, id_b""",
    // df-capped containment — x2_jaccard_dfcap's oracle without the
    // size-ratio prune (subset pairs are the signal here) and with
    // the two directed ratios instead of the symmetric one
    "x2_containment" ->
      """WITH tk AS (SELECT doc_id, lang,
             string_split_regex(trim(text), '\s+') AS t FROM documents),
         sh AS (SELECT doc_id, lang,
             list_distinct(CASE WHEN length(t) >= 3
               THEN list_transform(generate_series(1, length(t) - 2),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
               ELSE CAST([] AS VARCHAR[]) END) AS s
           FROM tk),
         inv AS (SELECT doc_id, lang, unnest(s) AS shingle FROM sh),
         keptsh AS (SELECT lang, shingle FROM inv
           GROUP BY lang, shingle HAVING count(*) <= 25),
         kept AS (SELECT i.doc_id, i.lang, i.shingle
           FROM inv i JOIN keptsh k
             ON i.lang = k.lang AND i.shingle = k.shingle),
         sz AS (SELECT doc_id, lang, count(*) AS sz
           FROM kept GROUP BY doc_id, lang),
         pairs AS (SELECT a.lang AS blk, a.doc_id AS id_a,
             b.doc_id AS id_b, count(*) AS shared
           FROM kept a JOIN kept b
             ON a.lang = b.lang AND a.shingle = b.shingle
               AND a.doc_id < b.doc_id
           GROUP BY 1, 2, 3)
         SELECT blk, id_a, id_b,
           CAST(CAST(shared AS DOUBLE) / CAST(sa.sz AS DOUBLE) AS DOUBLE) AS cont_a,
           CAST(CAST(shared AS DOUBLE) / CAST(sb.sz AS DOUBLE) AS DOUBLE) AS cont_b
         FROM pairs
           JOIN sz sa ON sa.doc_id = id_a AND sa.lang = blk
           JOIN sz sb ON sb.doc_id = id_b AND sb.lang = blk
         WHERE greatest(
             CAST(CAST(shared AS DOUBLE) / CAST(sa.sz AS DOUBLE) AS DOUBLE),
             CAST(CAST(shared AS DOUBLE) / CAST(sb.sz AS DOUBLE) AS DOUBLE)) >= 0.8
         ORDER BY blk, id_a, id_b""")
}
