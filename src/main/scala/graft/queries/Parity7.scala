package graft.queries

import graft.Tables._
import graft.ops.{Sessionize, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Round-3 coverage batch: the last TPC-H shape (Q2's correlated
  * min-subquery, adapted to lineitem-as-partsupp), plus four
  * training-data-pipeline operators: corpus-wide duplicate-chunk
  * removal, sequence packing via a distributed prefix sum, corpus
  *-frequency document scoring, and event-transition mining.
  *
  * Scale rules as the earlier batches: one fact shuffle per query
  * where possible, dims broadcast, exact decimal/integer arithmetic
  * end-to-end (results independent of partitioning), no collect().
  */
object Parity7 {
  import Exact._
  type Q = (SparkSession, String) => DataFrame


  /** Tokens per chunk for x2_chunk_dedup (cf. substring-level dedup in
    * large-corpus pipelines: drop repeated passages, keep the first
    * occurrence corpus-wide). */
  private val ChunkTokens = 20

  /** Token budget per packed sequence for x4_seq_pack. */
  private val PackBudget = 512L

  val queries: Map[String, Q] = Map(
    // ---- TPC-H Q2 (adapted): cheapest European supplier per part.
    // partsupp does not exist in the testdata; its stand-in is the
    // observed (l_partkey, l_suppkey) -> min(l_extendedprice) relation.
    // The correlated `cost = (SELECT min(cost) ...)` subquery becomes
    // a per-part min aggregate joined back on (partkey, exact-decimal
    // cost equality). One fact shuffle builds the cost relation; the
    // supplier/nation/region enrichment and the part filter broadcast;
    // the min side is a tiny aggregate AQE turns into a broadcast.
    "q2_min_cost" -> { (s, d) =>
      val eu = supplier(s, d)
        .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
      val p15 = part(s, d).filter(col("p_size") === 15)
        .select(col("p_partkey"), col("p_type"))
      // Only the selected parts' costs matter (the correlation in Q2 is
      // per surviving part), so the part predicate pre-filters the fact
      // scan as a broadcast semi-join BEFORE the aggregate: the shuffle
      // carries ~1/50th of lineitem. The per-part min is an unordered
      // window over the aggregated (part, supp) relation — one pass,
      // instead of recomputing the fact aggregate for a join-back.
      lineitem(s, d)
        .join(broadcast(p15.select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(dec2(col("l_extendedprice"))).as("supply_cost"))
        .join(broadcast(eu), col("l_suppkey") === col("s_suppkey"))
        .withColumn("min_cost",
          min(col("supply_cost")).over(Window.partitionBy(col("l_partkey"))))
        .filter(col("supply_cost") === col("min_cost"))
        .join(broadcast(p15), col("l_partkey") === col("p_partkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_type"), col("s_suppkey"),
          col("supply_cost").cast(DoubleType).as("supply_cost"))
    },

    // ---- corpus-wide duplicate-chunk removal -----------------------
    // Documents are chunked into fixed 20-token passages; a passage
    // that already occurred earlier in the corpus (smaller doc_id, or
    // earlier in the same doc) is dropped; survivors reassemble in
    // document order. The chunk texts are bound columns (slice over a
    // bound token array — the nested-HOF trap does not apply because
    // `toks` is materialized once per row), and first-occurrence is
    // one row_number window partitioned BY CHUNK TEXT — i.e. the
    // shuffle key is the content hash, which is uniform at any scale.
    "x2_chunk_dedup" -> { (s, d) =>
      val c = ChunkTokens
      val chunks = documents(s, d)
        .select(col("doc_id"), TextOps.tokens(lower(col("text"))).as("toks"))
        .select(col("doc_id"),
          posexplode(transform(
            sequence(lit(0), expr(s"(size(toks) + ${c - 1}) DIV $c - 1")),
            i => array_join(slice(col("toks"), i * c + 1, lit(c)), " "))))
        .withColumnsRenamed(Map("pos" -> "chunk_id", "col" -> "chunk"))
      chunks
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("chunk"))
            .orderBy(col("doc_id"), col("chunk_id"))))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).cast(LongType).as("n_chunks"),
          count(when(col("rn") === 1, 1)).as("n_kept"),
          array_join(transform(
            array_sort(collect_list(when(col("rn") === 1,
              struct(col("chunk_id"), col("chunk"))))),
            x => x.getField("chunk")), " ").as("kept_text"))
    },

    // ---- sequence packing (context-window packing) -----------------
    // Assign each document a (bin, offset) so concatenating documents
    // in doc_id order fills fixed 512-token training sequences. The
    // global running sum is computed as a DISTRIBUTED prefix sum —
    // per-range partial sums (one tiny aggregate) broadcast back as
    // range prefixes, then an in-range window — instead of a single
    // global-order window, which would serialize the whole table
    // through one partition at 100 TB.
    "x4_seq_pack" -> { (s, d) =>
      val n = documents(s, d)
        .select(col("doc_id"),
          size(TextOps.tokens(lower(col("text")))).cast(LongType).as("n_tokens"))
        .withColumn("rng", expr("doc_id DIV 100"))
      val rangeSums = n.groupBy(col("rng")).agg(sum(col("n_tokens")).as("rng_sum"))
        .withColumn("rng_prefix",
          coalesce(sum(col("rng_sum")).over(
            Window.orderBy(col("rng"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("rng").as("rk"), col("rng_prefix"))
      n.join(broadcast(rangeSums), col("rng") === col("rk"))
        .withColumn("off", col("rng_prefix") +
          coalesce(sum(col("n_tokens")).over(
            Window.partitionBy(col("rng")).orderBy(col("doc_id"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("doc_id"), col("n_tokens"),
          expr(s"off DIV $PackBudget").as("bin_id"),
          expr(s"off % $PackBudget").as("bin_offset"))
        // deterministic output order: the driver's correctness hash is
        // row-order-sensitive, and doc_id is unique here
        .orderBy(col("doc_id"))
    },

    // ---- corpus-frequency document scoring -------------------------
    // Two-pass quality signal (the KenLM-commonness shape): pass 1
    // aggregates corpus token frequencies; pass 2 scores each document
    // by the mean corpus frequency of its tokens. Frequencies stay
    // exact integers; the single final division is IEEE-exact and so
    // engine- and partitioning-independent. The token dictionary is
    // vocabulary-sized (≪ corpus), so it broadcasts at any scale.
    "x4_commonness" -> { (s, d) =>
      val tok = documents(s, d)
        .select(col("doc_id"), explode(TextOps.tokens(lower(col("text")))).as("tok"))
      val tf = tok.groupBy(col("tok")).agg(count(lit(1)).as("freq"))
      tok.join(broadcast(tf), Seq("tok"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("freq")).as("sum_freq"))
        .withColumn("commonness",
          (col("sum_freq").cast(DoubleType) / col("n_tokens")).cast(DoubleType))
        // deterministic output order for the driver's row-order hash
        .orderBy(col("doc_id"))
    },

    // ---- Z-order clustering key ------------------------------------
    // The native Morton-curve kernel on (l_partkey, l_suppkey): the
    // clustering key `sources/Sinks.writeZOrdered` sorts by so min-max
    // stats prune on either column. Constant-time magic-number bit
    // spreading — the DuckDB oracle replicates the identical
    // arithmetic in plain SQL, pinning the kernel cross-engine.
    // NOTE: this query exercises the RAW kernel, which masks each
    // input to its low 31 bits — ids above 2^31 (TPC-H partkey near
    // sf~1000) would alias. The production write path
    // (writeZOrdered) grid-normalizes to 16 bits via min/max first
    // and has no such limit; keep using it for real layouts.
    "x8_zorder_curve" -> { (s, d) =>
      lineitem(s, d).filter(col("l_orderkey") <= 2000)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"),
          graft.functions.ZOrder2.zorder2(
            col("l_partkey"), col("l_suppkey")).as("z"))
    },

    // ---- benchmark decontamination ---------------------------------
    // The eval-set leakage check every training pipeline runs: flag
    // corpus documents sharing any word 3-gram with a probe
    // ("benchmark") set. Probe shingles are benchmark-sized, so they
    // BROADCAST — the corpus side stays map-only through the overlap
    // join; the only shuffle is the per-doc count. (At extreme probe
    // sizes, the bloom-filter pre-prune of x6_bloom_semi composes in
    // front of the exact join unchanged.) Shingling is the native
    // one-pass ShingleSet kernel.
    "x4_decontaminate" -> { (s, d) =>
      val sh = documents(s, d)
        .select(col("doc_id"),
          explode(TextOps.shingles(lower(col("text")), 3)).as("sh"))
      val probe = sh.filter(col("doc_id") % 50 === 0)
        .select(col("sh")).distinct()
      sh.filter(col("doc_id") % 50 =!= 0)
        .join(broadcast(probe), Seq("sh"))
        .groupBy(col("doc_id"))
        // shingle sets are distinct per doc, so plain count == number
        // of distinct leaked n-grams (no count-distinct Expand needed)
        .agg(count(lit(1)).as("n_overlap"))
    },

    // ---- SCD2 history build (CDC compaction) -----------------------
    // Turn a change stream into slowly-changing-dimension intervals:
    // keep only rows whose value differs from the previous row per
    // key, then close each interval at the next change. Two window
    // passes over the SAME (user_id) partitioning — one shuffle, the
    // second Window reuses the first's distribution. Event-time stays
    // in integer microseconds end-to-end.
    "x1_scd2_history" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      eventsNs(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          Sessionize.nsToUs(col("ts")).as("us"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
        .withColumn("valid_to_us", lead(col("us"), 1).over(w) - 1)
        .select(col("user_id"), col("event_type"),
          col("us").as("valid_from_us"), col("valid_to_us"))
    },

    // ---- sketch-based heavy hitters --------------------------------
    // Spark 4.1's ApproxTopK (DataSketches frequent-items) as a
    // single-pass mergeable top-k: partials combine associatively
    // across partitions/files like the HLL and MinHash sketches. With
    // maxItemsTracked >= |distinct| the counts are EXACT, so the
    // result is deterministic and oracle-checkable; at web scale the
    // same call with a bounded map gives the guaranteed-error
    // approximate answer in one pass with O(map) memory per partition.
    "x6_approx_topk" -> { (s, d) =>
      eventsNs(s, d)
        .agg(expr("approx_top_k(event_type, 3, 64)").as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e.item").as("event_type"),
          col("e.count").as("cnt"))
        .orderBy(col("cnt").desc, col("event_type"))
    },

    // ---- event-transition mining -----------------------------------
    // Per-user behavioral bigrams: order each user's events by time,
    // lag the event type, count (prev -> next) transitions, keep the
    // top 20 under a total order. One shuffle for the lag window (by
    // user), one for the count; the top-k is a 25-row sort.
    "x5_transitions" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      eventsNs(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("src_type", lag(col("event_type"), 1).over(w))
        .filter(col("src_type").isNotNull)
        .groupBy(col("src_type"), col("event_type").as("dst_type"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("src_type"), col("dst_type"))
        .limit(20)
    })

  val oracles: Map[String, String] = Map(
    "q2_min_cost" ->
      """WITH cost AS (SELECT l_partkey, l_suppkey,
             min(CAST(l_extendedprice AS DECIMAL(18,2))) AS supply_cost
           FROM lineitem GROUP BY 1, 2),
         eu AS (SELECT s_suppkey, s_name, s_acctbal, n_name
           FROM supplier
           JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           WHERE r_name = 'EUROPE')
         SELECT s_acctbal, s_name, n_name, p_partkey, p_type, s_suppkey,
           CAST(c.supply_cost AS DOUBLE) AS supply_cost
         FROM part, cost c, eu
         WHERE p_partkey = c.l_partkey AND c.l_suppkey = eu.s_suppkey
           AND p_size = 15
           AND c.supply_cost = (SELECT min(c2.supply_cost)
                                FROM cost c2, eu e2
                                WHERE c2.l_partkey = p_partkey
                                  AND c2.l_suppkey = e2.s_suppkey)""",
    "x2_chunk_dedup" ->
      """WITH t AS (SELECT doc_id,
             string_split_regex(trim(lower(text)), '\s+') AS toks
           FROM documents),
         ch AS (SELECT doc_id, i AS chunk_id,
             array_to_string(toks[(i*20+1):(i*20+20)], ' ') AS chunk
           FROM t, unnest(range(0, (len(toks)+19)//20)) AS u(i)),
         k AS (SELECT doc_id, chunk_id, chunk,
             row_number() OVER (PARTITION BY chunk
               ORDER BY doc_id, chunk_id) AS rn
           FROM ch)
         SELECT doc_id, count(*) AS n_chunks,
           count(*) FILTER (WHERE rn = 1) AS n_kept,
           coalesce(string_agg(CASE WHEN rn = 1 THEN chunk END, ' '
             ORDER BY chunk_id), '') AS kept_text
         FROM k GROUP BY doc_id""",
    "x4_seq_pack" ->
      """WITH t AS (SELECT doc_id,
             CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT)
               AS n_tokens
           FROM documents),
         c AS (SELECT doc_id, n_tokens,
             CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS off
           FROM t)
         SELECT doc_id, n_tokens, off // 512 AS bin_id,
           off % 512 AS bin_offset
         FROM c ORDER BY doc_id""",
    "x4_commonness" ->
      """WITH tok AS (SELECT doc_id,
             unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
           FROM documents),
         tf AS (SELECT tok, count(*) AS freq FROM tok GROUP BY tok)
         SELECT doc_id, count(*) AS n_tokens, CAST(sum(freq) AS BIGINT) AS sum_freq,
           CAST(CAST(sum(freq) AS DOUBLE) / count(*) AS DOUBLE) AS commonness
         FROM tok JOIN tf USING (tok)
         GROUP BY doc_id ORDER BY doc_id""",
    "x8_zorder_curve" ->
      """WITH b0 AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             l_partkey & 2147483647 AS x, l_suppkey & 2147483647 AS y
           FROM lineitem WHERE l_orderkey <= 2000),
         b1 AS (SELECT * REPLACE ((x | (x << 16)) & 281470681808895 AS x,
                                  (y | (y << 16)) & 281470681808895 AS y) FROM b0),
         b2 AS (SELECT * REPLACE ((x | (x << 8)) & 71777214294589695 AS x,
                                  (y | (y << 8)) & 71777214294589695 AS y) FROM b1),
         b3 AS (SELECT * REPLACE ((x | (x << 4)) & 1085102592571150095 AS x,
                                  (y | (y << 4)) & 1085102592571150095 AS y) FROM b2),
         b4 AS (SELECT * REPLACE ((x | (x << 2)) & 3689348814741910323 AS x,
                                  (y | (y << 2)) & 3689348814741910323 AS y) FROM b3),
         b5 AS (SELECT * REPLACE ((x | (x << 1)) & 6148914691236517205 AS x,
                                  (y | (y << 1)) & 6148914691236517205 AS y) FROM b4)
         SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           (x << 1) | y AS z
         FROM b5""",
    "x4_decontaminate" ->
      """WITH t AS (SELECT doc_id,
             string_split_regex(trim(lower(text)), '\s+') AS toks
           FROM documents),
         sh AS (SELECT DISTINCT doc_id,
             toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS sh
           FROM t, unnest(range(1, len(toks) - 1)) AS u(i)),
         p AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 50 = 0)
         SELECT doc_id, count(*) AS n_overlap
         FROM sh JOIN p USING (sh)
         WHERE doc_id % 50 <> 0
         GROUP BY doc_id""",
    "x1_scd2_history" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
             epoch_us(ts) AS us FROM events),
         c AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id
             ORDER BY us, event_id) AS prev FROM e),
         ch AS (SELECT user_id, event_id, event_type, us FROM c
           WHERE prev IS NULL OR prev <> event_type)
         SELECT user_id, event_type, us AS valid_from_us,
           lead(us) OVER (PARTITION BY user_id
             ORDER BY us, event_id) - 1 AS valid_to_us
         FROM ch""",
    "x6_approx_topk" ->
      """SELECT event_type, count(*) AS cnt FROM events
         GROUP BY event_type
         ORDER BY cnt DESC, event_type LIMIT 3""",
    "x5_transitions" ->
      """WITH l AS (SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS src_type
           FROM events)
         SELECT src_type, event_type AS dst_type, count(*) AS cnt
         FROM l WHERE src_type IS NOT NULL
         GROUP BY 1, 2
         ORDER BY cnt DESC, src_type, dst_type
         LIMIT 20""")
}
