package graft.queries

import graft.Tables._
import graft.ops.{Dedup, Sessionize, Similarity, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** North-star extension queries (SURVEY.md §2.8): dedup, similarity
  * search, text analysis, sessionization, sketches — the operators a
  * 100 TB training-data pipeline needs, each wired to the harness
  * `documents` / `embeddings` / `events` tables.
  *
  * Queries with a DuckDB-expressible semantics carry an oracle; the
  * hash-based ones (xxhash64 MinHash/SimHash/LSH) are declared without
  * oracle (driver rows-only check) and are instead verified by
  * ScalaTest against planted near-duplicates and the exact operators.
  */
object ExtQueries {
  type Q = (SparkSession, String) => DataFrame

  /** events.ts is INT64 epoch-nanos; make sure any session reads it
    * as long even if the driver built the session without the flag. */

  val queries: Map[String, Q] = Map(
    // ---- X4 text analysis --------------------------------------
    "x4_text_stats" -> { (s, d) =>
      documents(s, d).select(
        col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_tokens"),
        length(col("text")).cast(IntegerType).as("n_chars_len"),
        TextOps.avgTokenLen(col("text")).as("avg_token_len"),
        TextOps.stopwordCount(col("text")).as("stop_cnt"),
        TextOps.stopwordRatio(col("text")).as("stop_ratio"))
    },
    "x4_quality_score" -> { (s, d) =>
      documents(s, d).select(
        col("doc_id"),
        TextOps.qualityScore(col("text")).as("quality_score"))
    },
    "x4_fingerprint" -> { (s, d) =>
      documents(s, d).select(
        col("doc_id"),
        TextOps.fingerprint(col("text")).as("fp"))
    },
    // Winnowing rolling-hash fingerprints — xxhash64-based, so the
    // fingerprint VALUES are not SQL-replayable (the md5 twin
    // x4_winnow_poly hash-checks those end to end; OpsSpec pins the
    // shared-substring property). This row carries the BOUNDED oracle
    // form instead: the value assertion is the DuckDB-replayable
    // shingle count, and `in_bound` pins the winnow kernel's
    // guaranteed density envelope — for m >= w hashes the distinct
    // window-minima count lies in [floor(m/w), m-w+1] (at least one
    // selection per w consecutive windows; at most one per window),
    // and for m < w winnowing degrades to the distinct hash set, so
    // the count equals m exactly. A broken window size, a lost
    // distinct, or an empty-output regression flips the boolean.
    "x4_winnowing" -> { (s, d) =>
      val w = 4
      documents(s, d)
        .withColumn("hs", TextOps.shingleHashes(col("text")))
        .withColumn("n_fp", size(TextOps.winnowFromHashes(col("hs"), w)))
        .select(col("doc_id"),
          size(col("hs")).as("n_shingles"),
          when(size(col("hs")) >= w,
            col("n_fp") >= floor(size(col("hs")) / w) &&
              col("n_fp") <= size(col("hs")) - (w - 1))
            .otherwise(col("n_fp") === size(col("hs"))).as("in_bound"))
    },
    "x4_langid" -> { (s, d) =>
      documents(s, d)
        .withColumn("toks", TextOps.tokens(lower(col("text"))))
        .withColumn("lp", TextOps.langPacked(col("toks")))
        .select(
          col("doc_id"),
          col("lang"),
          TextOps.langIdFromPacked(col("text"), col("lp")).as("lang_pred"))
    },

    // ---- X1/X2 dedup -------------------------------------------
    "x1_dedup_exact" -> { (s, d) =>
      Dedup.exactGroups(documents(s, d))
    },
    "x2_ngram_jaccard" -> { (s, d) =>
      Dedup.ngramJaccardPairs(documents(s, d), tau = 0.5, blockCol = "lang")
    },
    // PPJoin prefix-filtered exact Jaccard pairs at the true
    // near-dup threshold (tau=0.8, where the rarest-first prefix is
    // ~20% of each set and the candidate space collapses — see
    // ops/Dedup scaladoc). Survivors verify with one exact array
    // intersection, so the result is oracle-exact.
    "x2_ppjoin" -> { (s, d) =>
      Dedup.ngramJaccardPairsPrefix(documents(s, d), tau = 0.8,
        blockCol = "lang")
        .orderBy(col("blk"), col("id_a"), col("id_b"))
    },
    // The PRODUCTION xxhash64 LSH path — and still fully
    // hash-checked: banding at (k=32, b=16, r=2) detects a J>=0.5
    // pair with p = 1-(1-J²)^16 and the corpus's true near-dups all
    // sit at J>=0.7 (p >= 1-0.51^16 ≈ 1-2e-5; measured: emitted ==
    // brute-force exact(J>=0.5) at sf0.001/0.01/0.1 — PairCheck),
    // so after the exact-Jaccard verify the emitted set EQUALS the
    // brute-force all-pairs J>=0.5 set and the oracle recomputes it
    // without replaying xxhash. A banding/verify regression breaks
    // the equality and the row goes red.
    //
    // DATA-REGEN GATE: this full-equality oracle encodes a measured
    // corpus property (LSH recall exactly 1 — a marginal pair near
    // J=0.5 misses a band with ~(1-J^2)^16 ≈ 1% odds), not an engine
    // invariant. Whenever the test corpora are regenerated, re-run
    // `sbt "runMain graft.bench.PairCheck"` FIRST: it prints mh==exact per
    // SF, so a red row traces to data, not engine.
    "x2_minhash_lsh" -> { (s, d) =>
      Dedup.minhashNearDupPairs(documents(s, d), tau = 0.5)
        .orderBy(col("id_a"), col("id_b"))
    },
    // xxhash64 SimHash (Hamming <= 3) — the emitted-pair SET is
    // rows-only by nature (Hamming-ball membership is a property of
    // the 64 xxhash sign sums; measured against brute-force exact
    // Jaccard it is neither a subset nor superset of any J-level
    // set), so this row carries the BOUNDED oracle instead (the
    // x6_approx_sketch pattern): the exact value assertion is the
    // DuckDB-replayable planted-pair count (brute-force J >= 0.7);
    // `recall_ok` pins simhash's planted recall at >= 0.5 (measured
    // 0.60 / 0.74 / 0.75 at sf0.01 / 0.1 / 0.001 — deterministic,
    // xxhash is); `ham_ok` re-derives every emitted pair's Hamming
    // through the INDEPENDENT explode+aggregate signature path and
    // requires it to agree with the native kernel and stay <= 3. The
    // pair-level pipeline stays fully hash-checked via the poly twin.
    "x2_simhash" -> { (s, d) =>
      val docs = documents(s, d)
      val emitted = Dedup.simhashNearDupPairs(docs, maxHamming = 3)
      val sigs = Dedup.simhashSignatures(docs, native = false)
      val ham = emitted
        .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")),
          Seq("id_a"))
        .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")),
          Seq("id_b"))
        .select((bit_count(col("sig_a").bitwiseXOR(col("sig_b")))
          .cast(IntegerType) === col("hamming") &&
          col("hamming") <= 3).as("ok"))
      // planted truth: the production minhash path equals brute-force
      // exact Jaccard on this corpus (PairCheck; the x2_minhash_lsh
      // full-equality argument), so it supplies the J>=0.7 pair set
      // without an all-pairs scan
      val planted = Dedup.minhashNearDupPairs(docs, tau = 0.7)
        .select(col("id_a"), col("id_b"))
      val hits = planted.join(emitted.select(col("id_a"), col("id_b")),
        Seq("id_a", "id_b"), "left_semi")
      planted.agg(count(lit(1)).as("n_planted"))
        .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
        .crossJoin(ham.agg(coalesce(bool_and(col("ok")), lit(true))
          .as("ham_ok")))
        .select(col("n_planted"),
          (col("n_hit").cast("double") >=
            col("n_planted").cast("double") * lit(0.5)).as("recall_ok"),
          col("ham_ok"))
    },
    // the oracle-expressible md5-hash twins (x4_winnow_poly
    // precedent): same banding / chunking / exact-verify shape, but
    // every hash is SQL-replayable, so the driver hash-checks the
    // full candidate-generation + verification pipeline instead of
    // counting rows. ScalaTest pins poly == production recall on the
    // planted near-dup set.
    "x2_minhash_poly" -> { (s, d) =>
      Dedup.minhashNearDupPairsPoly(documents(s, d), tau = 0.5)
        .orderBy(col("id_a"), col("id_b"))
    },
    "x2_simhash_poly" -> { (s, d) =>
      Dedup.simhashNearDupPairsPoly(documents(s, d), maxHamming = 3)
        .orderBy(col("id_a"), col("id_b"))
    },

    // ---- X3 similarity search ----------------------------------
    "x3_knn_bruteforce" -> { (s, d) =>
      Similarity.knnBruteForce(embeddings(s, d), probeId = 0L, k = 10)
    },
    "x3_neardup_pairs" -> { (s, d) =>
      Similarity.cosinePairsBlocked(embeddings(s, d), tau = 0.3,
        blockCol = "label")
    },
    // LSH-bucketed ANN, bounded-oracle form (Similarity.recallChecked):
    // one row per probe carrying the exact k-th-neighbor cosine (DuckDB
    // recomputes it brute-force — real value assertion) plus a boolean
    // pinning recall@5 >= 0.8 (RecallSpec's floor with these harness
    // params; measured 0.933). 8 tables of 6 bits: single-table recall
    // collapses on moderate-similarity neighbors (p^6), multi-table is
    // the standard production shape. Pair-level ANN stays hash-checked
    // end to end via x3_ann_poly.
    "x3_ann_lsh" -> { (s, d) =>
      val emb = embeddings(s, d)
      val probes = emb.filter(col("vec_id") < 3)
      val ann = Similarity.annTopK(emb, probes, dim = 64,
        k = 5, nBits = 6, nTables = 8, multiprobe = true)
      Similarity.recallChecked(ann, emb, probes, k = 5, floor = 0.8)
    },
    // the oracle-replayable ANN twin: sign projections from md5
    // parity, exact micro-unit-long accumulation, bucket equi-join,
    // exact-cosine top-k — DuckDB replays the ENTIRE pipeline, so
    // this row hash-checks ANN end-to-end (production xxhash64
    // variants above stay rows-only + RecallSpec).
    "x3_ann_poly" -> { (s, d) =>
      val emb = embeddings(s, d)
      Similarity.annTopKPoly(emb, emb.filter(col("vec_id") < 3),
        dim = 64, nBits = 6, k = 5)
        .orderBy(col("probe_id"), col("rk"))
    },
    // IVF-list ANN over k-means-trained lists, bounded-oracle form
    // (same pattern as x3_ann_lsh; RecallSpec floor 0.8, measured
    // 0.933 with trained centroids).
    "x3_ann_ivf" -> { (s, d) =>
      val emb = embeddings(s, d)
      val probes = emb.filter(col("vec_id") < 3)
      val cents = Similarity.kmeansCentroids(emb, k = 16, iters = 3)
      val ann = Similarity.ivfTopK(emb, probes, k = 5,
        nLists = 16, nProbe = 4, centroids = Some(cents))
      Similarity.recallChecked(ann, emb, probes, k = 5, floor = 0.8)
    },

    // As-of (backward) join: enrich each event with the customer's
    // most recent order at event time (union-merge window pattern;
    // oracle = DuckDB native ASOF JOIN). Right side deduplicated to
    // one deterministic row per (key, time) so ties are well-defined.
    "asof_join" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ev = eventsNs(s, d).select(
        col("event_id"),
        (col("user_id") % 100 + 1).cast("long").as("custkey"),
        Sessionize.nsToUs(col("ts")).as("t_us"))
      // keep the max-orderkey version per (custkey, day): max_by
      // aggregate instead of a row_number window — map-side combine
      // shrinks the shuffle to one row per key, no sort
      val od = orders(s, d).select(
        col("o_custkey").as("custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_us"),
        col("o_orderkey"),
        Exact.dec2(col("o_totalprice")).cast("double").as("o_price"))
        .groupBy(col("custkey"), col("o_us"))
        .agg(max_by(struct(col("o_orderkey"), col("o_price")),
          col("o_orderkey")).as("_v"))
        .select(col("custkey"), col("o_us"),
          col("_v.o_orderkey").as("o_orderkey"),
          col("_v.o_price").as("o_price"))
      graft.ops.AsofJoin.asofBackward(ev, od, "custkey", "t_us", "o_us",
        Seq("o_orderkey", "o_price"))
    },

    // ---- X5 event windows / sessionization ---------------------
    "x5_tumbling" -> { (s, d) => Sessionize.tumblingAgg(eventsNs(s, d)) },
    "x5_sessionize" -> { (s, d) => Sessionize.sessionize(eventsNs(s, d)) },

    // ---- X6 sketches / distinct --------------------------------
    "x6_exact_distinct" -> { (s, d) =>
      eventsNs(s, d)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
    },
    // HLL++ / KLL — approximate by design, so the raw estimates can
    // never hash-match an oracle; instead the query CHECKS them: it
    // emits the exact values (DuckDB recomputes those — real value
    // assertions) plus booleans pinning each estimate inside its
    // published error bound (HLL++ rsd=0.05 default → 3σ = 15%;
    // percentile_approx accuracy=10000 → rank error 1e-4, asserted
    // against the far-looser exact p45..p55 bracket — wide because
    // percentile_approx returns an actual data ELEMENT while exact
    // percentiles interpolate: on a coarse-valued group no element
    // need fall inside a tight interpolated bracket, so a narrow one
    // would flake on regenerated data with a healthy sketch). A
    // sketch that drifts out of bound flips a boolean, row goes red.
    "x6_approx_sketch" -> { (s, d) =>
      val ev = eventsNs(s, d)
      val approx = ev.groupBy(col("event_type"))
        .agg(
          approx_count_distinct(col("user_id")).as("approx_users"),
          percentile_approx(col("value"), lit(0.5), lit(10000))
            .as("approx_p50"))
      val exact = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"),
          expr("percentile(value, 0.45)").as("p45"),
          expr("percentile(value, 0.55)").as("p55"))
      approx.join(exact, Seq("event_type"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx_users") - col("exact_users")) <=
            col("exact_users") * 0.15).as("users_in_bound"),
          (col("approx_p50") >= col("p45") &&
            col("approx_p50") <= col("p55")).as("p50_in_bound"))
        .orderBy(col("event_type"))
    },
    // ---- multimodal: real JDK image codec (SURVEY §2.8) ---------
    "mm_frames" -> { (s, d) =>
      graft.ops.Multimodal.sampleFrames(s,
        graft.ops.Multimodal.fromText(documents(s, d)), stride = 64)
    },
    // REAL decode, fully oracle-checked: synthImages encodes one
    // deterministic grayscale PNG per doc_id through the JDK PNG
    // writer (pixel (x,y) = (id*31+7x+13y) mod 256, dims keyed by
    // id); decodeStats decodes the actual bytes back with ImageIO
    // and emits exact integer pixel statistics. The oracle recomputes
    // the same statistics from the id arithmetic ALONE — agreement
    // proves the encode → PNG → decode → pool pipeline bit-exact.
    "mm_features" -> { (s, d) =>
      val media = graft.ops.Multimodal.synthImages(s, documents(s, d))
      graft.ops.Multimodal.decodeStats(s, media).toDF()
        .orderBy(col("media_id"))
    },
    // decode → area-average downscale ×2 → PNG re-encode → decode:
    // the resize path through the real codec, oracle-checked on the
    // resized luminance total (floor-division block averages are
    // exact integer arithmetic on both sides; trailing odd row/col
    // dropped by both).
    "mm_resize" -> { (s, d) =>
      val media = graft.ops.Multimodal.synthImages(s, documents(s, d))
      val resized = graft.ops.Multimodal.resizeImages(s, media, factor = 2)
      graft.ops.Multimodal.decodeStats(s, resized).toDF()
        .select(col("media_id"), col("width"), col("height"),
          col("lum_sum"))
        .orderBy(col("media_id"))
    },
    // exact binary-payload dedup: the md5 content key over the OPAQUE
    // payload bytes (images dedup by content hash long before any
    // decode) — one hash-partitioned aggregate, keep lowest id.
    "mm_dedup" -> { (s, d) =>
      graft.ops.Multimodal.fromText(documents(s, d))
        .groupBy(md5(col("payload")).as("content_key"))
        .agg(min(col("media_id")).as("keep_id"),
          count(lit(1)).as("n_copies"))
        .orderBy(col("content_key"))
    },
    "x6_quantiles" -> { (s, d) =>
      eventsNs(s, d)
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.95)"), 4).as("p95"))
    },
    // KMV (k-minimum-values) distinct sketch with the replayable md5
    // hash — the oracle-checked SKETCH row (the poly-twin pattern,
    // X6 edition). KMV is deterministic given the hash: keep the k
    // smallest distinct hash values per group; if fewer than k exist
    // the count is exact, else estimate (k-1)·2^60 / h_k. The oracle
    // replays hashing, the k-minima cut, and the estimator formula,
    // so the driver hash-checks an approximate-distinct pipeline end
    // to end. Scale shape: map-only hash + one (group, h) distinct
    // shuffle + per-group bounded top-k (TopKPerKey-rewritable).
    "x6_kmv_poly" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val k = 64
      val hashed = eventsNs(s, d)
        .select(col("event_type"),
          TextOps.polyHash60(col("user_id").cast("string")).as("h"))
        .distinct()
      val w = Window.partitionBy(col("event_type")).orderBy(col("h").asc)
      hashed.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .drop("rn") // dropping rn lets TopKRewriteRule plan the heap
        .groupBy(col("event_type"))
        .agg(max(col("h")).as("hk"), count(lit(1)).as("n_min"))
        .select(col("event_type"), col("n_min"),
          when(col("n_min") < k, col("n_min").cast("double"))
            .otherwise(lit((k - 1).toDouble) *
              lit(1152921504606846976.0) / col("hk").cast("double"))
            .as("est_distinct"))
        .orderBy(col("event_type"))
    },
    // Mergeable HLL sketches (Apache DataSketches built-ins): the
    // persistable-sketch path for X6 — per-group sketches unioned to
    // a global estimate without re-scanning. Same bounded-oracle
    // pattern as x6_approx_sketch: the oracle recomputes n_groups and
    // the exact union cardinality; the sketch estimate is asserted
    // within 5% (lgK=12 → rsd 1.04/√4096 ≈ 1.6%, 3σ ≈ 4.9%).
    "x6_hll_sketch" -> { (s, d) =>
      val ev = eventsNs(s, d)
      val perType = ev
        .groupBy(col("event_type"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      val est = perType.agg(
        hll_sketch_estimate(hll_union_agg(col("sk")))
          .cast("long").as("approx_total_users"),
        count(lit(1)).as("n_groups"))
      val exact = ev.agg(
        countDistinct(col("user_id")).as("exact_total_users"))
      est.crossJoin(exact)
        .select(col("n_groups"), col("exact_total_users"),
          (abs(col("approx_total_users") - col("exact_total_users")) <=
            col("exact_total_users") * 0.05).as("union_in_bound"))
    })

  private val toksCte =
    """WITH tk AS (
         SELECT doc_id, lang, text,
                string_split_regex(trim(text), '\s+') AS t
         FROM documents)"""

  /** Shared bounded oracle for the approximate-ANN rows: brute-force
    * exact top-5 per probe (same decimal arithmetic as
    * x3_knn_bruteforce — bit-identical to the Spark quantized-long
    * path), emitting the rank-5 cosine as the value assertion; the
    * recall boolean is required TRUE (the Spark side computes it
    * against the same exact top-k). */
  private[queries] val annRecallOracle = """
      WITH ex AS (SELECT vec_id,
             CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(18,6)) AS x,
             generate_subscripts(embedding, 1) AS i
           FROM embeddings),
      n2 AS (SELECT vec_id, sum(x * x) AS n2 FROM ex GROUP BY vec_id),
      px AS (SELECT vec_id AS probe_id, i, x AS p FROM ex WHERE vec_id < 3),
      dots AS (SELECT px.probe_id, e.vec_id AS id, sum(e.x * px.p) AS d
           FROM ex e JOIN px ON e.i = px.i AND e.vec_id <> px.probe_id
           GROUP BY px.probe_id, e.vec_id),
      scored AS (SELECT dots.probe_id, dots.id,
             CAST(CAST(d AS DOUBLE) /
                  (sqrt(CAST(nb.n2 AS DOUBLE)) * sqrt(CAST(np.n2 AS DOUBLE)))
               AS DOUBLE) AS cosine_sim
           FROM dots
           JOIN n2 nb ON nb.vec_id = dots.id
           JOIN n2 np ON np.vec_id = dots.probe_id),
      ranked AS (SELECT *, row_number() OVER (PARTITION BY probe_id
             ORDER BY cosine_sim DESC, id ASC) AS rk FROM scored)
      SELECT probe_id, cosine_sim AS kth_exact_cos, TRUE AS recall_ok
      FROM ranked WHERE rk = 5 ORDER BY probe_id"""

  val oracles: Map[String, String] = Map(
    "x4_text_stats" -> s"""$toksCte
      SELECT doc_id,
        CAST(length(t) AS INTEGER) AS n_tokens,
        CAST(length(text) AS INTEGER) AS n_chars_len,
        CAST(CAST(list_aggregate(list_transform(t, x -> length(x)), 'sum') AS DOUBLE) / length(t) AS DOUBLE) AS avg_token_len,
        CAST(len(list_filter(t, x -> lower(x) IN ('the','a','and','of','to','in','is','it','for','on'))) AS INTEGER) AS stop_cnt,
        CAST(CAST(len(list_filter(t, x -> lower(x) IN ('the','a','and','of','to','in','is','it','for','on'))) AS DOUBLE) / length(t) AS DOUBLE) AS stop_ratio
      FROM tk""",
    "x4_quality_score" -> s"""$toksCte
      , st AS (SELECT doc_id,
          CAST(length(t) AS DOUBLE) AS n,
          CAST(CAST(len(list_filter(t, x -> lower(x) IN ('the','a','and','of','to','in','is','it','for','on'))) AS DOUBLE) / length(t) AS DOUBLE) AS ratio,
          CAST(CAST(list_aggregate(list_transform(t, x -> length(x)), 'sum') AS DOUBLE) / length(t) AS DOUBLE) AS atl
        FROM tk)
      SELECT doc_id,
        CAST((least(n / 50.0, 1.0) + least(ratio * 5.0, 1.0) +
              (CASE WHEN atl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)) / 3.0 AS DOUBLE) AS quality_score
      FROM st""",
    "x4_fingerprint" ->
      """SELECT doc_id,
         md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp
         FROM documents""",
    "x4_langid" -> """
      WITH tk AS (SELECT doc_id, lang, text,
          string_split_regex(trim(lower(text)), '\s+') AS t FROM documents),
      sc AS (SELECT doc_id, lang,
        CAST(len(list_filter(t, x -> x IN ('the','and','of','is','with'))) AS DOUBLE) AS s_en,
        CAST(len(list_filter(t, x -> x IN ('le','la','les','et','est'))) AS DOUBLE) AS s_fr,
        CAST(len(list_filter(t, x -> x IN ('el','los','las','es','y'))) AS DOUBLE) AS s_es,
        CAST(len(list_filter(t, x -> x IN ('der','die','das','und','ist'))) AS DOUBLE) AS s_de,
        CAST(length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS DOUBLE) AS s_zh
        FROM tk)
      SELECT doc_id, lang,
        CASE WHEN greatest(s_en, s_fr, s_es, s_de, s_zh) <= 0 THEN 'en'
             WHEN s_en >= s_fr AND s_en >= s_es AND s_en >= s_de AND s_en >= s_zh THEN 'en'
             WHEN s_fr >= s_es AND s_fr >= s_de AND s_fr >= s_zh THEN 'fr'
             WHEN s_es >= s_de AND s_es >= s_zh THEN 'es'
             WHEN s_de >= s_zh THEN 'de'
             ELSE 'zh' END AS lang_pred
      FROM sc""",
    // bounded winnowing oracle: exact DuckDB-replayable shingle count
    // + required-TRUE density-envelope boolean (see the query comment)
    "x4_winnowing" -> s"""$toksCte
      , sh AS (SELECT doc_id,
          list_distinct(CASE WHEN length(t) >= 3
            THEN list_transform(generate_series(1, length(t) - 2),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
            ELSE CAST([] AS VARCHAR[]) END) AS s
        FROM tk)
      SELECT doc_id, CAST(length(s) AS INTEGER) AS n_shingles,
             TRUE AS in_bound
      FROM sh""",
    "x1_dedup_exact" ->
      """SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp,
         min(doc_id) AS keep_id, count(*) AS n_copies
         FROM documents GROUP BY 1""",
    "x2_ngram_jaccard" -> s"""$toksCte
      , sh AS (SELECT doc_id, lang,
          list_distinct(CASE WHEN length(t) >= 3
            THEN list_transform(generate_series(1, length(t) - 2),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
            ELSE CAST([] AS VARCHAR[]) END) AS s
        FROM tk)
      SELECT a.lang AS blk, a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(CAST(length(list_intersect(a.s, b.s)) AS DOUBLE) /
             (length(a.s) + length(b.s) - length(list_intersect(a.s, b.s))) AS DOUBLE) AS jaccard
      FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE length(a.s) > 0 AND length(b.s) > 0
        AND CAST(CAST(length(list_intersect(a.s, b.s)) AS DOUBLE) /
             (length(a.s) + length(b.s) - length(list_intersect(a.s, b.s))) AS DOUBLE) >= 0.5""",
    // full-equality oracle for the production LSH path: brute-force
    // all-pairs exact Jaccard (cross-language; the size-ratio prune
    // max <= 2*min is lossless at tau=0.5 since J>=0.5 forces
    // |A∩B| >= (|A|+|B|)/3 and |A∩B| <= min). See the query comment
    // for why LSH recall is deterministically 1 on this corpus.
    "x2_minhash_lsh" -> s"""$toksCte
      , sh AS (SELECT doc_id,
          list_distinct(CASE WHEN length(t) >= 3
            THEN list_transform(generate_series(1, length(t) - 2),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
            ELSE CAST([] AS VARCHAR[]) END) AS s
        FROM tk)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(CAST(length(list_intersect(a.s, b.s)) AS DOUBLE) /
             (length(a.s) + length(b.s) - length(list_intersect(a.s, b.s))) AS DOUBLE) AS jaccard
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        AND length(a.s) <= 2 * length(b.s)
        AND length(b.s) <= 2 * length(a.s)
      WHERE length(a.s) > 0 AND length(b.s) > 0
        AND CAST(CAST(length(list_intersect(a.s, b.s)) AS DOUBLE) /
             (length(a.s) + length(b.s) - length(list_intersect(a.s, b.s))) AS DOUBLE) >= 0.5
      ORDER BY id_a, id_b""",
    "x2_minhash_poly" -> s"""$toksCte
      , sh AS (SELECT doc_id,
          list_distinct(CASE WHEN length(t) >= 3
            THEN list_transform(generate_series(1, length(t) - 2),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
            ELSE CAST([] AS VARCHAR[]) END) AS s
        FROM tk),
      hb AS (SELECT doc_id, s,
          list_transform(s, g ->
            CAST(list_sum(list_transform(generate_series(1, 15),
              p -> (CAST(strpos('0123456789abcdef',
                substring(md5(g), p, 1))
                AS BIGINT) - 1) << (4 * (15 - p)))) AS BIGINT)) AS hs1,
          list_transform(s, g ->
            CAST(list_sum(list_transform(generate_series(16, 29),
              p -> (CAST(strpos('0123456789abcdef',
                substring(md5(g), p, 1))
                AS BIGINT) - 1) << (4 * (29 - p)))) AS BIGINT)) AS hs2
        FROM sh WHERE length(s) > 0),
      sg AS (SELECT doc_id, s,
          list_transform(generate_series(0, 31), i ->
            CAST(list_min(list_transform(generate_series(1, length(hs1)),
              j -> (hs1[j] + i * hs2[j])
                % ${TextOps.MinHashMod})) AS BIGINT)) AS sig
        FROM hb),
      bk AS (SELECT doc_id,
          unnest(list_transform(generate_series(0, 15), j ->
            CAST(j AS VARCHAR) || ':' ||
            CAST(sig[2*j+1] AS VARCHAR) || ',' ||
            CAST(sig[2*j+2] AS VARCHAR))) AS key
        FROM sg),
      cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bk a JOIN bk b ON a.key = b.key AND a.doc_id < b.doc_id)
      SELECT c.id_a, c.id_b,
        CAST(CAST(length(list_intersect(x.s, y.s)) AS DOUBLE) /
             (length(x.s) + length(y.s) - length(list_intersect(x.s, y.s)))
          AS DOUBLE) AS jaccard
      FROM cand c
      JOIN sh x ON x.doc_id = c.id_a
      JOIN sh y ON y.doc_id = c.id_b
      WHERE CAST(CAST(length(list_intersect(x.s, y.s)) AS DOUBLE) /
             (length(x.s) + length(y.s) - length(list_intersect(x.s, y.s)))
          AS DOUBLE) >= 0.5
      ORDER BY id_a, id_b""",
    "x2_simhash_poly" -> s"""$toksCte
      , hs AS (SELECT doc_id,
          list_transform(t, g ->
            CAST(list_sum(list_transform(generate_series(1, 15),
              p -> (CAST(strpos('0123456789abcdef',
                substring(md5(g), p, 1)) AS BIGINT) - 1)
                << (4 * (15 - p)))) AS BIGINT)) AS h
        FROM tk),
      bits AS (SELECT doc_id, i,
          sum(CASE WHEN (hv >> CAST(i AS INTEGER)) & 1 = 1
              THEN 1 ELSE -1 END) AS bsum
        FROM (SELECT doc_id, unnest(h) AS hv FROM hs)
        CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS i)
        GROUP BY doc_id, i),
      sig AS (SELECT doc_id,
          CAST(sum(CASE WHEN bsum > 0
            THEN CAST(1 AS BIGINT) << CAST(i AS INTEGER)
            ELSE 0 END) AS BIGINT) AS sg
        FROM bits GROUP BY doc_id)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(bit_count(xor(a.sg, b.sg)) AS INTEGER) AS hamming
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.sg, b.sg)) <= 3
      ORDER BY id_a, id_b""",
    "x3_ann_lsh" -> annRecallOracle,
    "x3_ann_ivf" -> annRecallOracle,
    // bounded simhash oracle: the value assertion is the brute-force
    // planted-pair count at J >= 0.7 (size-ratio prune lossless there,
    // same argument as x2_minhash_lsh's tau=0.5 case); the booleans
    // are required TRUE — recall_ok pins simhash's planted recall,
    // ham_ok pins native-vs-fallback signature agreement on every
    // emitted pair.
    "x2_simhash" -> s"""$toksCte
      , sh AS (SELECT doc_id,
          list_distinct(CASE WHEN length(t) >= 3
            THEN list_transform(generate_series(1, length(t) - 2),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
            ELSE CAST([] AS VARCHAR[]) END) AS s
        FROM tk)
      SELECT count(*) AS n_planted, TRUE AS recall_ok, TRUE AS ham_ok
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        AND length(a.s) <= 2 * length(b.s)
        AND length(b.s) <= 2 * length(a.s)
      WHERE length(a.s) > 0 AND length(b.s) > 0
        AND CAST(CAST(length(list_intersect(a.s, b.s)) AS DOUBLE) /
             (length(a.s) + length(b.s) - length(list_intersect(a.s, b.s))) AS DOUBLE) >= 0.7""",
    "x2_ppjoin" -> s"""$toksCte
      , sh AS (SELECT doc_id, lang,
          list_distinct(CASE WHEN length(t) >= 3
            THEN list_transform(generate_series(1, length(t) - 2),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
            ELSE CAST([] AS VARCHAR[]) END) AS s
        FROM tk)
      SELECT a.lang AS blk, a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(CAST(length(list_intersect(a.s, b.s)) AS DOUBLE) /
             (length(a.s) + length(b.s) - length(list_intersect(a.s, b.s))) AS DOUBLE) AS jaccard
      FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE length(a.s) > 0 AND length(b.s) > 0
        AND CAST(CAST(length(list_intersect(a.s, b.s)) AS DOUBLE) /
             (length(a.s) + length(b.s) - length(list_intersect(a.s, b.s))) AS DOUBLE) >= 0.8
      ORDER BY blk, id_a, id_b""",
    "x3_knn_bruteforce" -> """
      WITH ex AS (SELECT vec_id, CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(18,6)) AS x,
                         generate_subscripts(embedding, 1) AS i
                  FROM embeddings),
      n2 AS (SELECT vec_id, sum(x * x) AS n2 FROM ex GROUP BY vec_id),
      px AS (SELECT x AS p, i FROM ex WHERE vec_id = 0),
      dots AS (SELECT e.vec_id, sum(e.x * px.p) AS d
               FROM ex e JOIN px ON e.i = px.i
               WHERE e.vec_id <> 0 GROUP BY e.vec_id)
      SELECT dots.vec_id,
        CAST(CAST(d AS DOUBLE) /
             (sqrt(CAST(n2.n2 AS DOUBLE)) * sqrt(CAST(pn.n2 AS DOUBLE))) AS DOUBLE) AS cosine_sim
      FROM dots
      JOIN n2 ON dots.vec_id = n2.vec_id
      JOIN n2 pn ON pn.vec_id = 0
      ORDER BY cosine_sim DESC, dots.vec_id ASC
      LIMIT 10""",
    "x3_ann_poly" -> """
      WITH ex AS (SELECT vec_id,
             CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(18,6)) AS x,
             generate_subscripts(embedding, 1) AS i
           FROM embeddings),
      qx AS (SELECT vec_id, i, CAST(x * 1000000 AS BIGINT) AS q FROM ex),
      sg AS (SELECT j, i,
             CASE WHEN CAST(list_sum(list_transform(generate_series(1, 15),
               p -> (CAST(strpos('0123456789abcdef', substring(
                 md5(CAST(j AS VARCHAR) || ':' || CAST(i - 1 AS VARCHAR)),
                 p, 1)) AS BIGINT) - 1) << (4 * (15 - p)))) AS BIGINT)
               % 2 = 1 THEN 1 ELSE -1 END AS sgn
           FROM (SELECT unnest(generate_series(0, 5)) AS j)
           CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i)),
      proj AS (SELECT vec_id, j, sum(sgn * q) AS p
           FROM qx JOIN sg USING (i) GROUP BY vec_id, j),
      bkt AS (SELECT vec_id, CAST(sum(CASE WHEN p > 0
               THEN CAST(1 AS BIGINT) << CAST(j AS INTEGER) ELSE 0 END)
             AS BIGINT) AS bucket
           FROM proj GROUP BY vec_id),
      n2 AS (SELECT vec_id, sum(x * x) AS n2 FROM ex GROUP BY vec_id),
      cand AS (SELECT p.vec_id AS probe_id, b.vec_id AS id
           FROM bkt p JOIN bkt b ON p.bucket = b.bucket
             AND b.vec_id <> p.vec_id
           WHERE p.vec_id < 3),
      dots AS (SELECT c.probe_id, c.id, sum(a.x * b.x) AS d
           FROM cand c
           JOIN ex a ON a.vec_id = c.probe_id
           JOIN ex b ON b.vec_id = c.id AND b.i = a.i
           GROUP BY c.probe_id, c.id),
      scored AS (SELECT dots.probe_id, dots.id,
             CAST(CAST(d AS DOUBLE) /
                  (sqrt(CAST(nb.n2 AS DOUBLE)) * sqrt(CAST(np.n2 AS DOUBLE)))
               AS DOUBLE) AS cosine_sim
           FROM dots
           JOIN n2 nb ON nb.vec_id = dots.id
           JOIN n2 np ON np.vec_id = dots.probe_id),
      ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY probe_id
               ORDER BY cosine_sim DESC, id ASC) AS INTEGER) AS rk
           FROM scored)
      SELECT probe_id, id, cosine_sim, rk FROM ranked WHERE rk <= 5
      ORDER BY probe_id, rk""",
    "x3_neardup_pairs" -> """
      WITH ex AS (SELECT vec_id, label, CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(18,6)) AS x,
                         generate_subscripts(embedding, 1) AS i
                  FROM embeddings),
      n2 AS (SELECT vec_id, sum(x * x) AS n2 FROM ex GROUP BY vec_id),
      dots AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                      max(a.label) AS blk, sum(a.x * b.x) AS d
               FROM ex a JOIN ex b
                 ON a.i = b.i AND a.label = b.label AND a.vec_id < b.vec_id
               GROUP BY a.vec_id, b.vec_id)
      SELECT blk, id_a, id_b,
        CAST(CAST(d AS DOUBLE) /
             (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS DOUBLE) AS cosine_sim
      FROM dots
      JOIN n2 na ON dots.id_a = na.vec_id
      JOIN n2 nb ON dots.id_b = nb.vec_id
      WHERE CAST(CAST(d AS DOUBLE) /
             (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS DOUBLE) >= 0.3""",
    "asof_join" -> """
      WITH e AS (SELECT event_id, CAST(user_id % 100 + 1 AS BIGINT) AS custkey,
                        epoch_us(ts) AS t_us FROM events),
      o_raw AS (SELECT o_custkey AS custkey, epoch_us(o_orderdate) AS o_us,
                       o_orderkey,
                       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_price,
                       row_number() OVER (PARTITION BY o_custkey, epoch_us(o_orderdate)
                                          ORDER BY o_orderkey DESC) AS rn
                FROM orders),
      o AS (SELECT custkey, o_us, o_orderkey, o_price FROM o_raw WHERE rn = 1)
      SELECT e.event_id, e.custkey, e.t_us, o.o_orderkey, o.o_price
      FROM e ASOF LEFT JOIN o
        ON e.custkey = o.custkey AND e.t_us >= o.o_us""",
    "x5_tumbling" -> """
      SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS window_start,
             event_type, count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2""",
    "x5_sessionize" -> """
      WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events),
      m AS (SELECT *, lag(ts_us) OVER
              (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC) AS prev_us FROM e),
      f AS (SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
                           THEN 1 ELSE 0 END AS new_session FROM m),
      g AS (SELECT *, sum(new_session) OVER
              (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq FROM f)
      SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
             count(*) AS n_events,
             min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
      FROM g GROUP BY user_id, session_seq""",
    "x6_exact_distinct" -> """
      SELECT event_type, count(DISTINCT user_id) AS n_users,
             count(*) AS n_events
      FROM events GROUP BY event_type""",
    // bounded-sketch oracles: the exact columns are REAL value
    // assertions (DuckDB recomputes them); the booleans pin the
    // Spark-side estimates inside their published error bounds —
    // TRUE here means "the oracle requires the sketch in-bound",
    // and a drifting sketch flips the Spark value and goes red.
    "x6_approx_sketch" -> """
      SELECT event_type, count(DISTINCT user_id) AS exact_users,
             TRUE AS users_in_bound, TRUE AS p50_in_bound
      FROM events GROUP BY event_type ORDER BY event_type""",
    "x6_hll_sketch" -> """
      SELECT count(DISTINCT event_type) AS n_groups,
             count(DISTINCT user_id) AS exact_total_users,
             TRUE AS union_in_bound
      FROM events""",
    "mm_frames" -> """
      WITH d AS (SELECT doc_id AS media_id, length(text) AS len FROM documents),
      f AS (SELECT media_id, len,
              unnest(generate_series(0, CAST(ceil(len / 64.0) AS INTEGER) - 1)) AS fi
            FROM d)
      SELECT media_id, CAST(fi AS INTEGER) AS frame_idx,
             CAST(CASE WHEN (fi + 1) * 64 <= len THEN 64
                       ELSE len - fi * 64 END AS INTEGER) AS frame_bytes
      FROM f""",
    "mm_dedup" -> """
      SELECT md5(text) AS content_key, min(doc_id) AS keep_id,
             count(*) AS n_copies
      FROM documents GROUP BY md5(text) ORDER BY content_key""",
    "mm_features" -> """
      WITH d AS (SELECT doc_id, CAST(8 + doc_id % 5 AS INTEGER) AS w,
                   CAST(6 + doc_id % 3 AS INTEGER) AS h FROM documents),
      xs AS (SELECT CAST(unnest(generate_series(0, 11)) AS INTEGER) AS x),
      ys AS (SELECT CAST(unnest(generate_series(0, 7)) AS INTEGER) AS y),
      px AS (SELECT doc_id, w, h, x, y,
               (doc_id * 31 + x * 7 + y * 13) % 256 AS v
             FROM d CROSS JOIN xs CROSS JOIN ys
             WHERE x < w AND y < h)
      SELECT doc_id AS media_id, w AS width, h AS height,
        CAST(sum(v) AS BIGINT) AS lum_sum,
        CAST(sum(CASE WHEN x <  w // 2 AND y <  h // 2 THEN v ELSE 0 END)
          AS BIGINT) AS q00,
        CAST(sum(CASE WHEN x >= w // 2 AND y <  h // 2 THEN v ELSE 0 END)
          AS BIGINT) AS q01,
        CAST(sum(CASE WHEN x <  w // 2 AND y >= h // 2 THEN v ELSE 0 END)
          AS BIGINT) AS q10,
        CAST(sum(CASE WHEN x >= w // 2 AND y >= h // 2 THEN v ELSE 0 END)
          AS BIGINT) AS q11
      FROM px GROUP BY doc_id, w, h ORDER BY media_id""",
    "mm_resize" -> """
      WITH d AS (SELECT doc_id, CAST(8 + doc_id % 5 AS INTEGER) AS w,
                   CAST(6 + doc_id % 3 AS INTEGER) AS h FROM documents),
      xs AS (SELECT CAST(unnest(generate_series(0, 11)) AS INTEGER) AS x),
      ys AS (SELECT CAST(unnest(generate_series(0, 7)) AS INTEGER) AS y),
      px AS (SELECT doc_id, w, h, x, y,
               (doc_id * 31 + x * 7 + y * 13) % 256 AS v
             FROM d CROSS JOIN xs CROSS JOIN ys
             WHERE x < (w // 2) * 2 AND y < (h // 2) * 2),
      blocks AS (SELECT doc_id, w, h,
                   CAST(sum(v) // count(*) AS BIGINT) AS bv
                 FROM px GROUP BY doc_id, w, h, x // 2, y // 2)
      SELECT doc_id AS media_id, CAST(w // 2 AS INTEGER) AS width,
             CAST(h // 2 AS INTEGER) AS height,
             CAST(sum(bv) AS BIGINT) AS lum_sum
      FROM blocks GROUP BY doc_id, w, h ORDER BY media_id""",
    "x6_quantiles" -> """
      SELECT event_type,
             round(quantile_cont(value, 0.5), 4) AS p50,
             round(quantile_cont(value, 0.95), 4) AS p95
      FROM events GROUP BY event_type""",
    "x6_kmv_poly" -> """
      WITH h AS (SELECT DISTINCT event_type,
             CAST(list_sum(list_transform(generate_series(1, 15),
               p -> (CAST(strpos('0123456789abcdef', substring(
                 md5(CAST(user_id AS VARCHAR)), p, 1)) AS BIGINT) - 1)
                 << (4 * (15 - p)))) AS BIGINT) AS h
           FROM events),
      r AS (SELECT event_type, h, row_number() OVER
             (PARTITION BY event_type ORDER BY h ASC) AS rn FROM h),
      m AS (SELECT event_type, max(h) AS hk, count(*) AS n_min
           FROM r WHERE rn <= 64 GROUP BY event_type)
      SELECT event_type, n_min,
        CASE WHEN n_min < 64 THEN CAST(n_min AS DOUBLE)
          ELSE CAST(63 AS DOUBLE) * 1152921504606846976.0 /
               CAST(hk AS DOUBLE) END AS est_distinct
      FROM m ORDER BY event_type""")
}
