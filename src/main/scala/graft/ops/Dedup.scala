package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** Deduplication operators for 100 TB text corpora (SURVEY.md §2.8
  * X1/X2).
  *
  * Scale design:
  *  - Exact dedup: hash-partitioned groupBy on a content fingerprint —
  *    one shuffle, AQE handles skew.
  *  - MinHash+LSH: signatures and band keys are pure per-row array
  *    expressions (map-only); candidate generation is an equi-join on
  *    (band, bandHash) — the only shuffle — so cost is O(candidates),
  *    never O(n²). Exact Jaccard verifies candidates.
  *  - SimHash: 64-bit signature per row (map-only), candidates via
  *    equi-join on 16-bit chunks (Hamming ≤ 3 ⇒ at least one of 4
  *    chunks equal — pigeonhole), verified with bit_count(xor).
  */
object Dedup {

  /** Exact duplicate groups by normalized-content fingerprint.
    * Returns one row per distinct content: keeper doc id + dup count. */
  def exactGroups(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol), TextOps.fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(
        min(col(idCol)).as("keep_id"),
        count(lit(1)).as("n_copies"))

  /** Exact dedup: keep the lowest id per identical normalized text. */
  def exactDedup(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val keep = exactGroups(docs, textCol, idCol)
      .select(col("keep_id").as(idCol))
    docs.join(keep, Seq(idCol), "left_semi")
  }

  /** Per-doc MinHash signatures computed map-reduce style: explode
    * shingles, hash each shingle ONCE (`xxhash64` on the string), then
    * a codegen'd hash aggregate takes k mins of cheap fixed-width
    * re-hashes `xxhash64(h, i)`. One shuffle on doc id; no nested
    * higher-order functions (those re-evaluate the inner expression
    * tree per outer element — k× the string hashing). ANSI-safe: no
    * overflowing arithmetic, hashing only.
    * Returns (id, sh, sz, m0..m{k-1}). */
  private[graft] def signatures(docs: DataFrame, textCol: String,
      idCol: String, n: Int, k: Int,
      native: Boolean = true): DataFrame = {
    val base = docs
      .select(col(idCol).as("id"), TextOps.shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
    if (native) {
      // Map-only: the custom Catalyst expression computes all k mins
      // in one pass per row — no explode, no shuffle (bit-compatible
      // with the aggregate fallback below; cross-checked in tests).
      base
        .withColumn("sig",
          graft.functions.MinHashSig.minhash_sig(
            docs.sparkSession, col("sh"), k))
        .select(Seq(col("id"), col("sh")) ++
          (0 until k).map(i => element_at(col("sig"), i + 1).as(s"m$i")): _*)
    } else {
      val exploded = base
        .select(col("id"), explode(col("sh")).as("s"))
        .withColumn("h", xxhash64(col("s")))
      val mins =
        (0 until k).map(i => min(xxhash64(col("h"), lit(i))).as(s"m$i"))
      exploded.groupBy(col("id"))
        .agg(mins.head, mins.tail: _*)
        .join(base, Seq("id"))
    }
  }

  /** Near-duplicate pairs via MinHash LSH, verified by exact Jaccard.
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= tau.
    *
    * Scale shape: signature = one explode + hash aggregate; candidate
    * generation = equi-join on (band, bandHash) over slim (id, band,
    * hash) rows — shingle sets are NOT carried through the band join,
    * they are re-attached only for the (few) verified candidates. No
    * O(n²) compare anywhere. */
  def minhashNearDupPairs(docs: DataFrame, tau: Double = 0.5,
      textCol: String = "text", idCol: String = "doc_id",
      n: Int = 3, k: Int = 32, bands: Int = 16): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    val sigs = signatures(docs, textCol, idCol, n, k)
    val banded = bandKeys(sigs, k, bands)
    val cand = banded.select(col("id").as("id_a"), col("band"), col("bh"))
      .join(banded.select(col("id").as("id_b"), col("band"), col("bh")),
        Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    verifyPairs(cand, sigs.select(col("id"), col("sh")), tau)
  }

  /** Drop every doc that has a near-duplicate with a smaller id
    * (single LSH pass; transitive chains keep their local minima —
    * the standard one-round approximation of clustering dedup). */
  def minhashDedup(docs: DataFrame, tau: Double = 0.5,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val drop = minhashNearDupPairs(docs, tau, textCol, idCol)
      .select(col("id_b").as(idCol)).distinct()
    docs.join(drop, Seq(idCol), "left_anti")
  }

  /** Slim banded LSH keys (id, band, bh) from a signature frame. */
  private def bandKeys(sigs: DataFrame, k: Int, bands: Int): DataFrame = {
    val r = k / bands
    val bandStructs = (0 until bands).map { j =>
      val cols = (0 until r).map(q => col(s"m${j * r + q}"))
      struct(lit(j).as("band"), xxhash64(lit(j) +: cols: _*).as("bh"))
    }
    sigs.select(col("id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.bh"))
  }

  /** The two persisted halves of an incremental MinHash dedup index:
    * `bands` (id, band, bh) drives candidate generation, `sets`
    * (id, sh) drives exact-Jaccard verification. Both are plain
    * DataFrames — at production scale you write them to parquet once
    * per corpus snapshot (bucketed by `bh` and `id` respectively) and
    * re-read them for every incoming batch, so the corpus is never
    * re-shingled or re-hashed. */
  final case class MinHashIndex(bands: DataFrame, sets: DataFrame)

  /** Build the [[MinHashIndex]] halves for a corpus (same signature
    * and banding parameters as [[minhashNearDupPairs]] — indexes
    * built and queried with different parameters are incompatible). */
  def minhashIndex(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", n: Int = 3, k: Int = 32,
      bands: Int = 16): MinHashIndex = {
    require(k % bands == 0, "k must divide into bands")
    val sigs = signatures(docs, textCol, idCol, n, k)
    MinHashIndex(bandKeys(sigs, k, bands), sigs.select(col("id"), col("sh")))
  }

  /** Incremental near-dup: all pairs (id_a < id_b, jaccard >= tau)
    * that TOUCH the new batch — new×corpus and new×new — without
    * recomputing anything over the indexed corpus. This is the
    * daily-ingest shape at 100 TB: the corpus index is petabyte-scale
    * parquet, the new batch is small, and the only work that scales
    * with the corpus is one equi-join probe of the band index (AQE
    * broadcasts the new side when it is small enough), followed by
    * set-verification joins that fetch ONLY the candidate ids'
    * shingle sets. The emitted pair set equals
    * `minhashNearDupPairs(corpus ∪ batch)` restricted to pairs with
    * at least one new id (same signatures, same banding — pinned in
    * OpsSpec), so the full-equality oracle argument from
    * `x2_minhash_lsh` carries over unchanged.
    *
    * New-batch ids must be disjoint from indexed ids (ingest-ledger
    * responsibility, S7). */
  def minhashNearDupPairsIncremental(newDocs: DataFrame,
      index: MinHashIndex, tau: Double = 0.5, textCol: String = "text",
      idCol: String = "doc_id", n: Int = 3, k: Int = 32,
      bands: Int = 16): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    val newSigs = signatures(newDocs, textCol, idCol, n, k)
    val newBands = bandKeys(newSigs, k, bands)
    // probe side = corpus ∪ batch so new×new pairs surface too; the
    // batch side of the join stays the (small) new-band frame
    val cand = index.bands.unionByName(newBands)
      .select(col("id").as("id_x"), col("band"), col("bh"))
      .join(newBands.select(col("id").as("id_y"), col("band"), col("bh")),
        Seq("band", "bh"))
      .filter(col("id_x") =!= col("id_y"))
      .select(least(col("id_x"), col("id_y")).as("id_a"),
        greatest(col("id_x"), col("id_y")).as("id_b"))
      .distinct()
    verifyPairs(cand,
      index.sets.unionByName(newSigs.select(col("id"), col("sh"))), tau)
  }

  /** 64-bit SimHash over the token multiset: bit i is the sign of the
    * sum over tokens of ±1 according to bit i of xxhash64(token).
    * Column form — fine for small frames/tests; `simhashSignatures`
    * below is the aggregate form used at scale (the nested HOF here
    * re-hashes every token per bit: 64× the work). */
  def simhash(text: Column): Column = {
    val toks = TextOps.tokens(text)
    val hashes = transform(toks, t => xxhash64(t))
    aggregate(
      sequence(lit(0), lit(63)),
      lit(0L),
      (acc, i) => {
        val bitSum = aggregate(
          hashes, lit(0L),
          (a, h) => a + when(call_function("getbit", h, i) === 1, 1L)
            .otherwise(-1L))
        acc.bitwiseOR(
          when(bitSum > 0, call_function("shiftleft", lit(1L), i))
            .otherwise(lit(0L)))
      })
  }

  /** SimHash signatures. Default path: the native one-pass
    * `graft.functions.SimHashSig` expression — map-only, no shuffle,
    * stays in whole-stage codegen. Fallback (`native = false`):
    * explode + a 64-column conditional-sum hash aggregate (one full
    * shuffle of every (doc, token) pair) — kept for the
    * bit-compatibility cross-check in OpsSpec. Same semantics as
    * `simhash` (bit i set iff the ±1 bit-sum is positive). Note the
    * fallback drops docs whose token array is empty (explode emits
    * nothing); `TextOps.tokens` never yields an empty array, so the
    * two paths agree on any real text column. */
  def simhashSignatures(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", native: Boolean = true): DataFrame = {
    if (native) {
      docs.select(col(idCol).as("id"),
        graft.functions.SimHashSig.simhash_sig(
          TextOps.tokens(col(textCol))).as("sig"))
    } else {
      val exploded = docs
        .select(col(idCol).as("id"),
          explode(TextOps.tokens(col(textCol))).as("t"))
        .withColumn("h", xxhash64(col("t")))
      val bitSums = (0 until 64).map(i =>
        sum(when(call_function("getbit", col("h"), lit(i)) === 1, 1L)
          .otherwise(-1L)).as(s"b$i"))
      val sig = (0 until 64)
        .map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
        .reduce((a, b) => a.bitwiseOR(b))
      exploded.groupBy(col("id"))
        .agg(bitSums.head, bitSums.tail: _*)
        .select(col("id"), sig.as("sig"))
    }
  }

  /** Candidate pairs with SimHash Hamming distance <= maxHamming,
    * generated by joining on 16-bit signature chunks (pigeonhole for
    * maxHamming <= 3), then verified exactly with bit_count(xor). */
  def simhashNearDupPairs(docs: DataFrame, maxHamming: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(maxHamming <= 3, "chunk join covers Hamming <= 3")
    val chunkStructs = (0 until 4).map(j =>
      struct(lit(j).as("ci"),
        call_function("shiftright", col("sig"), lit(j * 16))
          .bitwiseAND(0xFFFFL).as("cv")))
    val sigs = simhashSignatures(docs, textCol, idCol)
      .withColumn("chunk", explode(array(chunkStructs: _*)))
      .select(col("id"), col("sig"), col("chunk.ci"), col("chunk.cv"))
    val a = sigs.select(col("id").as("id_a"), col("sig").as("sig_a"),
      col("ci"), col("cv"))
    val b = sigs.select(col("id").as("id_b"), col("sig").as("sig_b"),
      col("ci"), col("cv"))
    a.join(b, Seq("ci", "cv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b")))
          .cast(IntegerType).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  // ------------------------------------------------------------------
  // Oracle-expressible "poly" twins of the xxhash64 production paths
  // (the x4_winnow_poly precedent): identical operator SHAPE — banded
  // minhash candidates / pigeonhole simhash chunks, exact verify —
  // with the hash swapped for the md5-derived TextOps.polyHash60 a
  // SQL oracle can replay step for step. The production variants stay
  // on xxhash64 (single-pass native kernels, no md5 string cost).
  // ------------------------------------------------------------------

  /** MinHash+LSH near-dup pairs with fully SQL-replayable hashes:
    * minhash i of a doc = min over shingles g of polyHash60(i ++ "|"
    * ++ g); band keys are the PLAIN (band, r signature values) tuple
    * rendered to a string (no second-level hash), so candidate
    * generation, banding, and the exact-Jaccard verify are all
    * deterministic arithmetic an oracle can reproduce — the driver's
    * hash compare then checks candidate generation AND verification,
    * not just row counts. */
  def minhashNearDupPairsPoly(docs: DataFrame, tau: Double = 0.5,
      textCol: String = "text", idCol: String = "doc_id",
      n: Int = 3, k: Int = 32, bands: Int = 16): DataFrame = {
    val (banded, sets) = polyBandsAndSets(docs, textCol, idCol, n, k, bands)
    val cand = banded.select(col("id").as("id_a"), col("bk"))
      .join(banded.select(col("id").as("id_b"), col("bk")), Seq("bk"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    verifyPairs(cand, sets, tau)
  }

  /** Exact-Jaccard verification of candidate (id_a, id_b) pairs
    * against (id, sh) shingle sets — shared tail of every minhash
    * candidate generator. */
  private[graft] def verifyPairs(cand: DataFrame, sets: DataFrame,
      tau: Double): DataFrame =
    cand
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        TextOps.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= tau)

  /** Poly (md5 + Kirsch–Mitzenmacher) signature banding: returns the
    * (id, bk) band-key frame and the (id, sh) shingle-set frame — the
    * SQL-replayable twin of [[minhashIndex]]'s halves, shared by the
    * batch poly pair join and the streaming candidate generator
    * ([[graft.streaming.StatefulNearDup]]). */
  private[graft] def polyBandsAndSets(docs: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      n: Int = 3, k: Int = 32,
      bands: Int = 16): (DataFrame, DataFrame) = {
    require(k % bands == 0, "k must divide into bands")
    val r = k / bands
    val base = docs
      .select(col(idCol).as("id"), TextOps.shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
    // Exploded (doc, shingle, perm) rows instead of nested array
    // lambdas: HOFs are interpreted (outside whole-stage codegen) and
    // re-evaluate the k·|sh| md5 calls per consuming expression; the
    // explode keeps every md5 in codegen and evaluates it exactly
    // once (measured 13 s -> ~3 s at sf0.1). Same values either way.
    //
    // The repartition(id) BEFORE the k-way explode is load-bearing:
    // without it the k·|shingles| md5 stream inherits the scan's
    // split count (a compact parquet source can be a single split, so
    // the whole hash stage runs on one core — measured 5.0 s of the
    // query's 5.4 s at sf0.1). One slim (id, g) shuffle fans the hash
    // work across the cluster AND pre-clusters by id, which satisfies
    // ClusteredDistribution for BOTH downstream aggregations (mins on
    // (id, i), banding on (id, band)) — so it replaces, not adds, a
    // shuffle. (The alternative rewrite — hashing each distinct
    // shingle once and joining back — was measured SLOWER here:
    // 8.7 -> 11.7 s cold, since it re-evaluates the shingle kernel a
    // third time and its join shuffle outweighs the saved md5 calls.)
    // One md5 per (doc, shingle); the k permutations derive from its
    // two independent hex slices via Kirsch–Mitzenmacher double
    // hashing (TextOps.permHash — overflow-safe pure long ops:
    // i·h2 < 64·2^56 = 2^62, +h1 < 2^62 + 2^60 < 2^63). Since the
    // md5 count no longer grows with k, the twin runs the PRODUCTION
    // banding parameters (k=32, b=16: per-pair candidate-miss odds at
    // J=0.7 are 0.51^16 ≈ 2e-5, vs 0.45% at the old k=16/b=8 — which
    // measurably dropped one true pair on the sf0.01 gate corpus).
    require(k <= 64, s"K-M overflow audit covers k <= 64, got k=$k")
    val mins = base.select(col("id"), explode(col("sh")).as("g"))
      .repartition(col("id"))
      .select(col("id"), md5(col("g")).as("m"))
      .select(col("id"),
        TextOps.mdBase1(col("m")).as("h1"),
        TextOps.mdBase2(col("m")).as("h2"))
      .select(col("id"), explode(sequence(lit(0), lit(k - 1))).as("i"),
        col("h1"), col("h2"))
      .select(col("id"), col("i"),
        TextOps.permHash(col("i"), col("h1"), col("h2")).as("h"))
      .groupBy(col("id"), col("i")).agg(min(col("h")).as("mh"))
    val banded = mins
      .withColumn("band", (col("i") / lit(r)).cast("int"))
      .groupBy(col("id"), col("band"))
      .agg(array_sort(collect_list(struct(col("i"), col("mh")))).as("ms"))
      .select(col("id"),
        concat(col("band").cast("string"), lit(":"),
          array_join(transform(col("ms"),
            m => m.getField("mh").cast("string")), ",")).as("bk"))
    (banded, base.select(col("id"), col("sh")))
  }

  /** SimHash near-dup pairs with fully SQL-replayable hashes: a
    * 60-bit signature over polyHash60(token) (bit i = sign of the
    * ±1 bit-sum), candidates via 15-bit chunk equi-join (pigeonhole
    * covers Hamming ≤ 3 across 4 chunks), verified exactly with
    * bit_count(xor). Unlike the banded-minhash path this one is
    * EXACT over the signature space — the chunk join has 100% recall
    * for Hamming ≤ 3 — so the oracle's all-pairs replay must agree
    * row for row. */
  def simhashNearDupPairsPoly(docs: DataFrame, maxHamming: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(maxHamming <= 3, "chunk join covers Hamming <= 3")
    // Explode + 60-column conditional-sum hash aggregate (the same
    // shape as simhashSignatures' fallback): one codegen'd md5 per
    // token. The nested per-bit HOF formulation is interpreted and
    // re-evaluates the token hashes per bit — measured 69 s vs ~2 s
    // at sf0.1 for identical output. TextOps.tokens never yields an
    // empty array, so the explode drops no documents.
    // (No pre-hash repartition here, unlike the minhash poly path:
    // this stream is one md5 per token — not per (token, perm) — and
    // the 60-column partial aggregate collapses it map-side before
    // the shuffle; an explicit repartition was measured 0.7 s SLOWER
    // at sf0.1 because it ships the raw token stream instead.)
    val exploded = docs
      .select(col(idCol).as("id"),
        explode(TextOps.tokens(col(textCol))).as("t"))
      .select(col("id"), TextOps.polyHash60(col("t")).as("h"))
    val bitSums = (0 until 60).map(i =>
      sum(when(call_function("getbit", col("h"), lit(i)) === 1, 1L)
        .otherwise(-1L)).as(s"b$i"))
    val sigExpr = (0 until 60)
      .map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    val sigs = exploded.groupBy(col("id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"), sigExpr.as("sig"))
    val chunkStructs = (0 until 4).map(j =>
      struct(lit(j).as("ci"),
        call_function("shiftright", col("sig"), lit(j * 15))
          .bitwiseAND(0x7FFFL).as("cv")))
    val chunked = sigs
      .withColumn("chunk", explode(array(chunkStructs: _*)))
      .select(col("id"), col("sig"), col("chunk.ci"), col("chunk.cv"))
    val a = chunked.select(col("id").as("id_a"), col("sig").as("sig_a"),
      col("ci"), col("cv"))
    val b = chunked.select(col("id").as("id_b"), col("sig").as("sig_b"),
      col("ci"), col("cv"))
    a.join(b, Seq("ci", "cv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b")))
          .cast(IntegerType).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Exact pairwise n-gram Jaccard within a blocking key (e.g. lang):
    * the oracle-checkable exact counterpart of the LSH path.
    *
    * 100 TB NOTE: this full inverted index is O(Σ df(shingle)²) — a
    * single stopword-like shingle makes one reducer quadratic. It is
    * deliberately kept as the small-scale exact oracle; the
    * PRODUCTION exact paths are [[ngramJaccardPairsCapped]] (postings
    * bounded at dfCap → linear, skew-proof) and
    * [[ngramJaccardPairsPrefix]] (PPJoin, full-set semantics at high
    * tau).
    *
    * Inverted-index shape, not a cross join: explode shingles, join
    * docs on (block, shingle), count shared shingles per pair, then
    * jaccard = shared / (|A| + |B| - shared) from integer counts —
    * bit-identical to the array_intersect formulation but with cost
    * O(sum over shingles of df(shingle)^2) instead of O(n^2 per
    * block). Pairs with zero overlap never materialize (they can't
    * reach any tau > 0). */
  def ngramJaccardPairs(docs: DataFrame, tau: Double,
      blockCol: String, textCol: String = "text",
      idCol: String = "doc_id", n: Int = 3): DataFrame = {
    val base = docs
      .select(col(idCol).as("id"), col(blockCol).as("blk"),
        TextOps.shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sz", size(col("sh")))
    val inv = base.select(col("id"), col("blk"), col("sz"),
      explode(col("sh")).as("shingle"))
    // two renamed legs of the same (cheap, map-only) subplan; an
    // aliased self-join with the inequality in the join condition
    // measured ~2x slower here, and ReuseExchange does not fire for
    // either formulation under AQE in this Spark build.
    val a = inv.select(col("id").as("id_a"), col("blk"),
      col("sz").as("sz_a"), col("shingle"))
    val b = inv.select(col("id").as("id_b"), col("blk"),
      col("sz").as("sz_b"), col("shingle"))
    a.join(b, Seq("blk", "shingle"))
      .filter(col("id_a") < col("id_b"))
      // size-ratio prune: jaccard(A,B) <= min/max of the set sizes, so
      // any pair failing min >= tau*max can never reach tau — drop it
      // BEFORE the pair-count aggregate (this is where the inverted
      // index blows up on skewed shingles; the prune is semantics-free)
      .filter(least(col("sz_a"), col("sz_b")).cast(DoubleType) >=
        lit(tau) * greatest(col("sz_a"), col("sz_b")).cast(DoubleType))
      .groupBy(col("blk"), col("id_a"), col("id_b"),
        col("sz_a"), col("sz_b"))
      .agg(count(lit(1)).as("shared"))
      .select(col("blk"), col("id_a"), col("id_b"),
        (col("shared").cast(DoubleType) /
          (col("sz_a") + col("sz_b") - col("shared")).cast(DoubleType))
          .cast(DoubleType).as("jaccard"))
      .filter(col("jaccard") >= tau)
  }

  /** Document-frequency-capped exact Jaccard pair join — the
    * skew-hardened variant of [[ngramJaccardPairs]] for corpora where
    * a stopword-like shingle (df in the millions) would make the
    * inverted index's O(Σ df²) pair explosion the job's bottleneck.
    *
    * Semantics (well-defined, not a heuristic): each document's
    * shingle set is first FILTERED to shingles whose in-block document
    * frequency is ≤ `dfCap` (standard stopword removal lifted to
    * shingles), then exact Jaccard is computed over the filtered sets.
    * High-df shingles carry almost no pairwise signal (they match
    * everything), so the capped similarity is the one you actually
    * want for near-dup detection — and it is exactly reproducible in
    * SQL, so the harness oracle checks it like any other exact query.
    *
    * Scale guarantee the uncapped index cannot make: every surviving
    * posting list has length ≤ dfCap, so the pair-generation join
    * emits at most |vocabulary|·dfCap² rows — LINEAR in corpus size
    * for a fixed cap, with no skewed-key straggler possible. This is
    * the production exact path at 100 TB (alongside PPJoin, which
    * keeps full-set semantics at high tau); the uncapped
    * [[ngramJaccardPairs]] stays as the small-scale oracle
    * counterpart. */
  def ngramJaccardPairsCapped(docs: DataFrame, tau: Double, dfCap: Long,
      blockCol: String, textCol: String = "text",
      idCol: String = "doc_id", n: Int = 3): DataFrame = {
    val inv = docs
      .select(col(idCol).as("id"), col(blockCol).as("blk"),
        explode(TextOps.shingles(col(textCol), n)).as("shingle"))
    // in-block document frequency; ≤-cap survivors only. The df table
    // is vocabulary-sized (≪ corpus) and shrinks further under the
    // cap; the postings join below is an equi-join on the same
    // (blk, shingle) key the explode already produced.
    val kept = inv.join(
      inv.groupBy(col("blk"), col("shingle"))
        .agg(count(lit(1)).as("df"))
        .filter(col("df") <= dfCap)
        .select(col("blk"), col("shingle")),
      Seq("blk", "shingle"))
    // filtered-set sizes replace the raw sizes in the Jaccard
    val sz = kept.groupBy(col("id"), col("blk"))
      .agg(count(lit(1)).as("sz"))
    val a = kept.join(sz, Seq("id", "blk"))
      .select(col("id").as("id_a"), col("blk"), col("sz").as("sz_a"),
        col("shingle"))
    val b = kept.join(sz, Seq("id", "blk"))
      .select(col("id").as("id_b"), col("blk"), col("sz").as("sz_b"),
        col("shingle"))
    a.join(b, Seq("blk", "shingle"))
      .filter(col("id_a") < col("id_b"))
      .filter(least(col("sz_a"), col("sz_b")).cast(DoubleType) >=
        lit(tau) * greatest(col("sz_a"), col("sz_b")).cast(DoubleType))
      .groupBy(col("blk"), col("id_a"), col("id_b"),
        col("sz_a"), col("sz_b"))
      .agg(count(lit(1)).as("shared"))
      .select(col("blk"), col("id_a"), col("id_b"),
        (col("shared").cast(DoubleType) /
          (col("sz_a") + col("sz_b") - col("shared")).cast(DoubleType))
          .cast(DoubleType).as("jaccard"))
      .filter(col("jaccard") >= tau)
  }

  /** Asymmetric CONTAINMENT pair join: emits (blk, id_a, id_b,
    * cont_a, cont_b) where cont_a = |A∩B| / |A| is the fraction of
    * A's shingles that also occur in B (and symmetrically cont_b),
    * keeping pairs where either direction reaches `tau`.
    *
    * Why a separate operator: Jaccard MISSES subset duplicates by
    * construction — a 50-shingle quote embedded verbatim in a
    * 5000-shingle article has J ≈ 0.01 but containment 1.0. Training
    * corpora are full of exactly this shape (quotations, boilerplate
    * wrappers, chunk-of-a-longer-doc extractions), so a dedup stack
    * needs the directed measure alongside the symmetric one. The
    * size-ratio prune used by every Jaccard variant is deliberately
    * ABSENT here: tiny-A-inside-huge-B is the target, not noise.
    *
    * Scale: identical df-capped inverted-index shape as
    * [[ngramJaccardPairsCapped]] (postings ≤ dfCap ⇒ the pair stage
    * is ≤ |vocab|·dfCap² rows, linear in corpus size, skew-proof),
    * and like there the capped similarity is the well-defined,
    * SQL-reproducible semantics: containment over the df-filtered
    * shingle sets. */
  def containmentPairs(docs: DataFrame, tau: Double, dfCap: Long,
      blockCol: String, textCol: String = "text",
      idCol: String = "doc_id", n: Int = 3): DataFrame = {
    val inv = docs
      .select(col(idCol).as("id"), col(blockCol).as("blk"),
        explode(TextOps.shingles(col(textCol), n)).as("shingle"))
    val kept = inv.join(
      inv.groupBy(col("blk"), col("shingle"))
        .agg(count(lit(1)).as("df"))
        .filter(col("df") <= dfCap)
        .select(col("blk"), col("shingle")),
      Seq("blk", "shingle"))
    val sz = kept.groupBy(col("id"), col("blk"))
      .agg(count(lit(1)).as("sz"))
    val a = kept.join(sz, Seq("id", "blk"))
      .select(col("id").as("id_a"), col("blk"), col("sz").as("sz_a"),
        col("shingle"))
    val b = kept.join(sz, Seq("id", "blk"))
      .select(col("id").as("id_b"), col("blk"), col("sz").as("sz_b"),
        col("shingle"))
    a.join(b, Seq("blk", "shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("blk"), col("id_a"), col("id_b"),
        col("sz_a"), col("sz_b"))
      .agg(count(lit(1)).as("shared"))
      .select(col("blk"), col("id_a"), col("id_b"),
        (col("shared").cast(DoubleType) / col("sz_a").cast(DoubleType))
          .cast(DoubleType).as("cont_a"),
        (col("shared").cast(DoubleType) / col("sz_b").cast(DoubleType))
          .cast(DoubleType).as("cont_b"))
      .filter(greatest(col("cont_a"), col("cont_b")) >= tau)
  }

  /** PPJoin-style prefix-filtered exact Jaccard pair join — the same
    * pairs as [[ngramJaccardPairs]] at the same tau, with a
    * candidate space that shrinks as tau rises.
    *
    * Principle (Xiao et al., "Efficient Similarity Joins for Near
    * Duplicate Detection", WWW'08 — public literature): under ANY
    * fixed total order of shingles, two sets with jaccard >= tau must
    * share at least one element among their first
    * `|S| - ceil(tau*|S|) + 1` ordered elements. The order that makes
    * prefixes SELECTIVE is ascending document frequency (rarest
    * first): two documents then only become a candidate pair if they
    * share a globally RARE shingle inside both prefixes. The inverted
    * index explodes only the prefixes (~(1-tau)|S| entries), the
    * size filter min >= tau*max prunes before the join, and every
    * surviving pair is verified EXACTLY with one array intersection
    * over the full sets — so the result is identical to the full
    * inverted index, never approximate.
    *
    * Shuffle profile: DF aggregate (vocabulary-sized), DF attach +
    * per-doc re-sort (slim rows), prefix self-join, candidate
    * distinct, verify joins carrying each set once per side. More
    * stages than the full index, but each moves prefix- or
    * candidate-sized data — at high tau / large corpora the full
    * index's O(pairs-sharing-any-shingle) shuffle dwarfs them.
    */
  def ngramJaccardPairsPrefix(docs: DataFrame, tau: Double,
      blockCol: String, textCol: String = "text",
      idCol: String = "doc_id", n: Int = 3): DataFrame = {
    // the shingle table feeds three consumers (DF ranking, the
    // prefix index, and both verify sides); materialize it once —
    // at corpus scale this is the persisted shingle/signature table
    // every dedup pipeline keeps, not a per-query recomputation
    val base = docs
      .select(col(idCol).as("id"), col(blockCol).as("blk"),
        TextOps.shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sz", size(col("sh")))
      .localCheckpoint()
    val ex = base.select(col("id"), col("blk"), col("sz"),
      explode(col("sh")).as("shingle"))
    // global document frequency per shingle (vocabulary-sized; the
    // join back is left to Catalyst — broadcast while the vocabulary
    // fits, shuffle join beyond)
    val df = ex.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    // rarest-first prefix of length |S| - ceil(tau*|S|) + 1, ties by
    // shingle text so the order is total and deterministic
    val prefLen = (col("sz") - ceil(lit(tau) * col("sz")) + 1).cast("int")
    val pref = ex.join(df, "shingle")
      .groupBy(col("id"), col("blk"), col("sz"))
      .agg(collect_list(struct(col("df"), col("shingle"))).as("ranked"))
      .select(col("id"), col("blk"), col("sz"),
        explode(transform(slice(array_sort(col("ranked")), lit(1), prefLen),
          x => x.getField("shingle"))).as("shingle"))
    val a = pref.select(col("id").as("id_a"), col("blk"),
      col("sz").as("sz_a"), col("shingle"))
    val b = pref.select(col("id").as("id_b"), col("blk"),
      col("sz").as("sz_b"), col("shingle"))
    val cands = a.join(b, Seq("blk", "shingle"))
      .filter(col("id_a") < col("id_b"))
      .filter(least(col("sz_a"), col("sz_b")).cast(DoubleType) >=
        lit(tau) * greatest(col("sz_a"), col("sz_b")).cast(DoubleType))
      .select(col("blk"), col("id_a"), col("id_b")).distinct()
    val setsA = base.select(col("blk"), col("id").as("id_a"),
      col("sh").as("sh_a"), col("sz").as("sz_a"))
    val setsB = base.select(col("blk"), col("id").as("id_b"),
      col("sh").as("sh_b"), col("sz").as("sz_b"))
    cands
      .join(setsA, Seq("blk", "id_a"))
      .join(setsB, Seq("blk", "id_b"))
      .withColumn("shared", size(array_intersect(col("sh_a"), col("sh_b"))))
      .select(col("blk"), col("id_a"), col("id_b"),
        (col("shared").cast(DoubleType) /
          (col("sz_a") + col("sz_b") - col("shared")).cast(DoubleType))
          .cast(DoubleType).as("jaccard"))
      .filter(col("jaccard") >= tau)
  }
}
