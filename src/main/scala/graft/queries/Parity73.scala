package graft.queries

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-14 batch 7: three pipeline stages the corpus-curation
  * inventory still lacked — a term-blocklist gate, probabilistic
  * record linkage, and deterministic random-walk graph sampling.
  *
  *  - `x4_blocklist_gate`: the C4/RefinedWeb-style badword filter —
  *    per-document token counts against a SOFT term list (gate on the
  *    bad-token ratio) and a HARD term list (gate on any hit). Pure
  *    map-side higher-order functions (`filter`/`size` over one
  *    `split`) — no explode, no shuffle, whole-stage codegen; the
  *    list is an inlined literal array (at 100 TB a broadcast
  *    variable, same plan shape). Ratios in integer milli (`DIV`) so
  *    the oracle replays exactly.
  *  - `x2_record_linkage`: Fellegi–Sunter-style entity resolution
  *    over a records table with planted dirty twins (deterministic
  *    md5 sample of customers, last name char swapped, balance
  *    nudged +1.5). Multi-pass blocking — two balance-band keys
  *    shifted by half a band, so any pair with |Δbal| < 50 co-blocks
  *    in at least one pass (an interval shorter than half the band
  *    width contains at most one block boundary) — then integer
  *    agreement scoring (name edit distance, segment equality,
  *    balance proximity) and connected components over match pairs
  *    to assign entity ids. Block size is bounded by the balance
  *    DENSITY, not the corpus: candidate pairs stay linear as the
  *    table grows (the sorted-neighborhood argument), vs the naive
  *    all-pairs O(n²/nations).
  *  - `x9_random_walk`: fixed-length random walks from a
  *    deterministic seed sample over the co-purchase graph — the
  *    node2vec/GraphSAGE sampling primitive (corpus expansion,
  *    embedding training data). The step choice is a pure function
  *    of the walk state: HASH-MIN selection (the neighbor with the
  *    smallest md5(walk:step:node:nb) — uniform among neighbors,
  *    exactly replayable in any engine). Each step is ONE keyed
  *    equi-join of the (walks)-sized frontier against the adjacency
  *    (built once, lineage-cut) plus one map-side-combinable min —
  *    no broadcast dependence, no rank index, no degree window;
  *    walk count is the linear cost knob, steps the round knob.
  */
object Parity73 {
  type Q = (SparkSession, String) => DataFrame

  private val SoftTerms = Seq("slow", "small", "big")
  private val HardTerms = Seq("dup")
  private val BadMilliGate = 120

  /** Twin sample: md5 2-hex prefix <= "0f" = 1/16 of customers. */
  private val TwinHex = "0f"
  private val MatchScore = 1100

  /** Walk seed sample: md5 3-hex prefix <= "03f" = 1/64 of nodes. */
  private val WalkHex = "03f"
  private val WalkSteps = 4

  // ---- x4_blocklist_gate -------------------------------------------

  private[graft] def blocklistGate(docs: DataFrame): DataFrame = {
    val soft = array(SoftTerms.map(lit): _*)
    val hard = array(HardTerms.map(lit): _*)
    docs
      .withColumn("toks",
        filter(split(lower(col("text")), "[^a-z0-9]+"), t => t =!= ""))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .withColumn("n_bad",
        size(filter(col("toks"), t => array_contains(soft, t))).cast("long"))
      .withColumn("hard_hit",
        when(exists(col("toks"), t => array_contains(hard, t)), 1L)
          .otherwise(0L))
      .withColumn("bad_milli",
        when(col("n_tok") > 0, expr("1000 * n_bad DIV n_tok"))
          .otherwise(lit(0L)))
      .withColumn("blocked",
        when(col("hard_hit") === 1 || col("bad_milli") >= BadMilliGate, 1L)
          .otherwise(0L))
      .select(col("doc_id"), col("n_tok"), col("n_bad"), col("bad_milli"),
        col("hard_hit"), col("blocked"))
  }

  // ---- x2_record_linkage -------------------------------------------

  /** Base records plus deterministic dirty twins (same semantics as
    * the oracle's recs CTE). */
  private[graft] def linkageRecords(cust: DataFrame): DataFrame = {
    val base = cust.select(
      col("c_custkey").as("rec_id"), col("c_name").as("name"),
      col("c_nationkey").as("nat"), col("c_acctbal").as("bal"),
      col("c_mktsegment").as("seg"))
    val twins = cust
      .filter(substring(md5(col("c_custkey").cast("string")), 1, 2)
        <= TwinHex)
      .select(
        (col("c_custkey") + 1000000L).as("rec_id"),
        concat(expr("substring(c_name, 1, length(c_name) - 1)"), lit("X"))
          .as("name"),
        col("c_nationkey").as("nat"),
        (col("c_acctbal") + 1.5).as("bal"),
        col("c_mktsegment").as("seg"))
    base.unionAll(twins)
  }

  /** Two-pass blocking keys: balance bands of `width`, second pass
    * shifted by half a band — any pair with |Δbal| < width/2 shares a
    * key in at least one pass. The band width is the DENSITY knob:
    * at a growing record count it must shrink ∝ 1/n to keep block
    * sizes (and so candidate pairs) linear — ScaleBench
    * `linkage_bands` measures the fixed-width quadratic cliff. */
  private[graft] def candidatePairs(recs: DataFrame,
      width: Double): DataFrame = {
    val p1 = recs.select(col("rec_id"), col("nat"),
      floor(col("bal") / width).as("blk"))
    val p2 = recs.select(col("rec_id"), col("nat"),
      (floor((col("bal") + width / 2) / width) + 1000000L).as("blk"))
    val keys = p1.unionAll(p2)
    keys.as("a").join(keys.as("b"),
        col("a.nat") === col("b.nat") && col("a.blk") === col("b.blk")
          && col("a.rec_id") < col("b.rec_id"))
      .select(col("a.rec_id").as("ra"), col("b.rec_id").as("rb"))
      .distinct()
  }

  /** Multi-pass-blocked candidate pairs → integer agreement score →
    * CC over matches → (rec_id, entity_id). */
  private[graft] def recordLinkage(recs0: DataFrame): DataFrame = {
    // the records relation feeds four scans (two block passes + two
    // scoring sides) — cut its lineage once so each is a rescan of
    // the small materialized state, not a re-derivation
    val recs = graft.ops.Iter.truncate(recs0, None)
    val cand = candidatePairs(recs, width = 100.0)
    val x = recs.select(col("rec_id"), col("name").as("name_a"),
      col("bal").as("bal_a"), col("seg").as("seg_a"))
    val y = recs.select(col("rec_id"), col("name").as("name_b"),
      col("bal").as("bal_b"), col("seg").as("seg_b"))
    val scored = cand
      .join(x, col("ra") === x("rec_id")).drop("rec_id")
      .join(y, col("rb") === y("rec_id")).drop("rec_id")
      .withColumn("score",
        greatest(lit(0), lit(1000) - lit(250) *
          levenshtein(col("name_a"), col("name_b")))
          + when(col("seg_a") === col("seg_b"), 300).otherwise(0)
          + when(abs(col("bal_a") - col("bal_b")) < 5.0, 200).otherwise(0))
    val pairs = scored.filter(col("score") >= MatchScore)
      .select(col("ra"), col("rb"))
    val comp = graft.ops.Connect.connectedComponents(pairs, "ra", "rb")
    recs.join(comp, col("rec_id") === col("id"), "left_outer")
      .select(col("rec_id"),
        coalesce(col("comp"), col("rec_id")).as("entity_id"))
  }

  // ---- x9_random_walk ----------------------------------------------

  /** Deterministic step choice by HASH-MIN selection: each candidate
    * neighbor gets an independent key md5("walk:step:node:nb"), and
    * the walk takes the neighbor whose key is smallest — a uniform
    * choice among neighbors (each is equally likely to hold the min)
    * that needs NO degree column and NO rank index. The nb is
    * zero-padded onto the key tail so an (astronomically unlikely)
    * md5 tie still breaks deterministically; ids must be
    * non-negative for the pad to order numerically. The first
    * formulation rank-ordered the adjacency with a window
    * (row_number + count) and picked index = hash mod degree —
    * semantically equal in distribution, but the window SORT over
    * the full edge list dominated every tier (ScaleBench walk_tiers:
    * 1502 s at 100× vs 216 s for this form, which touches the
    * adjacency only through per-step equi-joins; SCALE.md). */
  private def stepKey(step: Int): Column =
    concat(
      md5(concat_ws(":", col("walk").cast("string"),
        lit(step.toString), col("node").cast("string"),
        col("nb").cast("string"))),
      lpad(col("nb").cast("string"), 12, "0"))

  /** One walk step, un-truncated (PlanShapeSpec pins this plan). Two
    * exchange arms, the advisor-owned frontier call (round-14 verdict:
    * "the advisor should own that call too"):
    *
    *  - `msg = false` (broadcast arm): the walks-sized frontier is
    *    explicitly BROADCAST — the checkpointed frontier scan carries
    *    no stats, and without the hint the join falls to sort-merge,
    *    re-shuffling AND re-sorting the full adjacency every step
    *    (the plan ScaleBench walk_tiers measured). Right while the
    *    frontier (one row per walk, forever) fits executor memory.
    *  - `msg = true` (message arm): past the rank-arm crossover the
    *    frontier shuffle-hash-joins into the adjacency — the caller
    *    pre-partitions and caches the adjacency on `node` so only the
    *    walk-bounded frontier moves per step (the pagerankQ posture).
    *
    * Either way the hash-min choice is a map-side-combinable min
    * keyed by walk (a partial SortAggregate — the string key keeps it
    * off the hash-aggregate path, but only one row per walk crosses
    * the exchange). Grouping by walk alone is sound because a walk
    * occupies exactly one node per step. */
  private[graft] def walkStep(cur: DataFrame, adj: DataFrame,
      r: Int, msg: Boolean = false): DataFrame =
    graft.ops.Exchange.vecJoinUsing(cur, adj, Seq("node"), msg)
      .groupBy(col("walk"))
      .agg(min(stepKey(r)).as("k"))
      .select(col("walk"),
        substring(col("k"), 33, 12).cast("long").as("node"))

  /** Fixed-length walks. `adj` is a both-directions (node, nb) edge
    * list with unique rows and non-negative ids. Both arms are
    * bit-equal (deterministic hash-min choice), one oracle. */
  private[graft] def randomWalks(adj0: DataFrame, seedHex: String,
      steps: Int, msg: Boolean = false): DataFrame = {
    val adj =
      if (msg) {
        // message arm: partition the adjacency on the join key once
        // and cache it — each step's shuffle-hash join then moves only
        // the frontier (materialize NOW or AQE reports
        // UnknownPartitioning and step 1 reshuffles the edges)
        val a = adj0.repartition(col("node")).persist()
        a.count()
        a
      } else graft.ops.Iter.truncate(adj0, None)
    try {
      var cur = adj.select(col("node")).distinct()
        .filter(substring(md5(col("node").cast("string")), 1, 3) <= seedHex)
        .select(col("node").as("walk"), col("node"))
      var traj = cur.select(col("walk"), lit(0L).as("step"), col("node"))
      for (r <- 1 to steps) {
        // truncate the frontier per step: the trajectory union holds
        // one branch per step, and without the cut each branch would
        // replay every prior frontier⋈adjacency join
        cur = graft.ops.Iter.truncate(walkStep(cur, adj, r, msg), None)
        traj = traj.unionAll(
          cur.select(col("walk"), lit(r.toLong).as("step"), col("node")))
      }
      // eagerly cut the whole trajectory before releasing the cached
      // adjacency the step branches reference
      if (msg) graft.ops.Iter.truncate(traj, None) else traj
    } finally if (msg) adj.unpersist(blocking = false)
  }

  /** Frontier-arm routing for x9_random_walk: one walk per sampled
    * node (3-hex-char md5 prefix ≤ [[WalkHex]] = (0x$WalkHex+1)/4096
    * of nodes), node universe ≤ |part| — a metadata-cheap count,
    * memoized per data dir — against the measured rank-arm crossover.
    * The walk frontier stays exactly walks-sized every step, so the
    * rank-vector byte model applies unchanged. */
  private val walkEstCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def advisedMsg(s: SparkSession, d: String): Boolean =
    graft.ops.Exchange.adviseMsg(
      walkEstCache.computeIfAbsent(d,
        _ => graft.Tables.part(s, d).count() *
          (java.lang.Long.parseLong(WalkHex, 16) + 1) / 4096))

  val queries: Map[String, Q] = Map(
    "x4_blocklist_gate" -> ((s, d) => blocklistGate(documents(s, d))),
    "x2_record_linkage" -> ((s, d) => recordLinkage(
      linkageRecords(customer(s, d)))),
    "x9_random_walk" -> { (s, d) =>
      val pairs = Parity24.edges(s, d)
      val adj = pairs.select(col("u").as("node"), col("v").as("nb"))
        .unionAll(pairs.select(col("v").as("node"), col("u").as("nb")))
      randomWalks(adj, WalkHex, WalkSteps, msg = advisedMsg(s, d))
    },
    // forced message arm, same oracle (bit-equal trajectories) — the
    // x9_pagerank_msg convention
    "x9_random_walk_msg" -> { (s, d) =>
      val pairs = Parity24.edges(s, d)
      val adj = pairs.select(col("u").as("node"), col("v").as("nb"))
        .unionAll(pairs.select(col("v").as("node"), col("u").as("nb")))
      randomWalks(adj, WalkHex, WalkSteps, msg = true)
    })

  private def walkStepSql(i: Int): String = {
    val k = s"concat(md5(concat(s.walk, ':', $i, ':', s.node, ':', " +
      s"a.nb)), lpad(CAST(a.nb AS VARCHAR), 12, '0'))"
    s"""s$i AS (
         SELECT s.walk,
           CAST(substring(min($k), 33, 12) AS BIGINT) AS node
         FROM s${i - 1} s JOIN adj a ON a.node = s.node
         GROUP BY s.walk)"""
  }

  val oracles: Map[String, String] = Map(
    "x4_blocklist_gate" -> s"""
      WITH t AS (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
            x -> x <> '') AS toks
        FROM documents),
      c AS (SELECT doc_id,
          CAST(len(toks) AS BIGINT) AS n_tok,
          CAST(len(list_filter(toks,
            x -> x IN (${SoftTerms.map("'" + _ + "'").mkString(", ")})))
            AS BIGINT) AS n_bad,
          CAST(CASE WHEN len(list_filter(toks,
            x -> x IN (${HardTerms.map("'" + _ + "'").mkString(", ")}))) > 0
            THEN 1 ELSE 0 END AS BIGINT) AS hard_hit
        FROM t),
      m AS (SELECT doc_id, n_tok, n_bad, hard_hit,
          CASE WHEN n_tok > 0 THEN 1000 * n_bad // n_tok
               ELSE CAST(0 AS BIGINT) END AS bad_milli
        FROM c)
      SELECT doc_id, n_tok, n_bad, bad_milli, hard_hit,
        CAST(CASE WHEN hard_hit = 1 OR bad_milli >= $BadMilliGate
          THEN 1 ELSE 0 END AS BIGINT) AS blocked
      FROM m""",
    "x2_record_linkage" -> s"""
      WITH RECURSIVE recs AS MATERIALIZED (
        SELECT c_custkey AS rec_id, c_name AS name, c_nationkey AS nat,
               c_acctbal AS bal, c_mktsegment AS seg FROM customer
        UNION ALL
        SELECT c_custkey + 1000000,
               concat(substr(c_name, 1, length(c_name) - 1), 'X'),
               c_nationkey, c_acctbal + 1.5, c_mktsegment
        FROM customer
        WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 2) <= '$TwinHex'),
      keys AS (
        SELECT rec_id, nat, CAST(floor(bal / 100) AS BIGINT) AS blk
        FROM recs
        UNION ALL
        SELECT rec_id, nat,
          CAST(floor((bal + 50) / 100) AS BIGINT) + 1000000 FROM recs),
      cand AS (
        SELECT DISTINCT a.rec_id AS ra, b.rec_id AS rb
        FROM keys a JOIN keys b
          ON a.nat = b.nat AND a.blk = b.blk AND a.rec_id < b.rec_id),
      scored AS (
        SELECT ra, rb,
          greatest(0, 1000 - 250 * levenshtein(x.name, y.name))
            + CASE WHEN x.seg = y.seg THEN 300 ELSE 0 END
            + CASE WHEN abs(x.bal - y.bal) < 5.0 THEN 200 ELSE 0 END
            AS score
        FROM cand JOIN recs x ON ra = x.rec_id
                  JOIN recs y ON rb = y.rec_id),
      pairs AS (SELECT ra, rb FROM scored WHERE score >= $MatchScore),
      edges AS (SELECT ra AS a, rb AS b FROM pairs
                UNION SELECT rb, ra FROM pairs),
      nodes AS (SELECT DISTINCT a AS id FROM edges),
      reach(id, lbl) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.id),
      comp AS (SELECT id, min(lbl) AS comp FROM reach GROUP BY id)
      SELECT r.rec_id, CAST(coalesce(c.comp, r.rec_id) AS BIGINT)
        AS entity_id
      FROM recs r LEFT JOIN comp c ON r.rec_id = c.id""",
    "x9_random_walk" -> walkSql,
    "x9_random_walk_msg" -> walkSql
  )

  /** One SQL replay for BOTH walk arms (bit-equal trajectories). */
  private lazy val walkSql: String = s"""
      WITH pairs AS MATERIALIZED (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      adj AS MATERIALIZED (
        SELECT u AS node, v AS nb FROM pairs
        UNION ALL SELECT v AS node, u AS nb FROM pairs),
      s0 AS (SELECT DISTINCT node AS walk, node FROM adj
             WHERE substring(md5(CAST(node AS VARCHAR)), 1, 3)
               <= '$WalkHex'),
      ${(1 to WalkSteps).map(walkStepSql).mkString(",\n      ")}
      SELECT walk, CAST(0 AS BIGINT) AS step, node FROM s0
      ${(1 to WalkSteps).map(i =>
        s"UNION ALL SELECT walk, CAST($i AS BIGINT), node FROM s$i")
        .mkString("\n      ")}"""
}
