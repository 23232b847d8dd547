package graft.queries

import graft.Tables._
import graft.ops.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Round-11 batch 8: resampling inference, bipartite centrality,
  * CV-fold integrity, and robust location — FULL-equality DuckDB
  * oracles.
  *
  *  - `x6_bootstrap_ci`: bootstrap confidence interval for the mean
  *    daily `events.value` — B = 32 deterministic resamples drawn
  *    with the md5-derived polyHash60 PRNG (hash(b,i) mod n indexes
  *    the day relation), so the "randomness" replays bit-for-bit in
  *    SQL. Each resample mean is one exact decimal sum + one
  *    mirrored division; the CI is an order statistic of the 32
  *    means (rank 2 / rank 31) — no distributional assumption, no
  *    IEEE accumulation drift.
  *  - `x9_hits`: HITS hubs/authorities on the customer→supplier
  *    purchase graph — the naturally-bipartite centrality (PageRank
  *    ranks a homogenized graph; HITS separates the two roles).
  *    Three mutual-reinforcement rounds in scaled-integer
  *    arithmetic, renormalized by DIV max each half-step (the
  *    x9_pagerank idiom), so every intermediate replays exactly.
  *  - `x7_kfold_assign`: k-fold cross-validation assignment (fold =
  *    polyHash60(doc) mod 5) with the stratification audit — per
  *    (fold, lang) counts and each fold's share of the language —
  *    the integrity check that hash-fold CV is actually balanced.
  *  - `x6_trimmed_mean`: 10%-trimmed mean of `events.value` per
  *    event type (drop the exact bottom/top decile by rank, exact
  *    decimal mean of the rest) — the robust-location companion to
  *    x6_mad_outliers: trimming beats clamping when heavy tails are
  *    one-sided, and the rank cut is integer-exact.
  *
  * Scale posture: the bootstrap resamples a day-count-sized relation
  * (the aggregate of the event stream, not the stream) — B·n index
  * rows of metadata; at 100 TB the same two-stage shape holds
  * (aggregate first, resample the aggregate). HITS is per-round one
  * broadcast of the node-sized score vector + one keyed sum, lineage
  * truncated — the pagerank posture on the bipartite halves. K-fold
  * is a map-only hash + one grouped count. The trimmed mean is one
  * rank window inside the event_type partitioning (the sessionize
  * shuffle family) + one keyed aggregate.
  */
object Parity39 {
  type Q = (SparkSession, String) => DataFrame

  private val NsPerDay = 86400L * 1000000000L
  private val BootB = 32
  private val HitsIters = 3
  private val HitsScale = 1000000000000L
  private val KFolds = 5
  private val TrimPct = 10L

  val queries: Map[String, Q] = Map(
    // ---- deterministic bootstrap CI --------------------------------
    "x6_bootstrap_ci" -> { (s, d) =>
      val daily = eventsNs(s, d)
        .select(expr(s"ts DIV $NsPerDay").as("day_idx"),
          Exact.dec2(col("value")).as("v"))
        .groupBy(col("day_idx"))
        .agg((sum(col("v")).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).as("mean_raw"))
        .select(col("day_idx"),
          round(col("mean_raw"), 6).cast("decimal(18,6)").as("x"))
        .withColumn("idx", row_number().over(
          Window.orderBy(col("day_idx"))).cast("long") - 1)
      val n = daily.agg(count(lit(1)).as("n"))
      // resample grid: B × n deterministic indices from the
      // SQL-replayable hash PRNG — metadata-sized by construction
      val grid = s.range(1, BootB + 1).select(col("id").as("b"))
        .crossJoin(broadcast(n))
        .select(col("b"), col("n"), explode(sequence(lit(0L),
          col("n") - 1)).as("i"))
        .select(col("b"), col("n"),
          (TextOps.polyHash60(concat_ws(":", col("b"), col("i")))
            % col("n")).as("idx"))
      val means = grid.join(daily.select(col("idx"), col("x")), Seq("idx"))
        .groupBy(col("b"))
        .agg((sum(col("x")).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).as("mb"))
        .select(col("b"), round(col("mb"), 8).as("mb"))
      val ranked = means.withColumn("rk", row_number().over(
        Window.orderBy(col("mb"), col("b"))).cast("long"))
      val obs = daily.agg(
        round(sum(col("x")).cast(DoubleType) /
          count(lit(1)).cast(DoubleType), 8).as("mean_obs"),
        count(lit(1)).as("n_days"))
      obs.crossJoin(broadcast(
          ranked.filter(col("rk") === 2).select(col("mb").as("ci_lo"))))
        .crossJoin(broadcast(
          ranked.filter(col("rk") === BootB - 1)
            .select(col("mb").as("ci_hi"))))
        .select(col("n_days"), lit(BootB.toLong).as("b_resamples"),
          col("mean_obs"), col("ci_lo"), col("ci_hi"))
    },

    // ---- HITS hubs & authorities on the bipartite graph ------------
    "x9_hits" -> (hitsQ(_, _, msg = false)),
    // message-form arm (round-12 verdict item 4): identical scaled-
    // integer arithmetic, same oracle — see hitsQ for the trade
    "x9_hits_msg" -> (hitsQ(_, _, msg = true)),

    // ---- k-fold assignment + stratification audit ------------------
    "x7_kfold_assign" -> { (s, d) =>
      val assigned = documents(s, d).select(col("lang"),
        (TextOps.polyHash60(col("doc_id").cast("string")) % KFolds)
          .as("fold"))
      val cell = assigned.groupBy(col("fold"), col("lang"))
        .agg(count(lit(1)).as("n_docs"))
      val perLang = cell.groupBy(col("lang"))
        .agg(sum(col("n_docs")).as("lang_total"))
      val perFold = cell.groupBy(col("fold"))
        .agg(sum(col("n_docs")).as("fold_total"))
      cell.join(perLang, Seq("lang")).join(perFold, Seq("fold"))
        .select(col("fold"), col("lang"), col("n_docs"),
          col("fold_total"),
          round(col("n_docs").cast(DoubleType) /
            col("lang_total").cast(DoubleType), 6).as("lang_share"))
        .orderBy(col("fold"), col("lang"))
    },

    // ---- exact trimmed mean ----------------------------------------
    "x6_trimmed_mean" -> { (s, d) =>
      val ranked = events(s, d)
        .select(col("event_type"), col("event_id"),
          Exact.dec2(col("value")).as("v"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("event_type"))
            .orderBy(col("v"), col("event_id"))).cast("long"))
      val cnt = ranked.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("event_type"), col("n"),
          expr(s"n * $TrimPct DIV 100").as("cut"))
      ranked.join(cnt, Seq("event_type"))
        .filter(col("rk") > col("cut") && col("rk") <= col("n") - col("cut"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_kept"),
          round(sum(col("v")).cast(DoubleType) /
            count(lit(1)).cast(DoubleType), 8).as("trimmed_mean"))
        .join(cnt.select(col("event_type"), col("n"), col("cut")),
          Seq("event_type"))
        .select(col("event_type"), col("n"), col("cut"), col("n_kept"),
          col("trimmed_mean"))
        .orderBy(col("event_type"))
    })

  /** DuckDB polyHash60 (Parity20 idiom). */
  private def hx15(e: String): String = OracleSql.hx15(e)

  /** HITS hubs/authorities, two exchange strategies for the
    * score-vector × edges joins (the pagerankQ trade, see Parity19):
    * `msg = false` broadcasts the node-sized hub/authority vectors
    * each half-step; `msg = true` pre-partitions the bipartite edge
    * relation ONCE per join key (by `c` for the hub→authority step,
    * by `p` for authority→hub) and shuffles only the node-bounded
    * score vectors per round (shuffle-hash joins) — the
    * beyond-broadcast posture for billion-node graphs. Identical
    * scaled-integer arithmetic, bit-equal results, one oracle.
    * ScaleBench's `rank_arms` block measures the slopes. */
  /** `oneCopy = true` (measurement arm only, ScaleBench
    * `hits_copies`): keep ONLY the c-partitioned cache and let the
    * authority→hub half-step reshuffle the edge relation to the p key
    * every round. The two-copy form is the Pregel-canonical
    * forward+reverse adjacency: each half-step joins on a DIFFERENT
    * key, and with one copy the off-key half-step's join moves the
    * EDGES (edge-sized exchange × rounds) instead of the
    * node-bounded vector — SCALE.md `hits_copies` prices the trade. */
  private[graft] def hitsQ(s: SparkSession, d: String,
      msg: Boolean, oneCopy: Boolean = false): DataFrame = {
    val e0 = lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("p"))
      .groupBy(col("c"), col("p")).agg(count(lit(1)).as("w"))
    // the two half-steps join on DIFFERENT keys — in message form
    // each gets its own co-partitioned CACHED copy of the edge
    // relation (cache, not checkpoint: AQE checkpoints with
    // UnknownPartitioning and the edges would reshuffle every
    // half-step; see pagerankQ). Unpersisted post-loop.
    val edgesC =
      if (msg) e0.repartition(col("c")).persist()
      else graft.ops.Iter.truncate(e0, None)
    val edgesP =
      if (msg && oneCopy) { edgesC.count(); edgesC }
      else if (msg) {
        val r = edgesC.repartition(col("p")).persist()
        // ONE materializing action fills BOTH caches (edgesP computes
        // through the persisted edgesC), halving the setup passes the
        // old count-each-copy form paid; both cached plans then report
        // their hash partitioning (pre-final AQE caches would report
        // UnknownPartitioning and reshuffle the edges every half-step)
        r.count()
        r
      } else edgesC
    def vecJoin(vec: DataFrame, edges: DataFrame, key: String) =
      graft.ops.Exchange.vecJoinUsing(vec, edges, Seq(key), msg)
    var hubs = graft.ops.Iter.truncate(
      edgesC.select(col("c")).distinct()
        .select(col("c"), lit(HitsScale).as("h")), None)
    var auth: DataFrame = null
    // try/finally: a throwing half-step must not leak the two cached
    // edge copies
    try {
      for (_ <- 1 to HitsIters) {
        val a0 = vecJoin(hubs, edgesC, "c")
          .groupBy(col("p")).agg(sum(col("h") * col("w")).as("a_raw"))
        val aMax = a0.agg(max(col("a_raw")).as("am"))
        auth = graft.ops.Iter.truncate(
          a0.crossJoin(broadcast(aMax))
            .select(col("p"),
              expr(s"a_raw DIV greatest(am DIV $HitsScale, 1)")
                .as("a")), None)
        val h0 = vecJoin(auth, edgesP, "p")
          .groupBy(col("c")).agg(sum(col("a") * col("w")).as("h_raw"))
        val hMax = h0.agg(max(col("h_raw")).as("hm"))
        hubs = graft.ops.Iter.truncate(
          h0.crossJoin(broadcast(hMax))
            .select(col("c"),
              expr(s"h_raw DIV greatest(hm DIV $HitsScale, 1)")
                .as("h")), None)
      }
    } finally if (msg) {
      edgesC.unpersist(blocking = false)
      edgesP.unpersist(blocking = false)
    }
    val topA = auth.select(lit("authority").as("kind"),
        col("p").as("entity_key"), col("a").as("score"))
      .orderBy(col("score").desc, col("entity_key")).limit(20)
    val topH = hubs.select(lit("hub").as("kind"),
        col("c").as("entity_key"), col("h").as("score"))
      .orderBy(col("score").desc, col("entity_key")).limit(20)
    topA.unionAll(topH)
      .orderBy(col("kind"), col("score").desc, col("entity_key"))
  }

  /** One SQL replay for BOTH HITS arms (bit-equal results). */
  private val hitsSql: String = {
    def round(i: Int): String =
      s"""a${i}r AS (SELECT e.p, CAST(sum(h${i - 1}.h * e.w) AS BIGINT)
             AS a_raw
           FROM edges e JOIN h${i - 1} ON e.c = h${i - 1}.c GROUP BY e.p),
         a$i AS (SELECT p, CAST(a_raw //
             greatest((SELECT max(a_raw) FROM a${i}r) // $HitsScale, 1)
             AS BIGINT) AS a FROM a${i}r),
         h${i}r AS (SELECT e.c, CAST(sum(a$i.a * e.w) AS BIGINT) AS h_raw
           FROM edges e JOIN a$i ON e.p = a$i.p GROUP BY e.c),
         h$i AS (SELECT c, CAST(h_raw //
             greatest((SELECT max(h_raw) FROM h${i}r) // $HitsScale, 1)
             AS BIGINT) AS h FROM h${i}r)"""
    s"""WITH edges AS (SELECT o_custkey AS c, l_suppkey AS p,
             CAST(count(*) AS BIGINT) AS w
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           GROUP BY 1, 2),
         h0 AS (SELECT DISTINCT c, CAST($HitsScale AS BIGINT) AS h
           FROM edges),
         ${(1 to HitsIters).map(round).mkString(",\n")},
         topa AS (SELECT 'authority' AS kind, p AS entity_key, a AS score
           FROM a$HitsIters ORDER BY score DESC, entity_key LIMIT 20),
         toph AS (SELECT 'hub' AS kind, c AS entity_key, h AS score
           FROM h$HitsIters ORDER BY score DESC, entity_key LIMIT 20)
         SELECT * FROM (SELECT * FROM topa UNION ALL SELECT * FROM toph)
         ORDER BY kind, score DESC, entity_key"""
  }

  val oracles: Map[String, String] = Map(
    "x6_bootstrap_ci" ->
      s"""WITH daily0 AS (SELECT epoch_us(ts) * 1000 // $NsPerDay AS day_idx,
             CAST(round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) /
               CAST(count(*) AS DOUBLE), 6) AS DECIMAL(18,6)) AS x
           FROM events GROUP BY 1),
         daily AS (SELECT x, CAST(row_number() OVER (ORDER BY day_idx)
             AS BIGINT) - 1 AS idx
           FROM daily0),
         nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
         grid AS (SELECT b, i,
             ${hx15("CAST(b AS VARCHAR) || ':' || CAST(i AS VARCHAR)")}
               % (SELECT n FROM nn) AS idx
           FROM (SELECT unnest(generate_series(1, $BootB)) AS b),
                (SELECT unnest(generate_series(0,
                   (SELECT CAST(n - 1 AS INTEGER) FROM nn))) AS i)),
         means AS (SELECT g.b,
             round(CAST(sum(d.x) AS DOUBLE) / CAST(count(*) AS DOUBLE), 8)
               AS mb
           FROM grid g JOIN daily d ON g.idx = d.idx GROUP BY g.b),
         ranked AS (SELECT mb, CAST(row_number() OVER (ORDER BY mb, b)
             AS BIGINT) AS rk FROM means),
         obs AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
             round(CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE), 8)
               AS mean_obs
           FROM daily)
         SELECT n_days, CAST($BootB AS BIGINT) AS b_resamples, mean_obs,
           (SELECT mb FROM ranked WHERE rk = 2) AS ci_lo,
           (SELECT mb FROM ranked WHERE rk = ${BootB - 1}) AS ci_hi
         FROM obs""",
    "x9_hits" -> hitsSql,
    // the message arm computes identical scores — same replay
    "x9_hits_msg" -> hitsSql,
    "x7_kfold_assign" ->
      s"""WITH a AS (SELECT lang,
             ${hx15("CAST(doc_id AS VARCHAR)")} % $KFolds AS fold
           FROM documents),
         cell AS (SELECT fold, lang, CAST(count(*) AS BIGINT) AS n_docs
           FROM a GROUP BY fold, lang),
         pl AS (SELECT lang, CAST(sum(n_docs) AS BIGINT) AS lang_total
           FROM cell GROUP BY lang),
         pf AS (SELECT fold, CAST(sum(n_docs) AS BIGINT) AS fold_total
           FROM cell GROUP BY fold)
         SELECT c.fold, c.lang, c.n_docs, pf.fold_total,
           round(CAST(c.n_docs AS DOUBLE) / CAST(pl.lang_total AS DOUBLE),
             6) AS lang_share
         FROM cell c JOIN pl ON c.lang = pl.lang
         JOIN pf ON c.fold = pf.fold
         ORDER BY c.fold, c.lang""",
    "x6_trimmed_mean" ->
      s"""WITH ranked AS (SELECT event_type,
             CAST(value AS DECIMAL(18,2)) AS v,
             CAST(row_number() OVER (PARTITION BY event_type
               ORDER BY CAST(value AS DECIMAL(18,2)), event_id)
               AS BIGINT) AS rk
           FROM events),
         cnt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) * $TrimPct // 100 AS BIGINT) AS cut
           FROM ranked GROUP BY event_type),
         kept AS (SELECT r.event_type, r.v
           FROM ranked r JOIN cnt c ON r.event_type = c.event_type
           WHERE r.rk > c.cut AND r.rk <= c.n - c.cut)
         SELECT k.event_type, c.n, c.cut,
           CAST(count(*) AS BIGINT) AS n_kept,
           round(CAST(sum(k.v) AS DOUBLE) / CAST(count(*) AS DOUBLE), 8)
             AS trimmed_mean
         FROM kept k JOIN cnt c ON k.event_type = c.event_type
         GROUP BY k.event_type, c.n, c.cut
         ORDER BY k.event_type"""
  )
}
