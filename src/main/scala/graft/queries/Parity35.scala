package graft.queries

import graft.Tables._
import graft.ops.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-11 batch 4: community structure, forecasting-grade
  * smoothing, collocation mining, physical-design advice, and the
  * sketch-merge contract surfaced in the driver gate — all
  * FULL-equality DuckDB oracles.
  *
  *  - `x9_label_prop`: semi-synchronous weighted label propagation
  *    (Raghavan et al. 2007 update rule; the alternating-side
  *    schedule of Liu & Murata 2010) over the customer–supplier
  *    co-purchase graph — the community-detection primitive next to
  *    the x9 family's centrality (PageRank), cohesion (k-core) and
  *    closure (triangles) rows. The graph is bipartite by
  *    construction (customers even, suppliers odd), where FULLY
  *    synchronous LPA provably oscillates (labels 2-color and flip
  *    every round); updating one side per round — the natural
  *    2-coloring IS the schedule — converges instead. Each updated
  *    node adopts the neighbor label with the largest incident edge
  *    weight, ties to the smaller label — fully deterministic, so
  *    the oracle unrolls the rounds as CTEs. Parity35Spec pins the
  *    planted two-component fixture to one label per component.
  *  - `x5_ewma`: exponentially weighted moving average (α = 1/2,
  *    window 8) of the per-type daily mean — the smoothing baseline
  *    behind monitoring dashboards and anomaly thresholds. With
  *    α = 1/2 every weight 2^(7−i) is a binary integer, so the
  *    weighted sum is EXACT decimal arithmetic over quantized daily
  *    means (the x6_autocorr idiom) — series-start partial windows
  *    renormalize by the realized weight mass, and only the final
  *    division is (mirrored) IEEE.
  *  - `x4_pmi_cooc`: pointwise-mutual-information collocations over
  *    adjacent token bigrams — the corpus-linguistics ranking that
  *    surfaces multiword expressions ("fixed phrases") for tokenizer
  *    and n-gram-LM work. All counts integer; PMI evaluated as one
  *    mirrored log2 chain; min-support 5 bounds the candidate set.
  *  - `x8_sort_advisor`: the physical-design advisor over the x8
  *    layout family's file model — for each candidate sort column,
  *    per-file zone width, expected files hit by a uniform point
  *    probe (Σ widths / domain — the scan-amplification integral)
  *    and worst-case overlap depth, ranked. The ranking reproduces
  *    ground truth: l_orderkey (the actual layout key) ranks 1 with
  *    expected_files_hit = 1.0.
  *  - `x6_hll_union`: the HLL persist-then-merge contract IN the
  *    gate — per-source register sets estimated independently, then
  *    max-merged into the union sketch (associative register max),
  *    every register and both estimator branches replayed by the
  *    oracle. OpsSpec pins merge == whole-corpus; this query makes
  *    the same contract hash-checked against DuckDB.
  *
  * Scale posture: label propagation is PageRank-shaped — the edge
  * relation is scanned per round with the node-sized label vector
  * broadcast, ONE keyed shuffle per round (the (dst, label) vote
  * sum), lineage truncated per round; at broadcast-breaking node
  * counts the same rounds run as bucketed hash joins (the k-core
  * message-form posture). EWMA and PMI aggregate to (type × day) /
  * vocab-sized relations before any window or join. The sort advisor
  * is planning-sized end to end: zones are file-count rows and the
  * sweep is over 2·files bounds. HLL-union shuffles 64-row register
  * sets per source — the whole point of the sketch at 100 TB: the
  * raw corpus is scanned once per source partition (map-only hash +
  * grouped max), and only metadata moves after that.
  */
object Parity35 {
  type Q = (SparkSession, String) => DataFrame

  private val NsPerDay = 86400L * 1000000000L
  /** synchronous LPA rounds (unrolled in the oracle). */
  private val LpRounds = 3
  /** EWMA window (α = 1/2 ⇒ weight 2^(W−1−i) for lag i). */
  private val EwmaW = 8
  /** PMI min bigram support. */
  private val MinPair = 5

  val queries: Map[String, Q] = Map(
    // ---- semi-synchronous weighted label propagation ---------------
    "x9_label_prop" -> (labelPropQ(_, _, msg = false)),
    // message-form arm (round-12 verdict item 4): identical label
    // arithmetic, same oracle — see labelPropQ for the trade
    "x9_label_prop_msg" -> (labelPropQ(_, _, msg = true)),

    // ---- exact-weight EWMA of the daily mean -----------------------
    "x5_ewma" -> { (s, d) =>
      val daily = eventsNs(s, d)
        .select(col("event_type"), expr(s"ts DIV $NsPerDay").as("day_idx"),
          Exact.dec2(col("value")).as("v"))
        .groupBy(col("event_type"), col("day_idx"))
        .agg((sum(col("v")).cast("double") /
          count(lit(1)).cast("double")).as("mean_raw"))
        .select(col("event_type"), col("day_idx"),
          round(col("mean_raw"), 6).cast("decimal(18,6)").as("x"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day_idx"))
      val lagged = (1 until EwmaW).foldLeft(daily) { (df, i) =>
        df.withColumn(s"x_$i", lag(col("x"), i).over(w))
      }
      def xi(i: Int) = if (i == 0) col("x") else col(s"x_$i")
      // α = 1/2: weight 2^(7−i) is exact in decimal AND binary — the
      // weighted sum never touches IEEE until the final division
      val num = (0 until EwmaW).map(i =>
          coalesce(xi(i), lit(0).cast("decimal(18,6)")) *
            lit(1L << (EwmaW - 1 - i)))
        .reduce(_ + _)
      val den = (0 until EwmaW).map(i =>
          when(xi(i).isNotNull, lit(1L << (EwmaW - 1 - i))).otherwise(lit(0L)))
        .reduce(_ + _)
      lagged.select(col("event_type"), col("day_idx"),
          col("x").cast("double").as("daily_mean"),
          round(num.cast("double") / den.cast("double"), 6).as("ewma"))
        .orderBy(col("event_type"), col("day_idx"))
    },

    // ---- PMI collocations over adjacent bigrams --------------------
    "x4_pmi_cooc" -> { (s, d) =>
      val toks = documents(s, d)
        .select(TextOps.tokens(lower(col("text"))).as("toks"))
        .withColumn("n", size(col("toks"))).filter(col("n") >= 2)
      val uni = toks.select(explode(col("toks")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("cw"))
      val nu = uni.agg(sum(col("cw")).cast("long").as("n_uni"))
      val biAll = toks.select(explode(zip_with(
          slice(col("toks"), lit(1), col("n") - 1),
          slice(col("toks"), lit(2), col("n") - 1),
          (x, y) => struct(x.as("w1"), y.as("w2")))).as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
      val nb = biAll.agg(sum(col("c_ab")).cast("long").as("n_bi"))
      biAll.filter(col("c_ab") >= MinPair)
        .join(uni.select(col("word").as("w1"), col("cw").as("c_a")), Seq("w1"))
        .join(uni.select(col("word").as("w2"), col("cw").as("c_b")), Seq("w2"))
        .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
        .select(col("w1"), col("w2"), col("c_ab"), col("c_a"), col("c_b"),
          round(log2(col("c_ab").cast("double")) +
            lit(2.0) * log2(col("n_uni").cast("double")) -
            log2(col("n_bi").cast("double")) -
            log2(col("c_a").cast("double")) -
            log2(col("c_b").cast("double")), 6).as("pmi"))
        .orderBy(col("pmi").desc, col("w1"), col("w2"))
        .limit(30)
    },

    // ---- sort-key advisor over the file model ----------------------
    "x8_sort_advisor" -> { (s, d) =>
      val base = lineitem(s, d).select(
        expr("l_orderkey DIV 1024").as("file_id"),
        col("l_orderkey").cast("long").as("ok"),
        col("l_partkey").cast("long").as("pk"),
        datediff(col("l_shipdate"), to_date(lit("1970-01-01")))
          .cast("long").as("sd"),
        col("l_suppkey").cast("long").as("sk"))
      val cand = base.selectExpr("file_id",
        "stack(4, 'l_orderkey', ok, 'l_partkey', pk, " +
          "'l_shipdate', sd, 'l_suppkey', sk) AS (col_name, v)")
      val zones = cand.groupBy(col("col_name"), col("file_id"))
        .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      val glob = zones.groupBy(col("col_name"))
        .agg(count(lit(1)).as("n_files"), min(col("mn")).as("gmn"),
          max(col("mx")).as("gmx"),
          sum(col("mx") - col("mn") + 1).as("sumw"))
      // worst-case point-probe depth: the x8_overlap_depth sweep,
      // partitioned per candidate. Closed integer intervals close at
      // mx+1, and processing closes BEFORE opens at equal positions
      // (delta ASC) so touching-but-disjoint zones — exactly the
      // perfect layout — don't read as overlap; genuine shared
      // boundary values still do, since their close sits at mx+1
      val bounds = zones
        .select(col("col_name"), col("mn").as("pos"), lit(1L).as("delta"))
        .unionAll(zones.select(col("col_name"), (col("mx") + 1L).as("pos"),
          lit(-1L).as("delta")))
      val depth = bounds.withColumn("depth",
          sum(col("delta")).over(Window.partitionBy(col("col_name"))
            .orderBy(col("pos"), col("delta"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("col_name")).agg(max(col("depth")).as("max_depth"))
      glob.join(depth, Seq("col_name"))
        .select(col("col_name"), col("n_files"),
          (col("gmx") - col("gmn") + 1).as("domain_width"),
          round(col("sumw").cast("double") /
            (col("gmx") - col("gmn") + 1).cast("double"), 6)
            .as("expected_files_hit"),
          col("max_depth"))
        .withColumn("adv_rank", row_number().over(
          Window.orderBy(col("expected_files_hit"), col("col_name")))
          .cast("long"))
        .orderBy(col("adv_rank"))
    },

    // ---- HLL persist-then-merge in the gate ------------------------
    "x6_hll_union" -> { (s, d) =>
      val toks = documents(s, d).select(col("source"),
        explode(TextOps.tokens(lower(col("text")))).as("sval"))
      val regs = graft.ops.Hll.registersBy(toks, Seq("source"))
      val per = graft.ops.Hll.estimateBy(s, regs, Seq("source"))
        .select(col("source").as("scope"), col("v_zero"), col("s_scaled"),
          round(col("est"), 6).as("est"))
      val merged = graft.ops.Hll
        .estimate(s, graft.ops.Hll.mergeBy(regs))
        .select(lit("__merged").as("scope"), col("v_zero"),
          col("s_scaled"), round(col("est"), 6).as("est"))
      per.unionAll(merged).orderBy(col("scope"))
    })

  /** DuckDB has no conv(): fold the first 15 md5 hex digits into the
    * same 60-bit BIGINT polyHash60 yields (the Parity20 idiom). */
  private def hx15(e: String): String = OracleSql.hx15(e)

  /** Semi-synchronous weighted LPA, two exchange strategies for the
    * label-vector × edges join (the pagerankQ trade, see Parity19):
    * `msg = false` broadcasts the node-sized label vector each round;
    * `msg = true` pre-partitions the edges on `src` once and shuffles
    * only the node-bounded vector per round (shuffle-hash join) — the
    * beyond-broadcast posture for billion-node graphs. Identical
    * label arithmetic, bit-equal results, one oracle. ScaleBench's
    * `rank_arms` block measures the slopes. */
  private[queries] def labelPropQ(s: SparkSession, d: String,
      msg: Boolean): DataFrame = {
    val eo = lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
    val und = eo.union(eo.select(col("dst").as("src"), col("src").as("dst")))
    // edge relation derived once, lineage cut — every round rescans
    // THIS, not the lineitem⋈orders join (the x9_pagerank finding)
    val e0 = und.groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
    // message arm: repartition + CACHE (not checkpoint — AQE
    // checkpoints with UnknownPartitioning and the edges would
    // reshuffle every round; see pagerankQ). Unpersisted post-loop.
    val edges =
      if (msg) {
        val r = e0.repartition(col("src")).persist()
        r.count() // materialize: pre-final AQE cache loses partitioning
        r
      } else graft.ops.Iter.truncate(e0, None)
    var labels = graft.ops.Iter.truncate(
      edges.select(col("src").as("node")).distinct()
        .select(col("node"), col("node").as("lab")), None)
    // try/finally: a throwing round must not leak the cached edges
    try {
      for (r <- 1 to LpRounds) {
        // alternating-side schedule: odd rounds update suppliers
        // (node % 2 = 1), even rounds customers — the bipartite
        // 2-coloring that prevents synchronous-LPA oscillation
        val side = r % 2
        val vec = labels.select(col("node").as("vsrc"), col("lab"))
        val votes = graft.ops.Exchange
          .vecJoin(vec, edges, col("vsrc") === col("src"), msg)
          .groupBy(col("dst"), col("lab")).agg(sum(col("w")).as("wsum"))
        // argmax as a struct-max HASH aggregate, not a row_number
        // window: the window formulation SORTS the edges-sized vote
        // relation every round — measured 37.5× per 10× data at the
        // 100× tier (spill-bound) vs ~linear for the hash aggregate,
        // which also combines map-side. max(w, −lab) = largest vote,
        // ties to the smaller label.
        val best = votes
          .groupBy(col("dst"))
          .agg(max(struct(col("wsum").as("w"), negate(col("lab")).as("nl")))
            .as("m"))
          .select(col("dst").as("bnode"), negate(col("m.nl")).as("blab"))
        val next = labels.join(best, col("node") === col("bnode"), "left")
          .select(col("node"),
            when(col("node") % 2 === side && col("blab").isNotNull,
              col("blab")).otherwise(col("lab")).as("lab"))
        labels = graft.ops.Iter.truncate(next, None)
      }
    } finally if (msg) edges.unpersist(blocking = false)
    labels.groupBy(col("lab"))
      .agg(count(lit(1)).as("n_members"), min(col("node")).as("min_node"))
      .select(col("lab").as("community"), col("n_members"), col("min_node"))
      .orderBy(col("community"))
  }

  /** One SQL replay for BOTH LPA arms (bit-equal results). */
  private val labelPropSql: String = {
    def round(i: Int): String = {
      val side = i % 2
      s"""v$i AS (SELECT e.dst AS node, l.lab,
             CAST(sum(e.w) AS BIGINT) AS wsum
           FROM edges e JOIN lab${i - 1} l ON e.src = l.node
           GROUP BY e.dst, l.lab),
         b$i AS (SELECT node, lab FROM (SELECT node, lab,
             row_number() OVER (PARTITION BY node
               ORDER BY wsum DESC, lab) AS rn FROM v$i) WHERE rn = 1),
         lab$i AS (SELECT p.node,
             CASE WHEN p.node % 2 = $side AND b.lab IS NOT NULL
               THEN b.lab ELSE p.lab END AS lab
           FROM lab${i - 1} p LEFT JOIN b$i b ON p.node = b.node)"""
    }
    s"""WITH eo AS (SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         und AS (SELECT src, dst FROM eo
           UNION ALL SELECT dst, src FROM eo),
         edges AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w
           FROM und GROUP BY src, dst),
         lab0 AS (SELECT DISTINCT src AS node, src AS lab FROM edges),
         ${(1 to LpRounds).map(round).mkString(",\n")}
         SELECT lab AS community, CAST(count(*) AS BIGINT) AS n_members,
           min(node) AS min_node
         FROM lab$LpRounds GROUP BY lab ORDER BY community"""
  }

  val oracles: Map[String, String] = Map(
    "x9_label_prop" -> labelPropSql,
    // the message arm computes identical labels — same replay
    "x9_label_prop_msg" -> labelPropSql,
    "x5_ewma" -> {
      val num = (0 until EwmaW).map { i =>
        val x = if (i == 0) "x" else s"x_$i"
        s"coalesce($x, 0) * ${1L << (EwmaW - 1 - i)}"
      }.mkString(" + ")
      val den = (0 until EwmaW).map { i =>
        val x = if (i == 0) "x" else s"x_$i"
        s"CASE WHEN $x IS NOT NULL THEN ${1L << (EwmaW - 1 - i)} ELSE 0 END"
      }.mkString(" + ")
      val lags = (1 until EwmaW)
        .map(i => s"lag(x, $i) OVER w AS x_$i").mkString(", ")
      s"""WITH daily AS (SELECT event_type,
             epoch_us(ts) * 1000 // $NsPerDay AS day_idx,
             CAST(round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) /
               CAST(count(*) AS DOUBLE), 6) AS DECIMAL(18,6)) AS x
           FROM events GROUP BY event_type, 2),
         lagged AS (SELECT event_type, day_idx, x, $lags
           FROM daily
           WINDOW w AS (PARTITION BY event_type ORDER BY day_idx))
         SELECT event_type, day_idx, CAST(x AS DOUBLE) AS daily_mean,
           round(CAST($num AS DOUBLE) / CAST($den AS DOUBLE), 6) AS ewma
         FROM lagged ORDER BY event_type, day_idx"""
    },
    "x4_pmi_cooc" ->
      s"""WITH t AS (SELECT string_split_regex(trim(lower(text)), '\\s+')
             AS toks FROM documents),
         f AS (SELECT toks FROM t WHERE len(toks) >= 2),
         uni AS (SELECT unnest(toks) AS word FROM f),
         cu AS (SELECT word, CAST(count(*) AS BIGINT) AS cw
           FROM uni GROUP BY word),
         nu AS (SELECT CAST(sum(cw) AS BIGINT) AS n_uni FROM cu),
         bi AS (SELECT toks[i] AS w1, toks[i + 1] AS w2
           FROM f, unnest(range(1, len(toks))) AS u(i)),
         cb AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_ab
           FROM bi GROUP BY w1, w2),
         nb AS (SELECT CAST(sum(c_ab) AS BIGINT) AS n_bi FROM cb)
         SELECT w1, w2, c_ab, a.cw AS c_a, b.cw AS c_b,
           round(log2(CAST(c_ab AS DOUBLE)) +
             2.0 * log2(CAST(n_uni AS DOUBLE)) -
             log2(CAST(n_bi AS DOUBLE)) -
             log2(CAST(a.cw AS DOUBLE)) -
             log2(CAST(b.cw AS DOUBLE)), 6) AS pmi
         FROM cb JOIN cu a ON cb.w1 = a.word
         JOIN cu b ON cb.w2 = b.word
         CROSS JOIN nu CROSS JOIN nb
         WHERE c_ab >= $MinPair
         ORDER BY pmi DESC, w1, w2 LIMIT 30""",
    "x8_sort_advisor" ->
      """WITH base AS (SELECT l_orderkey // 1024 AS file_id,
             CAST(l_orderkey AS BIGINT) AS ok,
             CAST(l_partkey AS BIGINT) AS pk,
             CAST(date_diff('day', DATE '1970-01-01',
               CAST(l_shipdate AS DATE)) AS BIGINT) AS sd,
             CAST(l_suppkey AS BIGINT) AS sk
           FROM lineitem),
         cand AS (SELECT file_id, 'l_orderkey' AS col_name, ok AS v FROM base
           UNION ALL SELECT file_id, 'l_partkey', pk FROM base
           UNION ALL SELECT file_id, 'l_shipdate', sd FROM base
           UNION ALL SELECT file_id, 'l_suppkey', sk FROM base),
         zones AS (SELECT col_name, file_id, min(v) AS mn, max(v) AS mx
           FROM cand GROUP BY col_name, file_id),
         gstats AS (SELECT col_name, CAST(count(*) AS BIGINT) AS n_files,
             min(mn) AS gmn, max(mx) AS gmx,
             CAST(sum(mx - mn + 1) AS BIGINT) AS sumw
           FROM zones GROUP BY col_name),
         bounds AS (SELECT col_name, mn AS pos, CAST(1 AS BIGINT) AS delta
             FROM zones
           UNION ALL SELECT col_name, mx + 1, CAST(-1 AS BIGINT) FROM zones),
         sweep AS (SELECT col_name,
             CAST(sum(delta) OVER (PARTITION BY col_name
               ORDER BY pos, delta ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS depth
           FROM bounds),
         dep AS (SELECT col_name, max(depth) AS max_depth
           FROM sweep GROUP BY col_name),
         m AS (SELECT g.col_name, g.n_files,
             g.gmx - g.gmn + 1 AS domain_width,
             round(CAST(g.sumw AS DOUBLE) /
               CAST(g.gmx - g.gmn + 1 AS DOUBLE), 6) AS expected_files_hit,
             d.max_depth
           FROM gstats g JOIN dep d ON g.col_name = d.col_name)
         SELECT col_name, n_files, domain_width, expected_files_hit,
           max_depth,
           CAST(row_number() OVER (ORDER BY expected_files_hit, col_name)
             AS BIGINT) AS adv_rank
         FROM m ORDER BY adv_rank""",
    "x6_hll_union" -> {
      val sufMod = 1L << graft.ops.Hll.SufBits
      val sufP1 = graft.ops.Hll.SufBits + 1
      val m = graft.ops.Hll.M
      s"""WITH vals AS (SELECT source,
             unnest(string_split_regex(trim(lower(text)), '\\s+')) AS sval
           FROM documents),
         h AS (SELECT source, ${hx15("sval")} AS h FROM vals),
         sp AS (SELECT source, h // $sufMod AS j, h % $sufMod AS suf FROM h),
         rho AS (SELECT source, j,
             CASE WHEN suf = 0 THEN $sufP1
                  ELSE $sufP1 - length(bin(suf)) END AS rho
           FROM sp),
         regs AS (SELECT source, j, max(rho) AS m
           FROM rho GROUP BY source, j),
         scopes AS (SELECT source AS scope, j, m FROM regs
           UNION ALL
           SELECT '__merged' AS scope, j, max(m) FROM regs GROUP BY j),
         grid AS (SELECT s.scope, g.j
           FROM (SELECT DISTINCT scope FROM scopes) s
           CROSS JOIN (SELECT unnest(generate_series(0, ${m - 1})) AS j) g),
         fullr AS (SELECT grid.scope, coalesce(sc.m, 0) AS m
           FROM grid LEFT JOIN scopes sc
             ON grid.scope = sc.scope AND grid.j = sc.j),
         folded AS (SELECT scope,
             CAST(sum(CAST(1 AS BIGINT) << CAST($sufP1 - m AS INTEGER))
               AS BIGINT) AS s_scaled,
             CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS v_zero
           FROM fullr GROUP BY scope),
         est0 AS (SELECT scope, v_zero, s_scaled,
             (0.7213 / (1.0 + 1.079 / $m.0)) * $m.0 * $m.0 *
               pow(2.0, $sufP1.0) / CAST(s_scaled AS DOUBLE) AS raw
           FROM folded)
         SELECT scope, v_zero, s_scaled,
           round(CASE WHEN raw <= ${2.5 * m} AND v_zero > 0
             THEN $m.0 * ln($m.0 / CAST(v_zero AS DOUBLE))
             ELSE raw END, 6) AS est
         FROM est0 ORDER BY scope"""
    })
}
