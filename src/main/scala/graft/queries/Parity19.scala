package graft.queries

import graft.Tables._
import graft.ops.TextOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Round-10 batch 6: corpus-level quality scoring, sketch set
  * algebra, iterative graph rank, and ANALYZE-style statistics —
  * every query with a FULL-equality DuckDB oracle.
  *
  *  - `x4_lm_score`: bigram-LM document quality scoring (the
  *    CCNet-style "train an LM on the corpus, score each document"
  *    filter). All probabilities are integer micro-units
  *    (1e6·c(w1,w2) DIV c(w1·)) so the per-doc sums are exact
  *    BIGINTs — no IEEE summation order anywhere.
  *  - `x6_kmv_theta`: theta-sketch SET ALGEBRA — union and
  *    intersection cardinality estimates between two sources' 3-gram
  *    sets from K-minimum-value sketches. The sketch build, union
  *    (K smallest of the combined hash sets), theta cut, and both
  *    estimators replay hash-for-hash in SQL.
  *  - `x9_pagerank`: 5 iterations of weighted PageRank over the
  *    customer<->supplier order graph in EXACT fixed-point integer
  *    arithmetic (total mass 1e12; per-edge contribution
  *    (((r·85) DIV 100)·w) DIV w_out). BIGINT sums are
  *    order-independent, so a distributed iterative linear-algebra
  *    kernel gets a bit-exact relational oracle (5 unrolled CTE
  *    steps).
  *  - `x6_col_stats`: one-pass ANALYZE TABLE — per-column rows/nulls/
  *    NDV/min/max over lineitem numerics via stack+groupBy (what a
  *    CBO stats collection job runs at 100 TB).
  *  - `x6_histogram`: equi-width 8-bucket histogram with data-derived
  *    bounds — two-pass (1-row bounds aggregate broadcast back), the
  *    mirrored IEEE chain ((v-lo)·8.0)/(hi-lo) floors identically in
  *    both engines.
  *
  * Scale: lm_score is two token-keyed aggregates (vocab²-bounded LM
  * relation) + one bigram-keyed join back to the corpus — the join
  * input is the corpus bigram stream (map-only explode), the build
  * side the LM table. kmv_theta's sketches are K-bounded per source
  * (the production mergeable path is `functions/MinHashUnionAgg`;
  * the windowed build here keeps the oracle replayable). pagerank is
  * one keyed shuffle per iteration with ranks co-partitioned on the
  * node key; edges carry their out-weight so each step is
  * join+sum — no driver-side state, O(E) per round. col_stats/
  * histogram are single full scans with map-side partial aggregates
  * (histogram adds a 1-row broadcast for the bounds).
  */
object Parity19 {
  type Q = (SparkSession, String) => DataFrame

  private val K = 64                     // KMV sketch size
  private val SrcA = "src0"
  private val SrcB = "src1"
  private val Pow60 = 1152921504606846976.0 // 2^60, exactly representable
  private val PrT = 1000000000000L       // PageRank total mass (pico units)
  private val PrIters = 5
  private val HistBins = 8

  /** Estimate distinct count from a K-minimum-value sketch: exact
    * when the sketch holds the whole set, else (K-1)·2^60/theta with
    * a single IEEE divide (mirrored verbatim in the oracle). */
  private def kmvEst(n: Column, theta: Column): Column =
    when(n < K, n).otherwise(
      floor(lit((K - 1).toDouble * Pow60) / theta.cast(DoubleType))
        .cast(LongType))

  val queries: Map[String, Q] = Map(
    // ---- bigram-LM document quality score --------------------------
    "x4_lm_score" -> { (s, d) =>
      val tk = documents(s, d)
        .select(col("doc_id"), TextOps.tokens(lower(col("text"))).as("t"))
        .withColumn("n", size(col("t")))
        .filter(col("n") >= 2)
      val bi = tk.select(col("doc_id"), explode(zip_with(
          slice(col("t"), lit(1), col("n") - 1),
          slice(col("t"), lit(2), col("n") - 1),
          (x, y) => struct(x.as("w1"), y.as("w2")))).as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      val c2 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
      val c1 = c2.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
      val lm = c2.join(c1, Seq("w1"))
        .select(col("w1"), col("w2"),
          expr("CAST((1000000 * c2) DIV c1 AS BIGINT)").as("p_micro"))
      bi.join(lm, Seq("w1", "w2"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("p_micro")).as("lm_sum"))
        .select(col("doc_id"), col("n_bigrams"), col("lm_sum"),
          expr("CAST(lm_sum DIV n_bigrams AS BIGINT)").as("lm_avg_micro"))
        .orderBy(col("doc_id"))
    },

    // ---- theta-sketch set algebra (union / intersection) -----------
    "x6_kmv_theta" -> { (s, d) =>
      val g = documents(s, d)
        .filter(col("source").isin(SrcA, SrcB))
        .select(col("source"),
          explode(TextOps.shingles(lower(col("text")), 3)).as("gram"))
        .select(col("source"), TextOps.polyHash60(col("gram")).as("h"))
        .distinct()
      val sk = g.withColumn("rn", row_number().over(
          Window.partitionBy(col("source")).orderBy(col("h"))))
        .filter(col("rn") <= K)
        .select(col("source"), col("h"))
      val aSk = sk.filter(col("source") === SrcA).select(col("h"))
      val bSk = sk.filter(col("source") === SrcB).select(col("h"))
      val aAgg = aSk.agg(count(lit(1)).as("n_a"), max(col("h")).as("theta_a"))
      val bAgg = bSk.agg(count(lit(1)).as("n_b"), max(col("h")).as("theta_b"))
      val un = sk.select(col("h")).distinct()
        .withColumn("rn", row_number().over(Window.orderBy(col("h"))))
        .filter(col("rn") <= K)
        .select(col("h"))
      val uAgg = un.agg(count(lit(1)).as("n_union"),
        max(col("h")).as("theta_u"))
      val cm = un.join(aSk, Seq("h")).join(bSk, Seq("h"))
        .agg(count(lit(1)).as("n_common"))
      aAgg.crossJoin(bAgg).crossJoin(uAgg).crossJoin(cm)
        .select(lit(K.toLong).as("k"),
          col("n_a"), col("theta_a"),
          kmvEst(col("n_a"), col("theta_a")).as("est_a"),
          col("n_b"), col("theta_b"),
          kmvEst(col("n_b"), col("theta_b")).as("est_b"),
          col("n_union"), col("theta_u"),
          kmvEst(col("n_union"), col("theta_u")).as("est_union"),
          col("n_common"),
          when(col("n_union") < K, col("n_common")).otherwise(
            floor(col("n_common").cast(DoubleType) * lit(Pow60) /
              col("theta_u").cast(DoubleType)).cast(LongType))
            .as("est_intersect"))
    },

    // ---- integer PageRank over the order graph ---------------------
    // the production entry ROUTES through the rank-arm advisor
    // (round-13 verdict item 4): the arm is picked from the modeled
    // node-count estimate at the measured crossover — broadcast at
    // the sf0.1 harness scale, msg from the 10x tier up (ScaleBench
    // `rank_advisor` asserts the flip). Both arms are bit-equal, so
    // the oracle is arm-independent; the fixed arms stay addressable
    // for the rank_arms slope measurement via pagerankQ directly.
    "x9_pagerank" -> { (s, d) => pagerankQ(s, d, msg = advisedMsg(s, d)) },
    // the advisor's verdict as an oracle-checked row: the modeled
    // node-count estimate (the graph's node universe is bounded by
    // customers + suppliers — two metadata-cheap table counts, the
    // x8_join_advisor size-model idiom), the modeled vector bytes,
    // the measured crossover, and the arm x9_pagerank will run
    "x9_rank_advisor" -> { (s, d) =>
      val nc = customer(s, d).agg(count(lit(1)).as("n_customers"))
      val ns = supplier(s, d).agg(count(lit(1)).as("n_suppliers"))
      nc.crossJoin(broadcast(ns))
        .select(col("n_customers"), col("n_suppliers"),
          (col("n_customers") + col("n_suppliers")).as("n_nodes_est"))
        .withColumn("est_vector_bytes",
          col("n_nodes_est") * graft.ops.Exchange.VectorBytesPerNode)
        .withColumn("crossover_bytes",
          lit(graft.ops.Exchange.RankArmCrossoverBytes))
        .withColumn("arm",
          when(col("est_vector_bytes") >= col("crossover_bytes"),
            "msg").otherwise("broadcast"))
    },
    // message-form arm (round-12 verdict item 4): same integer
    // arithmetic, so the SAME oracle — see pagerankQ for the
    // broadcast-vs-message trade
    "x9_pagerank_msg" -> (pagerankQ(_, _, msg = true)),

    // ---- ANALYZE-style per-column statistics -----------------------
    "x6_col_stats" -> { (s, d) =>
      lineitem(s, d)
        .selectExpr("stack(4, " +
          "'l_quantity', l_quantity, " +
          "'l_extendedprice', l_extendedprice, " +
          "'l_discount', l_discount, " +
          "'l_tax', l_tax) AS (col_name, v)")
        .groupBy(col("col_name"))
        .agg(count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(col("v"))).as("n_nulls"),
          countDistinct(col("v")).as("ndv"),
          min(col("v")).as("min_v"), max(col("v")).as("max_v"))
        .orderBy(col("col_name"))
    },

    // ---- equi-width histogram with data-derived bounds -------------
    "x6_histogram" -> { (s, d) =>
      val li = lineitem(s, d)
      val b = li.agg(min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"))
      li.crossJoin(broadcast(b))
        .select(least(
            floor((col("l_extendedprice") - col("lo")) * lit(HistBins.toDouble)
              / (col("hi") - col("lo"))),
            lit(HistBins.toLong - 1)).as("bucket"),
          col("lo"), col("hi"))
        .groupBy(col("bucket"), col("lo"), col("hi"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("bucket"))
    })

  /** polyHash60 in DuckDB: 15-hex-digit md5 prefix as BIGINT (the
    * same strpos digit fold every poly oracle uses). */
  private def hx(e: String): String =
    s"""CAST(list_sum(list_transform(generate_series(1, 15),
       p -> (CAST(strpos('0123456789abcdef', substring(md5($e), p, 1))
         AS BIGINT) - 1) << (4 * (15 - p)))) AS BIGINT)"""

  private def estSql(n: String, theta: String): String =
    s"""CAST(CASE WHEN $n < $K THEN $n
        ELSE CAST(floor(${(K - 1).toDouble} * $Pow60 /
          CAST($theta AS DOUBLE)) AS BIGINT) END AS BIGINT)"""

  /** One PageRank step (contribution sum + teleport re-add), unrolled
    * per iteration — recursive CTEs cannot aggregate in the recursive
    * term, and the unrolled form is exactly what the Spark loop
    * builds. */
  /** Weighted integer PageRank, two exchange strategies for the
    * rank-vector × edges join:
    *
    *  - `msg = false` (broadcast arm): the rank vector is node-sized
    *    (thousands of rows where edges are millions) — broadcast it
    *    so each round is a map-side join over the cached edges plus
    *    ONE shuffle (the per-dst contribution sum). Wins while the
    *    vector fits comfortably in executor memory.
    *  - `msg = true` (message arm): at billions of nodes the vector
    *    no longer broadcasts — the kcorePeelMsg posture instead:
    *    edges are pre-partitioned on `src` ONCE (checkpoint preserves
    *    the partitioning), and each round shuffles only the
    *    node-bounded rank vector to the edge partitions
    *    (shuffle-hash join, rank as build side); the edge relation
    *    never moves again. ScaleBench's `rank_arms` block measures
    *    both slopes and the crossover.
    *
    * Both arms run the identical scaled-integer arithmetic, so their
    * results are bit-equal and share one oracle.
    *
    * Lineage truncation (ops/Iter): the edge relation is scanned
    * once, and each round's tiny rank vector is cut from the plan so
    * iteration i+1 references iteration i's RESULT, not its whole
    * history (an un-truncated loop re-derives the lineitem⋈orders
    * join per round and the rank lineage doubles per iteration —
    * measured 10.5 s vs ~1 s at sf0.1). At 100 TB the same loop runs
    * with reliable checkpointing (the Connect posture). */
  /** The routing decision x9_pagerank runs through (verdict item 4):
    * node universe ≤ |customer| + |supplier| — two metadata-cheap
    * parquet counts (no column reads), a planning action like the
    * min/max head() in Sinks — fed to the measured-crossover model
    * in [[graft.ops.Exchange.adviseMsg]]. Memoized per data dir so
    * plan-only constructions (explain, double-timed bench harnesses)
    * pay the two count jobs once, not per DataFrame build. */
  private val nodeEstCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def advisedMsg(s: SparkSession, d: String): Boolean =
    graft.ops.Exchange.adviseMsg(
      nodeEstCache.computeIfAbsent(d,
        _ => customer(s, d).count() + supplier(s, d).count()))

  /** The customer↔supplier order graph: symmetrized weighted edge
    * list carrying per-source out-weight — shared by both pagerank
    * arms and Parity77's personalized variant. */
  private[graft] def orderGraphE2(s: SparkSession, d: String): DataFrame = {
    val eo = lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
    val und = eo.union(eo.select(col("dst").as("src"), col("src").as("dst")))
    val edges = und.groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("w"))
    val outw = edges.groupBy(col("src")).agg(sum(col("w")).as("wout"))
    edges.join(outw, Seq("src"))
  }

  private[graft] def pagerankQ(s: SparkSession, d: String,
      msg: Boolean): DataFrame = {
    val e2 = orderGraphE2(s, d)
    val edges = e2
    // message arm: pre-partition the edges on the join key and CACHE
    // them — an InMemoryRelation keeps its child's hashpartitioning
    // statically, so every round's shuffle-hash join reuses it and
    // only the vector shuffles (a checkpoint here would NOT work: the
    // AQE-wrapped plan checkpoints with UnknownPartitioning and the
    // edges would reshuffle per round — PlanShapeSpec pins the
    // one-shuffle shape). Unpersisted after the loop: the rounds run
    // eagerly (truncate), so the returned frame no longer needs it.
    val e2t =
      if (msg) {
        val r = e2.repartition(col("src")).persist()
        // materialize NOW: until the cached plan executes, AQE reports
        // UnknownPartitioning and round 1 would reshuffle the edges
        r.count()
        r
      } else graft.ops.Iter.truncate(e2, None)
    val base = graft.ops.Iter.truncate(
      edges.select(col("src").as("node")).distinct()
        .crossJoin(broadcast(edges.select(col("src")).distinct()
          .agg(count(lit(1)).as("nn")))), None)
    var rank = base.select(col("node"), col("nn"),
      expr(s"$PrT DIV nn").as("r"))
    // try/finally: a throwing round (OOM, task failure) must not leak
    // the cached edge partitions into the long-lived harness JVM
    try {
      for (_ <- 1 to PrIters) {
        val vec = rank.select(col("node").as("csrc"), col("r"))
        val contrib = graft.ops.Exchange
          .vecJoin(vec, e2t, col("csrc") === col("src"), msg)
          .select(col("dst"),
            expr("(((r * 85) DIV 100) * w) DIV wout").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("cin"))
        rank = graft.ops.Iter.truncate(
          base.join(contrib, col("node") === col("dst"), "left")
            .select(col("node"), col("nn"),
              (expr(s"(($PrT DIV nn) * 15) DIV 100") +
                coalesce(col("cin"), lit(0L))).as("r")), None)
      }
    } finally if (msg) e2t.unpersist(blocking = false)
    rank.select(
        when(col("node") % 2 === 0, lit("customer"))
          .otherwise(lit("supplier")).as("kind"),
        expr("node DIV 2").as("entity_key"),
        col("node").as("node_id"),
        col("r").as("rank_pico"))
      .orderBy(col("node_id"))
  }

  private val prSteps: String = (1 to PrIters).map { i =>
    s"""s$i AS (SELECT e2.dst AS node,
         CAST(sum((((r.r * 85) // 100) * e2.w) // e2.wout) AS BIGINT) AS cin
       FROM r${i - 1} r JOIN e2 ON r.node = e2.src GROUP BY e2.dst),
     r$i AS (SELECT n.node, tp.tp + coalesce(s$i.cin, 0) AS r
       FROM nodes n CROSS JOIN tp LEFT JOIN s$i ON s$i.node = n.node)"""
  }.mkString(",\n     ")

  /** One SQL replay for BOTH pagerank arms (bit-equal results). */
  private val pagerankSql: String =
    s"""WITH eo AS (SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         und AS (SELECT src, dst FROM eo
           UNION ALL SELECT dst, src FROM eo),
         e AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w
           FROM und GROUP BY src, dst),
         ow AS (SELECT src, CAST(sum(w) AS BIGINT) AS wout
           FROM e GROUP BY src),
         e2 AS (SELECT e.src, e.dst, e.w, ow.wout
           FROM e JOIN ow USING (src)),
         nodes AS (SELECT DISTINCT src AS node FROM e),
         nn AS (SELECT count(*) AS nn FROM nodes),
         tp AS (SELECT (($PrT // nn) * 15) // 100 AS tp FROM nn),
         r0 AS (SELECT node, $PrT // nn AS r FROM nodes CROSS JOIN nn),
         $prSteps
         SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
             AS kind,
           node // 2 AS entity_key, node AS node_id,
           CAST(r AS BIGINT) AS rank_pico
         FROM r$PrIters ORDER BY node_id"""

  val oracles: Map[String, String] = Map(
    "x9_rank_advisor" ->
      s"""WITH nc AS (SELECT CAST(count(*) AS BIGINT) AS n_customers
              FROM customer),
            ns AS (SELECT CAST(count(*) AS BIGINT) AS n_suppliers
              FROM supplier)
          SELECT n_customers, n_suppliers,
            n_customers + n_suppliers AS n_nodes_est,
            (n_customers + n_suppliers) *
              ${graft.ops.Exchange.VectorBytesPerNode} AS est_vector_bytes,
            CAST(${graft.ops.Exchange.RankArmCrossoverBytes} AS BIGINT)
              AS crossover_bytes,
            CASE WHEN (n_customers + n_suppliers) *
                ${graft.ops.Exchange.VectorBytesPerNode} >=
                ${graft.ops.Exchange.RankArmCrossoverBytes}
              THEN 'msg' ELSE 'broadcast' END AS arm
          FROM nc CROSS JOIN ns""",
    "x4_lm_score" ->
      """WITH tk AS (SELECT doc_id,
             string_split_regex(trim(lower(text)), '\s+') AS t FROM documents),
         f AS (SELECT doc_id, t FROM tk WHERE len(t) >= 2),
         bi AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
           FROM f, unnest(range(1, len(t))) AS u(i)),
         c2 AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY w1, w2),
         c1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1
           FROM c2 GROUP BY w1),
         lm AS (SELECT w1, w2, CAST((1000000 * c2) // c1 AS BIGINT)
             AS p_micro
           FROM c2 JOIN c1 USING (w1))
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(p_micro) AS BIGINT) AS lm_sum,
           CAST(sum(p_micro) // count(*) AS BIGINT) AS lm_avg_micro
         FROM bi JOIN lm USING (w1, w2)
         GROUP BY doc_id ORDER BY doc_id""",
    "x6_kmv_theta" ->
      s"""WITH tk AS (SELECT source,
             string_split_regex(trim(lower(text)), '\\s+') AS t
           FROM documents WHERE source IN ('$SrcA', '$SrcB')),
         g AS (SELECT DISTINCT source,
             ${hx("array_to_string(t[i:i+2], ' ')")} AS h
           FROM tk, unnest(generate_series(1, greatest(len(t) - 2, 0)))
             AS u(i)),
         ska AS (SELECT h FROM g WHERE source = '$SrcA'
           ORDER BY h LIMIT $K),
         skb AS (SELECT h FROM g WHERE source = '$SrcB'
           ORDER BY h LIMIT $K),
         na AS (SELECT CAST(count(*) AS BIGINT) AS n_a,
             max(h) AS theta_a FROM ska),
         nb AS (SELECT CAST(count(*) AS BIGINT) AS n_b,
             max(h) AS theta_b FROM skb),
         un AS (SELECT DISTINCT h FROM
             (SELECT h FROM ska UNION ALL SELECT h FROM skb)
           ORDER BY h LIMIT $K),
         nu AS (SELECT CAST(count(*) AS BIGINT) AS n_union,
             max(h) AS theta_u FROM un),
         cm AS (SELECT CAST(count(*) AS BIGINT) AS n_common FROM un
           WHERE h IN (SELECT h FROM ska) AND h IN (SELECT h FROM skb))
         SELECT CAST($K AS BIGINT) AS k, n_a, theta_a,
           ${estSql("n_a", "theta_a")} AS est_a,
           n_b, theta_b, ${estSql("n_b", "theta_b")} AS est_b,
           n_union, theta_u, ${estSql("n_union", "theta_u")} AS est_union,
           n_common,
           CAST(CASE WHEN n_union < $K THEN n_common
             ELSE CAST(floor(CAST(n_common AS DOUBLE) * $Pow60 /
               CAST(theta_u AS DOUBLE)) AS BIGINT) END AS BIGINT)
             AS est_intersect
         FROM na CROSS JOIN nb CROSS JOIN nu CROSS JOIN cm""",
    "x9_pagerank" -> pagerankSql,
    // the message arm computes the identical scaled-integer ranks
    "x9_pagerank_msg" -> pagerankSql,
    "x6_col_stats" ->
      """WITH u AS (
           SELECT 'l_quantity' AS col_name, l_quantity AS v FROM lineitem
           UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
           UNION ALL SELECT 'l_discount', l_discount FROM lineitem
           UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
         SELECT col_name, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count(v) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT v) AS BIGINT) AS ndv,
           min(v) AS min_v, max(v) AS max_v
         FROM u GROUP BY col_name ORDER BY col_name""",
    "x6_histogram" ->
      s"""WITH b AS (SELECT min(l_extendedprice) AS lo,
             max(l_extendedprice) AS hi FROM lineitem)
         SELECT CAST(least(CAST(floor((l_extendedprice - lo) *
               ${HistBins.toDouble} / (hi - lo)) AS BIGINT),
             ${HistBins - 1}) AS BIGINT) AS bucket,
           lo, hi, CAST(count(*) AS BIGINT) AS cnt
         FROM lineitem, b GROUP BY 1, 2, 3 ORDER BY bucket""")
}
