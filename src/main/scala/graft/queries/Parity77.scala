package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 batch 10: k-truss decomposition — the EDGE-peeling
  * companion of `x9_kcore`'s node peeling (reference: the co-purchase
  * graph the warehouse's basket queries induce; truss cores are the
  * standard community-density primitive one level stronger than
  * k-core). An edge survives the k-truss iff it closes ≥ k-2
  * triangles among surviving edges; peeling repeats until fixpoint.
  *
  *  - `x9_ktruss`: 3 synchronous peel rounds at k = 5 (support ≥ 3)
  *    over the co-purchase graph, then one final support measurement
  *    on the surviving subgraph — emitted per edge. Fixed round
  *    count keeps the DuckDB oracle replayable as unrolled CTEs
  *    (the x9_kcore/x4_bpe_train convention); Parity77Spec pins
  *    convergence semantics on planted graphs (a 5-clique is a
  *    5-truss and survives unchanged; a chordless cycle dies in one
  *    round; a clique with a pendant triangle sheds exactly the
  *    pendant).
  *
  * Scale posture: support is computed by degree-ORIENTED adjacency
  * intersection (the x9_triangles plan): the oriented out-lists are
  * bounded O(√m) by the orientation, the per-edge intersection
  * explodes to the TRIANGLE stream (size 3T), never the wedge stream
  * (size Σ deg² — the thing that kills naive truss at 100×). Each
  * round is edges-sized shuffles + one node-count-sized broadcast
  * adjacency (beyond broadcast the same plan becomes two shuffled
  * joins on s and t — still edges on the wire, never wedges);
  * lineage is truncated per round. SCALE.md's ktruss_tiers block
  * measures the per-round law.
  */
object Parity77 {
  type Q = (SparkSession, String) => DataFrame

  private val TrussK = 5
  private val TrussRounds = 3

  private def degrees(e: DataFrame): DataFrame =
    e.select(col("u").as("node")).unionAll(e.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("dg"))

  /** Per-edge triangle support within `e` (distinct u<v edges):
    * orient away from the lower-(degree, id) endpoint, intersect
    * oriented out-neighbor lists per oriented edge, explode the
    * intersection to the triangle stream (apex s; s→t, s→w, t→w all
    * oriented), then credit all THREE undirected edges of each
    * triangle. Edges closing no triangle are absent (join back with
    * coalesce 0). */
  private[graft] def edgeSupport(e: DataFrame): DataFrame = {
    val deg = degrees(e)
    val ori = e
      .join(broadcast(deg.select(col("node").as("un"), col("dg").as("du"))),
        col("u") === col("un"))
      .join(broadcast(deg.select(col("node").as("vn"), col("dg").as("dv"))),
        col("v") === col("vn"))
      .select(
        when(col("du") <= col("dv"), col("u")).otherwise(col("v")).as("s"),
        when(col("du") <= col("dv"), col("v")).otherwise(col("u")).as("t"))
    val adj = ori.groupBy(col("s")).agg(collect_list(col("t")).as("nbrs"))
    val tris = ori
      .join(broadcast(adj.select(col("s").as("an1"), col("nbrs").as("n1"))),
        col("s") === col("an1"))
      .join(broadcast(adj.select(col("s").as("an2"), col("nbrs").as("n2"))),
        col("t") === col("an2"), "left")
      .select(col("s"), col("t"),
        explode(array_intersect(col("n1"),
          coalesce(col("n2"), array().cast("array<bigint>")))).as("w"))
    def edgeOf(a: Column, b: Column) =
      Seq(least(a, b).as("u"), greatest(a, b).as("v"))
    tris.select(edgeOf(col("s"), col("t")): _*)
      .unionAll(tris.select(edgeOf(col("s"), col("w")): _*))
      .unionAll(tris.select(edgeOf(col("t"), col("w")): _*))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("sup"))
  }

  /** `rounds` synchronous peel rounds (keep edges with support
    * ≥ k-2), then the final per-edge support of the surviving
    * subgraph. Exposed for the spec's planted-graph pins. */
  private[graft] def ktruss(e0: DataFrame, k: Int,
      rounds: Int): DataFrame = {
    var e = graft.ops.Iter.truncate(e0, None)
    for (_ <- 1 to rounds) {
      // inner join: a no-triangle edge has no support row, and
      // 0 < k-2 drops it — identical to coalesce-0-filter
      e = graft.ops.Iter.truncate(
        e.join(edgeSupport(e).filter(col("sup") >= k - 2),
          Seq("u", "v")).select(col("u"), col("v")), None)
    }
    e.join(edgeSupport(e), Seq("u", "v"), "left")
      .select(col("u"), col("v"),
        coalesce(col("sup"), lit(0L)).as("sup"))
  }

  private val PrT = 1000000000000L // total mass, pico units
  private val PprIters = 5

  /** Personalized PageRank over the customer↔supplier order graph
    * (the recsys/similar-entity primitive): identical fixed-point
    * integer arithmetic to `x9_pagerank`, but the 15% teleport mass
    * returns to a SEED SET (customers with custkey % 100 == 0)
    * instead of spreading uniformly — rank becomes proximity to the
    * seeds, zero for nodes the seeds cannot reach. Broadcast arm
    * only: the vector is node-bounded exactly like pagerank's, and
    * the msg-arm trade (plus the advisor that picks it) is already
    * shipped on the uniform variant — personalization changes the
    * restart vector, not the exchange. */
  private def pprQ(s: SparkSession, d: String): DataFrame = {
    val e2 = graft.ops.Iter.truncate(Parity19.orderGraphE2(s, d), None)
    val isSeed = (col("node") % 2 === 0) &&
      (expr("node DIV 2") % 100 === 0)
    ppr(e2, isSeed)
      .select(
        when(col("node") % 2 === 0, lit("customer"))
          .otherwise(lit("supplier")).as("kind"),
        expr("node DIV 2").as("entity_key"),
        col("node").as("node_id"), col("seed"),
        col("r").as("rank_pico"))
      .orderBy(col("node_id"))
  }

  /** The seeded fixed-point core over any (src, dst, w, wout) edge
    * relation; exposed for the spec's planted-graph pins. Returns
    * (node, seed, ns, r). */
  private[graft] def ppr(e2: DataFrame, isSeed: Column): DataFrame = {
    val nodes = e2.select(col("src").as("node")).distinct()
    val base = graft.ops.Iter.truncate(
      nodes.withColumn("seed", isSeed.cast("int"))
        .crossJoin(broadcast(nodes.filter(isSeed)
          .agg(count(lit(1)).as("ns")))), None)
    // all mass starts AT the seeds; non-seeds rank 0
    var rank = base.select(col("node"), col("seed"), col("ns"),
      expr(s"CASE WHEN seed = 1 THEN $PrT DIV ns ELSE 0 END").as("r"))
    for (_ <- 1 to PprIters) {
      val vec = rank.filter(col("r") > 0)
        .select(col("node").as("csrc"), col("r"))
      val contrib = graft.ops.Exchange
        .vecJoin(vec, e2, col("csrc") === col("src"), msg = false)
        .select(col("dst"),
          expr("(((r * 85) DIV 100) * w) DIV wout").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("cin"))
      rank = graft.ops.Iter.truncate(
        base.join(contrib, col("node") === col("dst"), "left")
          .select(col("node"), col("seed"), col("ns"),
            (expr(s"CASE WHEN seed = 1 THEN (($PrT DIV ns) * 15) DIV 100" +
              " ELSE 0 END") +
              coalesce(col("cin"), lit(0L))).as("r")), None)
    }
    rank
  }

  private val MisRounds = 4

  /** Deterministic per-round Luby priority: md5("round:node") with
    * the zero-padded node id on the tail, so priorities are distinct
    * and a strict max is well-defined (the x9_random_walk hash-min
    * convention, flipped to max). */
  private def misPr(r: Int, node: Column): Column =
    concat(md5(concat_ws(":", lit(r.toString), node.cast("string"))),
      lpad(node.cast("string"), 12, "0"))

  /** Luby's maximal-independent-set rounds over a distinct (u<v)
    * edge list: each round, every undecided node whose priority
    * beats ALL its undecided neighbors' joins the MIS (two adjacent
    * nodes can never both win — strict total order), its neighbors
    * leave as `removed`, and the round repeats on the shrunken
    * graph. Fixed round count (the kcore/ktruss unroll convention);
    * returns (node, status ∈ mis|removed|undecided, round; -1 for
    * undecided). Exposed for the spec's planted pins.
    *
    * Two exchange arms (bit-equal results, one oracle — the
    * pagerank/kcore convention):
    *
    *  - `msg = false` (broadcast arm): the undecided/selected/removed
    *    sets ship to every executor per round as broadcast
    *    semi-joins. Early Luby rounds select+remove a constant
    *    FRACTION of all nodes, so unlike pagerank's always-node-sized
    *    vector these sets START node-scale — the arm dies first on
    *    billion-node graphs (the round-14 verdict's one named
    *    scale-killer).
    *  - `msg = true` (message arm, the kcorePeelMsg posture): the
    *    SYMMETRIZED adjacency is partitioned on its source column
    *    once and cached; each round shuffle-hash-joins the undecided
    *    vector into the edge partitions (vector moves, edges never
    *    do). Symmetry does double duty: (node, nb) and (nb, node) are
    *    the same relation, so the ONE cached copy serves both the
    *    priority-max scatter (join on sender, group by receiver) and
    *    the neighbor-removal scatter (join on selected sender,
    *    project receiver) — no dual cache like HITS needs for its
    *    directed edges. Per-round wire volume: the node-bounded
    *    vector + map-side-partial-aggregated maxima; no edge-sized
    *    shuffle anywhere.
    */
  private[graft] def luby(e0: DataFrame, rounds: Int,
      msg: Boolean = false): DataFrame =
    if (msg) lubyMsg(e0, rounds) else lubyBroadcast(e0, rounds)

  private def lubyBroadcast(e0: DataFrame, rounds: Int): DataFrame = {
    val e = graft.ops.Iter.truncate(e0, None)
    var und = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node"))).distinct()
    var decided: DataFrame = null
    for (r <- 0 until rounds) {
      und = graft.ops.Iter.truncate(und, None)
      // adjacency restricted to the still-undecided subgraph; the
      // undecided set is node-count-sized and SHRINKS every round,
      // but its checkpointed scan carries no stats — without the
      // broadcast hint both semi-joins fall to SMJ and re-sort the
      // edge relation per round (the x9_kcore alive-set lesson,
      // SCALE.md kcore_arms)
      val adj = e.join(broadcast(und.select(col("node").as("u"))), Seq("u"))
        .join(broadcast(und.select(col("node").as("v"))), Seq("v"))
      val both = adj.select(col("u").as("node"), col("v").as("nb"))
        .unionAll(adj.select(col("v").as("node"), col("u").as("nb")))
      val nbrMax = both
        .select(col("node"), misPr(r, col("nb")).as("npr"))
        .groupBy(col("node")).agg(max(col("npr")).as("mx"))
      // NOT truncated: sel/rem have multiple consumers (next round's
      // anti-join, the decided union, rem's probe), but they are
      // lazy branches over the checkpointed und/e inputs — measured
      // at sf0.1, re-execution (10.4 s) beats checkpointing the
      // rem-sized sets per round (14.1 s)
      // nbrMax is node-bounded too: broadcast it or the left join
      // sort-merges two node-sized relations per round
      val sel = und.join(broadcast(nbrMax), Seq("node"), "left")
        .filter(col("mx").isNull || misPr(r, col("node")) > col("mx"))
        .select(col("node"))
      val rem = both.join(broadcast(sel.select(col("node").as("nb"))),
          Seq("nb"))
        .select(col("node")).distinct()
      val round = sel.select(col("node"), lit("mis").as("status"),
          lit(r).as("round"))
        .unionAll(rem.select(col("node"), lit("removed").as("status"),
          lit(r).as("round")))
      decided =
        if (decided == null) round else decided.unionAll(round)
      und = und.join(broadcast(sel.unionAll(rem)), Seq("node"),
        "left_anti")
    }
    decided.unionAll(und.select(col("node"),
      lit("undecided").as("status"), lit(-1).as("round")))
  }

  /** The message arm: see [[luby]]. The broadcast arm restricts the
    * adjacency to undecided×undecided BEFORE the max; here the
    * priority scatter restricts only the SENDER side (receivers that
    * are already decided get maxima too, harmlessly — the left join
    * FROM the undecided set discards them), which keeps every
    * per-round join a vector-into-cached-edges shuffle-hash join. */
  private def lubyMsg(e0: DataFrame, rounds: Int): DataFrame = {
    val e = graft.ops.Iter.truncate(e0, None)
    // symmetrized adjacency, partitioned on the sender column ONCE
    // and cached — an InMemoryRelation keeps its child's
    // hashpartitioning statically, so every round's shuffle-hash
    // join reuses it and only the vector shuffles (the pagerankQ
    // msg-arm lesson: a checkpoint here would report
    // UnknownPartitioning under AQE and reshuffle the edges per
    // round)
    val adjP = e.select(col("u").as("node"), col("v").as("nb"))
      .unionAll(e.select(col("v").as("node"), col("u").as("nb")))
      .repartition(col("node")).persist()
    adjP.count() // materialize NOW so the partitioning is visible
    var und = adjP.select(col("node")).distinct()
    var decided: DataFrame = null
    try {
      for (r <- 0 until rounds) {
        und = graft.ops.Iter.truncate(und, None)
        // (the per-round sel/rem branches stay lazy over adjP — the
        // broadcast arm's measured re-execution trade — but the WHOLE
        // result is truncated below before the cache is released, so
        // consumers never recompute the edge repartition)
        // every undecided node scatters its round-r priority to ALL
        // its neighbors; receivers take the max. Map-side partial
        // aggregation bounds the exchange at (distinct receivers per
        // partition), not edges.
        val nbrMax = graft.ops.Exchange
          .vecJoinUsing(und, adjP, Seq("node"), msg = true)
          .select(col("nb").as("rcv"), misPr(r, col("node")).as("npr"))
          .groupBy(col("rcv")).agg(max(col("npr")).as("mx"))
          .select(col("rcv").as("node"), col("mx"))
        // node-sized × node-sized joins from here on — plain shuffles,
        // no broadcast of anything node-scale. UNLIKE the broadcast
        // arm, sel/rem are truncated: they have 3/2 consumers each,
        // and re-executing a branch here replays a vector shuffle
        // into the cached adjacency plus an edge-wide aggregate
        // (measured 21 s -> 13 s at sf0.1), where the broadcast arm's
        // re-execution is map-side and measured cheaper than the cut
        val sel = graft.ops.Iter.truncate(
          und.join(nbrMax, Seq("node"), "left")
            .filter(col("mx").isNull || misPr(r, col("node")) > col("mx"))
            .select(col("node")), None)
        // neighbors of the selected set, by the same symmetry (join
        // the cached copy on the SENDER, project the receiver), then
        // restricted to still-undecided
        val rem = graft.ops.Iter.truncate(
          graft.ops.Exchange
            .vecJoinUsing(sel, adjP, Seq("node"), msg = true)
            .select(col("nb").as("node")).distinct()
            .join(und, Seq("node"), "left_semi"), None)
        val round = sel.select(col("node"), lit("mis").as("status"),
            lit(r).as("round"))
          .unionAll(rem.select(col("node"), lit("removed").as("status"),
            lit(r).as("round")))
        decided =
          if (decided == null) round else decided.unionAll(round)
        und = und.join(sel.unionAll(rem), Seq("node"), "left_anti")
      }
      // eagerly cut the node-sized result while the cached adjacency
      // its lazy branches reference is still resident (the randomWalks
      // msg-arm rule) — without this, every consumption re-repartitions
      // the edge relation once per round branch
      graft.ops.Iter.truncate(
        decided.unionAll(und.select(col("node"),
          lit("undecided").as("status"), lit(-1).as("round"))), None)
    } finally adjP.unpersist(blocking = false)
  }

  /** Arm routing for x9_mis, the x9_pagerank convention: node
    * universe ≤ |part| (co-purchase nodes are part keys) — one
    * metadata-cheap parquet count, memoized per data dir — fed to the
    * measured-crossover model in [[graft.ops.Exchange.adviseMsg]].
    * MIS vectors are node-FRACTION-sized in early rounds (und starts
    * at ALL nodes), so the rank-arm crossover is if anything
    * conservative here. */
  private val nodeEstCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def advisedMsg(s: SparkSession, d: String): Boolean =
    graft.ops.Exchange.adviseMsg(
      nodeEstCache.computeIfAbsent(d,
        _ => graft.Tables.part(s, d).count()))

  /** Fixed-arm accessor for ScaleBench's mis_arms block (the
    * pagerankQ convention — the named query routes through the
    * advisor and would silently measure whichever arm it picks). */
  private[graft] def misQ(s: SparkSession, d: String,
      msg: Boolean): DataFrame =
    luby(Parity24.edges(s, d), MisRounds, msg = msg)
      .orderBy(col("node"))

  val queries: Map[String, Q] = Map(
    "x9_ktruss" -> { (s, d) =>
      ktruss(Parity24.edges(s, d), TrussK, TrussRounds)
        .orderBy(col("u"), col("v"))
    },
    "x9_ppr" -> (pprQ(_, _)),
    "x9_mis" -> { (s, d) => misQ(s, d, msg = advisedMsg(s, d)) },
    // forced message arm, same oracle (bit-equal results) — the
    // x9_pagerank_msg convention: the harness proves the 100 TB arm
    // on every run, not just past the crossover
    "x9_mis_msg" -> { (s, d) => misQ(s, d, msg = true) })

  /** Support CTEs for edge set `e$i`: degrees → orientation →
    * apex-enumerated triangles (closure join on the ORIENTED b→c
    * edge, so each triangle appears exactly once) → 3-way edge
    * credit. Mirrors [[edgeSupport]] exactly. */
  private def supSql(i: Int): String =
    s"""d$i AS MATERIALIZED (SELECT node, count(*) AS dg FROM (
           SELECT u AS node FROM e$i UNION ALL SELECT v FROM e$i)
         GROUP BY node),
       o$i AS MATERIALIZED (SELECT
           CASE WHEN du.dg <= dv.dg THEN e.u ELSE e.v END AS s,
           CASE WHEN du.dg <= dv.dg THEN e.v ELSE e.u END AS t
         FROM e$i e
         JOIN d$i du ON du.node = e.u
         JOIN d$i dv ON dv.node = e.v),
       t$i AS MATERIALIZED (SELECT e1.s AS a, e1.t AS b, e2.t AS c
         FROM o$i e1
         JOIN o$i e2 ON e2.s = e1.s AND e2.t <> e1.t
         JOIN o$i e3 ON e3.s = e1.t AND e3.t = e2.t),
       sup$i AS MATERIALIZED (SELECT u, v, count(*) AS sup FROM (
           SELECT least(a, b) AS u, greatest(a, b) AS v FROM t$i
           UNION ALL SELECT least(a, c), greatest(a, c) FROM t$i
           UNION ALL SELECT least(b, c), greatest(b, c) FROM t$i)
         GROUP BY u, v)"""

  private def peelSql(i: Int, keep: Int): String =
    s"""e${i + 1} AS MATERIALIZED (SELECT e.u, e.v FROM e$i e
         JOIN sup$i s ON s.u = e.u AND s.v = e.v
         WHERE s.sup >= $keep)"""

  private val pprSteps: String = (1 to PprIters).map { i =>
    s"""s$i AS (SELECT e2.dst AS node,
         CAST(sum((((r.r * 85) // 100) * e2.w) // e2.wout) AS BIGINT) AS cin
       FROM r${i - 1} r JOIN e2 ON r.node = e2.src GROUP BY e2.dst),
     r$i AS (SELECT n.node, n.seed,
         CASE WHEN n.seed = 1 THEN (($PrT // ns.ns) * 15) // 100
              ELSE 0 END + coalesce(s$i.cin, 0) AS r
       FROM sd n CROSS JOIN ns LEFT JOIN s$i ON s$i.node = n.node)"""
  }.mkString(",\n     ")

  private def misPrSql(i: Int, e: String): String =
    s"""md5(CAST($i AS VARCHAR) || ':' || CAST($e AS VARCHAR))
        || lpad(CAST($e AS VARCHAR), 12, '0')"""

  private def misRoundSql(i: Int): String =
    s"""ad$i AS MATERIALIZED (
         SELECT e.u AS node, e.v AS nb FROM e0 e
           JOIN u$i a ON a.node = e.u JOIN u$i b ON b.node = e.v
         UNION ALL
         SELECT e.v, e.u FROM e0 e
           JOIN u$i a ON a.node = e.u JOIN u$i b ON b.node = e.v),
       m$i AS MATERIALIZED (
         SELECT node, max(${misPrSql(i, "nb")}) AS mx
         FROM ad$i GROUP BY node),
       s$i AS MATERIALIZED (
         SELECT u.node FROM u$i u LEFT JOIN m$i m ON m.node = u.node
         WHERE m.mx IS NULL OR ${misPrSql(i, "u.node")} > m.mx),
       r$i AS MATERIALIZED (
         SELECT DISTINCT a.node FROM ad$i a JOIN s$i s ON s.node = a.nb),
       u${i + 1} AS MATERIALIZED (
         SELECT node FROM u$i
         EXCEPT SELECT node FROM s$i
         EXCEPT SELECT node FROM r$i)"""

  /** One SQL replay for BOTH mis arms (bit-equal results — the
    * pagerank convention). */
  private val misSql: String = {
    val rounds = (0 until MisRounds).map(misRoundSql).mkString(",\n")
    val branches = (0 until MisRounds).map { i =>
      s"""SELECT node, 'mis' AS status, $i AS round FROM s$i
         UNION ALL SELECT node, 'removed', $i FROM r$i"""
    }.mkString("\n UNION ALL ")
    s"""WITH e0 AS MATERIALIZED (
         SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
         FROM lineitem a JOIN lineitem b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
       u0 AS MATERIALIZED (
         SELECT u AS node FROM e0 UNION SELECT v FROM e0),
       $rounds
       SELECT node, status, round FROM (
         $branches
         UNION ALL SELECT node, 'undecided', -1 FROM u$MisRounds)
       ORDER BY node"""
  }

  val oracles: Map[String, String] = Map(
    "x9_mis" -> misSql,
    "x9_mis_msg" -> misSql,
    "x9_ppr" ->
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
         sd AS (SELECT node,
             CASE WHEN node % 2 = 0 AND (node // 2) % 100 = 0
                  THEN 1 ELSE 0 END AS seed
           FROM nodes),
         ns AS (SELECT count(*) AS ns FROM sd WHERE seed = 1),
         r0 AS (SELECT node, seed,
             CASE WHEN seed = 1 THEN $PrT // ns ELSE 0 END AS r
           FROM sd CROSS JOIN ns),
         $pprSteps
         SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
             AS kind,
           node // 2 AS entity_key, node AS node_id, seed,
           CAST(r AS BIGINT) AS rank_pico
         FROM r$PprIters ORDER BY node_id""",
    "x9_ktruss" -> {
      val keep = TrussK - 2
      val rounds = (0 until TrussRounds)
        .map(i => supSql(i) + ",\n" + peelSql(i, keep)).mkString(",\n")
      val f = TrussRounds // final support pass over the survivors
      s"""WITH e0 AS MATERIALIZED (
           SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
           FROM lineitem a JOIN lineitem b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         $rounds,
         ${supSql(f)}
         SELECT e.u, e.v, coalesce(s.sup, 0) AS sup
         FROM e$f e LEFT JOIN sup$f s ON s.u = e.u AND s.v = e.v
         ORDER BY e.u, e.v"""
    })
}
