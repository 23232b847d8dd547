package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Round-10 batch 9: graph analytics, distribution tests, storage
  * pruning, and event-pattern operators — all FULL-equality DuckDB
  * oracles.
  *
  *  - `x9_triangles`: exact triangle counting over the co-purchase
  *    graph (parts sharing an order), via DEGREE-ORDERED edge
  *    orientation — the standard distributed algorithm (orient each
  *    edge from its lower-(degree,id) endpoint, enumerate wedges at
  *    the source, close them against the undirected edge set). The
  *    orientation bounds per-node out-degree by O(sqrt(m)), so the
  *    wedge join never explodes on hubs — THE reason this scales
  *    where naive wedge counting on raw adjacency does not.
  *  - `x9_degree_dist`: degree histogram of the same graph (graph
  *    shape diagnostics; one extra keyed aggregate).
  *  - `x6_ks_test`: exact two-sample Kolmogorov–Smirnov D between
  *    the click and view cohorts of `events.value` — per-value
  *    cohort counts, one cumulative window over DISTINCT values,
  *    max |F1-F2|.
  *  - `x6_chi2`: chi-square test of independence for the
  *    o_orderpriority × o_orderstatus contingency table (categorical
  *    drift detection — the discrete sibling of x6_source_drift).
  *  - `x8_zonemap_prune`: zone-map file skipping — per-file min/max
  *    l_shipdate + row counts, and which files a date-range
  *    predicate actually reads. This is the planning half of
  *    data-skipping indexes (parquet row-group stats, Delta file
  *    stats): at 100 TB the scan cost is decided here, not in the
  *    executor.
  *  - `x5_seq_pattern`: MATCH_RECOGNIZE-lite — per-user event-type
  *    sequence (ordered by event time) matched against a regex
  *    ("signup, then purchase, with no error in between"). Funnels
  *    (x5_funnel) count stage reachability; this detects arbitrary
  *    ordered patterns.
  *  - `x1_time_travel`: point-in-time state reconstruction from an
  *    event changelog — latest per-key row AS OF a cutoff, with
  *    'error' events acting as deletes. The dataset-versioning
  *    primitive (what a lakehouse VERSION AS OF computes) expressed
  *    as one keyed window over the time-filtered log.
  *
  * Scale posture: triangles = two keyed shuffles (pair-build on
  * orderkey, wedge-build on source node) with the degree table
  * broadcast; wedge volume is sum(outdeg²) ≤ O(m·sqrt(m)) by the
  * orientation bound. KS's window runs over distinct VALUES (already
  * aggregated — at 100 TB quantize values to fixed-width bins first;
  * D error ≤ bin width, machinery unchanged). Chi-square is one
  * contingency aggregate + broadcast margins. Zone maps are one
  * aggregate over the clustering key. Sequence matching is one
  * groupBy-user with an in-group sort (sessions are human-scale;
  * a pathological key would hit the same cap as collect_sorted).
  * Time travel is one keyed window over the pruned (ts<=T) scan —
  * the cutoff predicate pushes to the parquet scan.
  */
object Parity22 {
  type Q = (SparkSession, String) => DataFrame

  /** Co-purchase edge list: distinct (u,v), u<v, parts sharing an
    * order. Built as ONE keyed shuffle (groupBy order, collect the
    * part set) with map-side in-array pair expansion — a self-join
    * formulation shuffles the fact table twice and sort-merges it
    * against itself for the same output (measured 2× slower).
    * Order baskets are human-scale (≤ tens of items), so the C(k,2)
    * expansion is bounded per group. Lineage-truncated so the three
    * consumers (degree table, orientation, closure) reuse the
    * materialized edges. */
  private def coPurchaseEdges(s: SparkSession, d: String): DataFrame = {
    val baskets = lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_set(col("l_partkey"))).as("ps"))
    graft.ops.Iter.truncate(
      baskets.select(explode(expr(
          """flatten(transform(ps, (x, i) ->
               transform(slice(ps, i + 2, size(ps)), y ->
                 struct(x AS u, y AS v))))""")).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .distinct(), None)
  }

  private def degrees(pairs: DataFrame): DataFrame =
    pairs.select(col("u").as("node"))
      .unionAll(pairs.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("dg"))

  val queries: Map[String, Q] = Map(
    // ---- graph: triangle counting ---------------------------------
    "x9_triangles" -> { (s, d) =>
      val pairs = coPurchaseEdges(s, d)
      val deg = degrees(pairs)
      // orient each edge away from its lower-(degree, id) endpoint;
      // u<v already, so the tie (du == dv) keeps u -> v
      val ori = pairs
        .join(broadcast(deg.select(col("node").as("un"), col("dg").as("du"))),
          col("u") === col("un"))
        .join(broadcast(deg.select(col("node").as("vn"), col("dg").as("dv"))),
          col("v") === col("vn"))
        .select(
          when(col("du") <= col("dv"), col("u")).otherwise(col("v")).as("s"),
          when(col("du") <= col("dv"), col("v")).otherwise(col("u")).as("t"))
      // adjacency-intersection counting: per-edge (s,t), triangles
      // closing it = |N+(s) ∩ N+(t)| over ORIENTED out-neighbor
      // sets. Equivalent to wedge-enumerate + closure-join (the
      // DuckDB oracle replays that formulation), but the O(m·sqrt(m))
      // wedge stream is never materialized or shuffled: the oriented
      // adjacency table is node-count-sized (broadcastable — each
      // list ≤ O(sqrt(m)) by the orientation bound), and each edge
      // does one in-memory sorted-list intersection map-side. At
      // 100 TB the adjacency table outgrows a broadcast; the same
      // plan becomes two shuffled joins on s and t — still edges,
      // never wedges, on the wire.
      val adj = ori.groupBy(col("s"))
        .agg(array_sort(collect_list(col("t"))).as("nbrs"))
      val tri = ori
        .join(broadcast(adj.select(col("s").as("an1"), col("nbrs").as("n1"))),
          col("s") === col("an1"))
        .join(broadcast(adj.select(col("s").as("an2"), col("nbrs").as("n2"))),
          col("t") === col("an2"), "left")
        .select(graft.functions.IntersectCountSorted.intersect_count_sorted(
          col("n1"), coalesce(col("n2"), array().cast("array<bigint>")))
          .as("c"))
        .agg(sum(col("c")).as("n_triangles"))
      pairs.agg(count(lit(1)).as("n_edges")).crossJoin(
        deg.agg(count(lit(1)).as("n_nodes"))).crossJoin(tri)
    },
    // ---- graph: degree histogram ----------------------------------
    "x9_degree_dist" -> { (s, d) =>
      degrees(coPurchaseEdges(s, d))
        .groupBy(col("dg")).agg(count(lit(1)).as("n_nodes"))
        .select(col("dg"), col("n_nodes"))
    },
    // ---- stats: two-sample KS -------------------------------------
    "x6_ks_test" -> { (s, d) =>
      val pts = events(s, d)
        .filter(col("event_type").isin("click", "view"))
        .select(col("value").as("v"),
          when(col("event_type") === "click", 1L).otherwise(0L).as("isa"),
          when(col("event_type") === "view", 1L).otherwise(0L).as("isb"))
      val c = pts.groupBy(col("v"))
        .agg(sum(col("isa")).as("ca"), sum(col("isb")).as("cb"))
      val w = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = c.select(col("v"),
        sum(col("ca")).over(w).as("cna"),
        sum(col("cb")).over(w).as("cnb"))
      val tot = pts.agg(sum(col("isa")).as("na"), sum(col("isb")).as("nb"))
      cum.crossJoin(broadcast(tot))
        .agg(round(max(abs(
          col("cna").cast("double") / col("na").cast("double") -
            col("cnb").cast("double") / col("nb").cast("double"))), 12)
          .as("ks_d"),
          first(col("na")).as("na"), first(col("nb")).as("nb"))
    },
    // ---- stats: chi-square independence ---------------------------
    "x6_chi2" -> { (s, d) =>
      val obs = orders(s, d)
        .groupBy(col("o_orderpriority").as("p"), col("o_orderstatus").as("st"))
        .agg(count(lit(1)).cast("double").as("o"))
      val rt = obs.groupBy(col("p")).agg(sum(col("o")).as("rp"))
      val ct = obs.groupBy(col("st")).agg(sum(col("o")).as("cs"))
      val n = obs.agg(sum(col("o")).as("nn"))
      val dof = rt.agg(count(lit(1)).as("nr")).crossJoin(
        ct.agg(count(lit(1)).as("nc")))
        .select(((col("nr") - 1) * (col("nc") - 1)).as("dof"))
      obs.join(broadcast(rt), "p").join(broadcast(ct), "st")
        .crossJoin(broadcast(n))
        .select((col("rp") * col("cs") / col("nn")).as("e"), col("o"))
        .agg(round(sum((col("o") - col("e")) * (col("o") - col("e")) / col("e")), 10)
          .as("chi2"))
        .crossJoin(broadcast(dof))
    },
    // ---- storage: zone-map pruning --------------------------------
    "x8_zonemap_prune" -> { (s, d) =>
      val lo = lit("1996-01-01").cast("timestamp")
      val hi = lit("1996-12-31").cast("timestamp")
      lineitem(s, d)
        .select(expr("l_orderkey DIV 1024").as("file_id"), col("l_shipdate"))
        .groupBy(col("file_id"))
        .agg(min(col("l_shipdate")).as("mn"), max(col("l_shipdate")).as("mx"),
          count(lit(1)).as("n_rows"))
        .select(col("file_id"), col("mn"), col("mx"), col("n_rows"),
          when(col("mn") <= hi && col("mx") >= lo, 1).otherwise(0)
            .cast(IntegerType).as("kept"))
    },
    // ---- events: sequence-pattern detection -----------------------
    "x5_seq_pattern" -> { (s, d) =>
      val ev = eventsNs(s, d).select(col("user_id"), col("ts"),
        col("event_id"), substring(col("event_type"), 1, 1).as("ini"))
      ev.groupBy(col("user_id"))
        .agg(array_join(
          transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"),
              col("ini")))),
            x => x.getField("ini")), "").as("seq"))
        .select(col("user_id"),
          length(col("seq")).cast(IntegerType).as("seq_len"),
          col("seq").rlike("s[^e]*p").cast(IntegerType).as("matched"))
    },
    // ---- changelog: point-in-time reconstruction ------------------
    "x1_time_travel" -> { (s, d) =>
      // 2024-01-15T00:00:00Z as epoch nanos
      val cutoff = 1705276800000000000L
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      eventsNs(s, d)
        .filter(col("ts") <= cutoff)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("event_type") =!= "error")
        .select(col("user_id"), col("event_type").as("last_type"),
          col("value").as("last_value"), col("ts"))
    }
  )

  val oracles: Map[String, String] = Map(
    "x9_triangles" ->
      """WITH pairs AS (
           SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
           FROM lineitem a JOIN lineitem b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         deg AS (
           SELECT node, count(*) AS dg FROM (
             SELECT u AS node FROM pairs
             UNION ALL SELECT v AS node FROM pairs) GROUP BY node),
         ori AS (
           SELECT CASE WHEN du.dg <= dv.dg THEN e.u ELSE e.v END AS s,
                  CASE WHEN du.dg <= dv.dg THEN e.v ELSE e.u END AS t
           FROM pairs e
           JOIN deg du ON du.node = e.u
           JOIN deg dv ON dv.node = e.v),
         tri AS (
           SELECT count(*) AS n_triangles
           FROM ori e1
           JOIN ori e2 ON e1.s = e2.s AND e1.t < e2.t
           JOIN pairs p ON p.u = e1.t AND p.v = e2.t)
         SELECT (SELECT count(*) FROM pairs) AS n_edges,
                (SELECT count(*) FROM deg) AS n_nodes,
                n_triangles
         FROM tri""",
    "x9_degree_dist" ->
      """WITH pairs AS (
           SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
           FROM lineitem a JOIN lineitem b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         deg AS (
           SELECT node, count(*) AS dg FROM (
             SELECT u AS node FROM pairs
             UNION ALL SELECT v AS node FROM pairs) GROUP BY node)
         SELECT dg, count(*) AS n_nodes FROM deg GROUP BY dg""",
    "x6_ks_test" ->
      """WITH pts AS (
           SELECT value AS v,
                  CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS isa,
                  CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS isb
           FROM events WHERE event_type IN ('click', 'view')),
         c AS (SELECT v, sum(isa) AS ca, sum(isb) AS cb FROM pts GROUP BY v),
         cum AS (
           SELECT v,
                  sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                    AND CURRENT ROW) AS cna,
                  sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                    AND CURRENT ROW) AS cnb
           FROM c),
         tot AS (SELECT CAST(sum(isa) AS BIGINT) AS na,
                        CAST(sum(isb) AS BIGINT) AS nb FROM pts)
         SELECT round(max(abs(CAST(cna AS DOUBLE) / CAST(na AS DOUBLE)
                  - CAST(cnb AS DOUBLE) / CAST(nb AS DOUBLE))), 12) AS ks_d,
                any_value(na) AS na, any_value(nb) AS nb
         FROM cum, tot""",
    "x6_chi2" ->
      """WITH obs AS (
           SELECT o_orderpriority AS p, o_orderstatus AS st,
                  CAST(count(*) AS DOUBLE) AS o
           FROM orders GROUP BY 1, 2),
         rt AS (SELECT p, sum(o) AS rp FROM obs GROUP BY p),
         ct AS (SELECT st, sum(o) AS cs FROM obs GROUP BY st),
         n AS (SELECT sum(o) AS nn FROM obs)
         SELECT round(sum((o - rp * cs / nn) * (o - rp * cs / nn)
                  / (rp * cs / nn)), 10) AS chi2,
                ((SELECT count(*) FROM rt) - 1)
                  * ((SELECT count(*) FROM ct) - 1) AS dof
         FROM obs JOIN rt USING (p) JOIN ct USING (st), n""",
    "x8_zonemap_prune" ->
      """SELECT l_orderkey // 1024 AS file_id,
                min(l_shipdate) AS mn, max(l_shipdate) AS mx,
                count(*) AS n_rows,
                CAST(CASE WHEN min(l_shipdate) <= TIMESTAMP '1996-12-31'
                       AND max(l_shipdate) >= TIMESTAMP '1996-01-01'
                     THEN 1 ELSE 0 END AS INTEGER) AS kept
         FROM lineitem GROUP BY 1""",
    "x5_seq_pattern" ->
      """SELECT user_id,
                CAST(length(seq) AS INTEGER) AS seq_len,
                CAST(CASE WHEN regexp_matches(seq, 's[^e]*p')
                     THEN 1 ELSE 0 END AS INTEGER) AS matched
         FROM (
           SELECT user_id,
                  string_agg(substring(event_type, 1, 1), ''
                    ORDER BY ts, event_id) AS seq
           FROM events GROUP BY user_id)""",
    "x1_time_travel" ->
      """WITH log AS (
           SELECT user_id, event_type, value,
                  epoch_us(ts) * 1000 AS ts, event_id
           FROM events
           WHERE epoch_us(ts) * 1000 <= 1705276800000000000),
         r AS (
           SELECT user_id, event_type, value, ts,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY ts DESC, event_id DESC) AS rn
           FROM log)
         SELECT user_id, event_type AS last_type, value AS last_value, ts
         FROM r WHERE rn = 1 AND event_type <> 'error'"""
  )
}
