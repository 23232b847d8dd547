package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Round-10 batch 14: graph shape statistics, rate anomaly
  * detection, and the dataset-card report — all FULL-equality
  * DuckDB oracles.
  *
  *  - `x9_clustering_coeff`: global clustering coefficient
  *    3·triangles / wedges — how cliquish the co-purchase graph is
  *    (wedges counted exactly as Σ C(deg,2); triangles via the same
  *    orientation + sorted-intersect pipeline as x9_triangles).
  *  - `x9_assortativity`: degree assortativity (Pearson r of
  *    endpoint degrees over the symmetrized edge list) — do hubs
  *    link to hubs? The one-pass moment formula over exact integer
  *    sums; only the final division chain is IEEE.
  *  - `x5_burst_detect`: per-type minute-rate burst detection —
  *    minutes whose event count exceeds mean + 3σ of that type's
  *    observed minute counts. The ops-monitoring primitive (spike
  *    alerting) on exact integer statistics.
  *  - `x7_dataset_card`: the per-source dataset card — docs, token
  *    mass, mean document length, language mix — as one union
  *    report (the dq_suite shape): what every corpus release ships.
  *
  * Scale posture: both graph statistics reduce to the edge/degree
  * relations already built for the x9 family (one keyed shuffle +
  * broadcast degree joins; the moment sums are map-side partials).
  * Burst detection is two keyed aggregates (minute counts, then
  * per-type moments joined back broadcast). The dataset card is a
  * handful of per-source aggregates unioned — report-sized output.
  */
object Parity27 {
  type Q = (SparkSession, String) => DataFrame

  private val NsPerMin = 60L * 1000000000L

  val queries: Map[String, Q] = Map(
    // ---- global clustering coefficient ----------------------------
    "x9_clustering_coeff" -> { (s, d) =>
      val pairs = Parity24.edges(s, d)
      val deg = pairs.select(col("u").as("node"))
        .unionAll(pairs.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("dg"))
      val wedges = deg.agg(
        sum(expr("dg * (dg - 1) DIV 2")).cast(LongType).as("n_wedges"))
      val ori = pairs
        .join(broadcast(deg.select(col("node").as("un"), col("dg").as("du"))),
          col("u") === col("un"))
        .join(broadcast(deg.select(col("node").as("vn"), col("dg").as("dv"))),
          col("v") === col("vn"))
        .select(
          when(col("du") <= col("dv"), col("u")).otherwise(col("v")).as("s"),
          when(col("du") <= col("dv"), col("v")).otherwise(col("u")).as("t"))
      val adj = ori.groupBy(col("s"))
        .agg(array_sort(collect_list(col("t"))).as("nbrs"))
      val tri = ori
        .join(broadcast(adj.select(col("s").as("a1"), col("nbrs").as("n1"))),
          col("s") === col("a1"))
        .join(broadcast(adj.select(col("s").as("a2"), col("nbrs").as("n2"))),
          col("t") === col("a2"), "left")
        .select(graft.functions.IntersectCountSorted.intersect_count_sorted(
          col("n1"), coalesce(col("n2"), array().cast("array<bigint>")))
          .as("c"))
        .agg(sum(col("c")).as("n_triangles"))
      tri.crossJoin(wedges)
        .select(col("n_wedges"), col("n_triangles"),
          round(lit(3.0) * col("n_triangles").cast("double") /
            col("n_wedges").cast("double"), 10).as("global_cc"))
    },
    // ---- degree assortativity -------------------------------------
    "x9_assortativity" -> { (s, d) =>
      val pairs = Parity24.edges(s, d)
      val deg = pairs.select(col("u").as("node"))
        .unionAll(pairs.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("dg"))
      // symmetrized directed edge list: each undirected edge twice
      val sym = pairs.select(col("u").as("a"), col("v").as("b"))
        .unionAll(pairs.select(col("v").as("a"), col("u").as("b")))
        .join(broadcast(deg.select(col("node").as("an"), col("dg").as("j"))),
          col("a") === col("an"))
        .join(broadcast(deg.select(col("node").as("bn"), col("dg").as("k"))),
          col("b") === col("bn"))
        .select(col("j"), col("k"))
      sym.agg(
          count(lit(1)).cast("double").as("m"),
          sum(col("j") * col("k")).cast("double").as("sjk"),
          sum(col("j")).cast("double").as("sj"),
          sum(col("j") * col("j")).cast("double").as("sjj"))
        .select(round(
          (col("m") * col("sjk") - col("sj") * col("sj")) /
            (col("m") * col("sjj") - col("sj") * col("sj")), 10)
          .as("assortativity"),
          col("m").cast(LongType).as("n_directed_edges"))
    },
    // ---- burst detection ------------------------------------------
    "x5_burst_detect" -> { (s, d) =>
      val perMin = eventsNs(s, d)
        .select(col("event_type"), expr(s"ts DIV $NsPerMin").as("minute_idx"))
        .groupBy(col("event_type"), col("minute_idx"))
        .agg(count(lit(1)).as("cnt"))
      val stats = perMin.groupBy(col("event_type"))
        .agg(count(lit(1)).cast("double").as("nm"),
          sum(col("cnt")).cast("double").as("sc"),
          sum(col("cnt") * col("cnt")).cast("double").as("scc"))
        .select(col("event_type"), (col("sc") / col("nm")).as("mu"),
          sqrt(col("scc") / col("nm") -
            (col("sc") / col("nm")) * (col("sc") / col("nm"))).as("sigma"))
      perMin.join(broadcast(stats), Seq("event_type"))
        .filter(col("cnt").cast("double") > col("mu") + lit(3.0) * col("sigma"))
        .select(col("event_type"), col("minute_idx"), col("cnt"))
    },
    // ---- dataset card ---------------------------------------------
    "x7_dataset_card" -> { (s, d) =>
      val doc = documents(s, d).select(col("source"), col("lang"),
        size(graft.ops.TextOps.tokens(lower(col("text"))))
          .cast(LongType).as("n_toks"))
      doc.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_toks")).as("n_tokens"),
          round(sum(col("n_toks")).cast("double") /
            count(lit(1)).cast("double"), 8).as("mean_tokens"),
          countDistinct(col("lang")).as("n_langs"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"))
    }
  )

  private val edgesSql =
    """SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
       FROM lineitem a JOIN lineitem b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"""

  val oracles: Map[String, String] = Map(
    "x9_clustering_coeff" ->
      s"""WITH pairs AS MATERIALIZED ($edgesSql),
          deg AS MATERIALIZED (
            SELECT node, count(*) AS dg FROM (
              SELECT u AS node FROM pairs
              UNION ALL SELECT v AS node FROM pairs) GROUP BY node),
          w AS (SELECT CAST(sum(dg * (dg - 1) // 2) AS BIGINT)
                  AS n_wedges FROM deg),
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
          SELECT n_wedges, n_triangles,
                 round(3.0 * CAST(n_triangles AS DOUBLE)
                   / CAST(n_wedges AS DOUBLE), 10) AS global_cc
          FROM tri, w""",
    "x9_assortativity" ->
      s"""WITH pairs AS MATERIALIZED ($edgesSql),
          deg AS MATERIALIZED (
            SELECT node, count(*) AS dg FROM (
              SELECT u AS node FROM pairs
              UNION ALL SELECT v AS node FROM pairs) GROUP BY node),
          sym AS (
            SELECT dj.dg AS j, dk.dg AS k
            FROM (SELECT u AS a, v AS b FROM pairs
                  UNION ALL SELECT v AS a, u AS b FROM pairs) e
            JOIN deg dj ON dj.node = e.a
            JOIN deg dk ON dk.node = e.b),
          m AS (SELECT CAST(count(*) AS DOUBLE) AS m,
                       CAST(sum(j * k) AS DOUBLE) AS sjk,
                       CAST(sum(j) AS DOUBLE) AS sj,
                       CAST(sum(j * j) AS DOUBLE) AS sjj
                FROM sym)
          SELECT round((m * sjk - sj * sj) / (m * sjj - sj * sj), 10)
                   AS assortativity,
                 CAST(m AS BIGINT) AS n_directed_edges
          FROM m""",
    "x5_burst_detect" ->
      s"""WITH pm AS (
            SELECT event_type, epoch_us(ts) * 1000 // $NsPerMin
                     AS minute_idx, count(*) AS cnt
            FROM events GROUP BY 1, 2),
          st AS (
            SELECT event_type,
                   CAST(sum(cnt) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mu,
                   sqrt(CAST(sum(cnt * cnt) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                     - (CAST(sum(cnt) AS DOUBLE) / CAST(count(*) AS DOUBLE))
                       * (CAST(sum(cnt) AS DOUBLE) / CAST(count(*) AS DOUBLE)))
                     AS sigma
            FROM pm GROUP BY event_type)
          SELECT pm.event_type, pm.minute_idx, pm.cnt
          FROM pm JOIN st ON st.event_type = pm.event_type
          WHERE CAST(pm.cnt AS DOUBLE) > st.mu + 3.0 * st.sigma""",
    "x7_dataset_card" ->
      """WITH doc AS (
           SELECT source, lang,
                  CAST(length(string_split_regex(trim(lower(text)), '\s+'))
                    AS BIGINT) AS n_toks
           FROM documents)
         SELECT source, count(*) AS n_docs,
                CAST(sum(n_toks) AS BIGINT) AS n_tokens,
                round(CAST(sum(n_toks) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE), 8) AS mean_tokens,
                CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
                CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_en
         FROM doc GROUP BY source"""
  )
}
