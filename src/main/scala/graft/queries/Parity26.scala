package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Round-10 batch 13: corpus-mixture analytics and graph proximity.
  *
  *  - `x4_source_overlap`: pairwise source-vocabulary Jaccard — the
  *    mixture-similarity matrix ("which sources duplicate each
  *    other's content") that complements x6_kl_drift's
  *    source-vs-corpus divergence. Token-level inverted join, never
  *    a source² × vocab product.
  *  - `x9_bfs_hops`: multi-source BFS hop distance (4 rounds) from
  *    an md5-sampled seed set over the co-purchase graph — the graph
  *    proximity primitive (label propagation reach, contamination
  *    radius, "related items within k hops"). The DuckDB oracle is a
  *    true recursive-CTE BFS with min-distance aggregation;
  *    frontier-anti-join rounds and UNION-dedup recursion provably
  *    agree (first discovery = min distance).
  *  - `x6_psi`: Population Stability Index between the first and
  *    second half of the event stream over fixed value bins — THE
  *    production ML drift score (binned, so exact in SQL; add-one
  *    smoothing keeps empty bins finite).
  *
  * Scale posture: source overlap joins the DISTINCT (source, token)
  * relation on token — a token shared by k sources emits C(k,2)
  * pairs, bounded by source-count², and the distinct relation is
  * vocab-bounded per source; at 100 TB the same join runs over
  * per-source vocabulary sketches (KMV/theta, already in x6) when
  * exact sets stop fitting. BFS is the CC/k-core iterative shape:
  * each round one join frontier×adjacency + one anti-join against
  * the settled set, lineage-truncated; 4 rounds covers any
  * small-diameter (dense) graph, and the round count is the explicit
  * budget knob on path-skewed graphs. PSI aggregates to
  * bins×2 rows before any arithmetic.
  */
object Parity26 {
  type Q = (SparkSession, String) => DataFrame

  private val BfsRounds = 4
  private val NsPerDay = 86400L * 1000000000L
  private val PsiBinWidth = 50.0
  /** Cohort cutoff: 2024-01-16T00:00Z (mid-month of the event data)
    * as epoch nanos — an absolute event-time boundary, like
    * x1_time_travel's. */
  private val PsiCutoffNs = 1705363200000000000L
  private val PsiBins = 10

  val queries: Map[String, Q] = Map(
    // ---- pairwise source vocabulary overlap -----------------------
    "x4_source_overlap" -> { (s, d) =>
      val st = documents(s, d)
        .select(col("source"),
          explode(graft.ops.TextOps.tokens(lower(col("text")))).as("tok"))
        .distinct()
      val sizes = st.groupBy(col("source")).agg(count(lit(1)).as("sz"))
      val inter = st.select(col("source").as("s1"), col("tok"))
        .join(st.select(col("source").as("s2"), col("tok")), Seq("tok"))
        .filter(col("s1") < col("s2"))
        .groupBy(col("s1"), col("s2")).agg(count(lit(1)).as("n_shared"))
      inter
        .join(broadcast(sizes.select(col("source").as("s1"),
          col("sz").as("sz1"))), Seq("s1"))
        .join(broadcast(sizes.select(col("source").as("s2"),
          col("sz").as("sz2"))), Seq("s2"))
        .select(col("s1"), col("s2"), col("n_shared"),
          round(col("n_shared").cast("double") /
            (col("sz1") + col("sz2") - col("n_shared")).cast("double"), 10)
            .as("jaccard"))
    },
    // ---- multi-source BFS hop distance ----------------------------
    "x9_bfs_hops" -> { (s, d) =>
      val pairs = Parity24.edges(s, d)
      val adj = pairs.select(col("u").as("node"), col("v").as("nb"))
        .unionAll(pairs.select(col("v").as("node"), col("u").as("nb")))
      val nodes = adj.select(col("node")).distinct()
      val seeds = nodes.filter(
        substring(md5(col("node").cast("string")), 1, 2) <= "02")
      var dist = graft.ops.Iter.truncate(
        seeds.select(col("node"), lit(0L).as("dist")), None)
      var frontier = dist.select(col("node"))
      var r = 1
      var done = false
      while (r <= BfsRounds && !done) {
        val reached = graft.ops.Iter.truncate(
          frontier.join(adj, Seq("node"))
            .select(col("nb").as("node")).distinct()
            .join(dist, Seq("node"), "left_anti")
            .withColumn("dist", lit(r.toLong)), None)
        // empty frontier = fixpoint; the remaining rounds are no-ops
        // (a dense graph is covered in ~2 hops — skip the dead jobs)
        if (reached.isEmpty) done = true
        else {
          // both sides checkpointed -> the union's lineage stays flat
          dist = dist.unionAll(reached)
          frontier = reached.select(col("node"))
        }
        r += 1
      }
      dist
    },
    // ---- population stability index -------------------------------
    "x6_psi" -> { (s, d) =>
      val binned = eventsNs(s, d).select(
        least(greatest(floor(col("value") / PsiBinWidth), lit(0.0)),
          lit((PsiBins - 1).toDouble)).cast(LongType).as("bin"),
        when(col("ts") < PsiCutoffNs, 1L).otherwise(0L).as("isa"),
        when(col("ts") >= PsiCutoffNs, 1L).otherwise(0L).as("isb"))
      val c = binned.groupBy(col("bin"))
        .agg(sum(col("isa")).as("ca"), sum(col("isb")).as("cb"))
      val tot = binned.agg(sum(col("isa")).as("na"), sum(col("isb")).as("nb"))
      c.crossJoin(broadcast(tot))
        .select(
          ((col("ca") + 1).cast("double") /
            (col("na") + PsiBins).cast("double")).as("pa"),
          ((col("cb") + 1).cast("double") /
            (col("nb") + PsiBins).cast("double")).as("pb"))
        .agg(round(sum((col("pa") - col("pb")) * log(col("pa") / col("pb"))),
          8).as("psi"),
          count(lit(1)).as("n_bins"))
    }
  )

  val oracles: Map[String, String] = Map(
    "x4_source_overlap" ->
      """WITH st AS (
           SELECT DISTINCT source, tok FROM (
             SELECT source,
                    unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
             FROM documents)),
         sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS sz
                   FROM st GROUP BY source),
         inter AS (
           SELECT a.source AS s1, b.source AS s2, count(*) AS n_shared
           FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
           GROUP BY a.source, b.source)
         SELECT s1, s2, n_shared,
                round(CAST(n_shared AS DOUBLE)
                  / CAST(z1.sz + z2.sz - n_shared AS DOUBLE), 10) AS jaccard
         FROM inter
         JOIN sizes z1 ON z1.source = s1
         JOIN sizes z2 ON z2.source = s2""",
    "x9_bfs_hops" ->
      s"""WITH RECURSIVE pairs AS MATERIALIZED (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
          adj AS MATERIALIZED (
            SELECT u AS node, v AS nb FROM pairs
            UNION ALL SELECT v AS node, u AS nb FROM pairs),
          seeds AS MATERIALIZED (
            SELECT DISTINCT node FROM adj
            WHERE substring(md5(CAST(node AS VARCHAR)), 1, 2) <= '02'),
          bfs AS (
            SELECT node, 0 AS dist FROM seeds
            UNION
            SELECT a.nb AS node, b.dist + 1 AS dist
            FROM bfs b JOIN adj a ON a.node = b.node
            WHERE b.dist < $BfsRounds)
          SELECT node, CAST(min(dist) AS BIGINT) AS dist
          FROM bfs GROUP BY node""",
    "x6_psi" ->
      s"""WITH e AS (
            SELECT CAST(least(greatest(floor(value / $PsiBinWidth), 0),
                     ${PsiBins - 1}) AS BIGINT) AS bin,
                   CASE WHEN epoch_us(ts) * 1000 < $PsiCutoffNs
                        THEN 1 ELSE 0 END AS isa,
                   CASE WHEN epoch_us(ts) * 1000 >= $PsiCutoffNs
                        THEN 1 ELSE 0 END AS isb
            FROM events),
          c AS (SELECT bin, sum(isa) AS ca, sum(isb) AS cb
                FROM e GROUP BY bin),
          tot AS (SELECT CAST(sum(isa) AS BIGINT) AS na,
                         CAST(sum(isb) AS BIGINT) AS nb FROM e)
          SELECT round(sum((CAST(ca + 1 AS DOUBLE) / CAST(na + $PsiBins AS DOUBLE)
                     - CAST(cb + 1 AS DOUBLE) / CAST(nb + $PsiBins AS DOUBLE))
                   * ln((CAST(ca + 1 AS DOUBLE) / CAST(na + $PsiBins AS DOUBLE))
                     / (CAST(cb + 1 AS DOUBLE) / CAST(nb + $PsiBins AS DOUBLE)))),
                   8) AS psi,
                 count(*) AS n_bins
          FROM c, tot"""
  )
}
