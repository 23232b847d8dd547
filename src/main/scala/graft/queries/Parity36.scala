package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 batch 5: weighted link prediction, partition quality,
  * physical-plan skew auditing, seasonal anomaly detection, and the
  * train/val temporal-leakage audit — FULL-equality DuckDB oracles.
  *
  *  - `x9_link_predict`: Adamic–Adar and resource-allocation scores
  *    (the rarity-weighted link-prediction pair to
  *    `x9_common_neighbors`' raw counts/Jaccard) for non-adjacent
  *    sampled pairs of the part co-purchase graph. A shared neighbor
  *    of degree d contributes 1/ln d (AA) and 1/d (RA) — each term
  *    quantized to DECIMAL(18,12) before the per-pair sum, so the
  *    accumulation is order-free and the oracle replays it exactly.
  *  - `x9_modularity`: Newman modularity of the nation partition of
  *    the customer–supplier purchase graph — the community QUALITY
  *    metric next to x9_label_prop's community DISCOVERY. Per
  *    community: internal-weight and strength sums stay integer;
  *    q_c = w_in/W − (s_c/W)² is one mirrored IEEE tail per
  *    community, quantized to DECIMAL(18,12) before the order-free
  *    total.
  *  - `x8_skew_audit`: shuffle-key skew audit over join-key
  *    candidates — per key column: distinct keys, max/mean bucket
  *    size, the heaviest key, and the integer salt-count
  *    recommendation ceil(max_cnt/mean_cnt) a salted-join rewrite
  *    (j11_salted_join) would use. The planner-side half of skew
  *    handling: AQE reacts at runtime, this measures ahead of time.
  *  - `x5_seasonal_anomaly`: day-of-week seasonal baseline over
  *    daily event counts with residual z-scores — the
  *    weekly-seasonality anomaly detector next to x5_burst_detect
  *    (global window) and x6_mad_outliers (robust location). All
  *    moments are integer sums; z = (n·c − Σc)/√(n·Σc² − (Σc)²) is
  *    algebraically rearranged so the ONLY floating step is the
  *    final mirrored quotient.
  *  - `x7_leakage_audit`: temporal train/val split integrity — split
  *    events at a cutoff day, count users crossing the boundary and
  *    the value-leakage surface (val-set users seen in train). THE
  *    pre-training audit for time-split datasets: user overlap is
  *    how target leakage enters temporal validation.
  *
  * Scale posture: link prediction rides the Σ deg²-bounded wedge
  * stream restricted to a fixed-rate sampled endpoint set (the
  * x9_common_neighbors machinery) — degree carried on the wedge, so
  * scoring adds no join. Modularity is two keyed integer aggregates
  * over the edge relation plus a community-sized tail. The skew
  * audit is one grouped count per candidate (map-side combined) —
  * its output is key-cardinality-sized, and the heavy-key argmax is
  * a bounded-heap top-1. Seasonal anomaly aggregates to (type × day)
  * before any window. The leakage audit is two distinct-user sets
  * and one broadcast-sized intersection.
  */
object Parity36 {
  type Q = (SparkSession, String) => DataFrame

  private val NsPerDay = 86400L * 1000000000L
  /** temporal split cutoff (day index). */
  private val CutoffDay = 21L
  /** anomaly threshold |z|. */
  private val ZThresh = 2.0

  val queries: Map[String, Q] = Map(
    // ---- Adamic-Adar / resource-allocation link prediction ---------
    "x9_link_predict" -> { (s, d) =>
      val pairs = Parity24.edges(s, d)
      val adjAll = pairs.select(col("u").as("node"), col("v").as("nb"))
        .unionAll(pairs.select(col("v").as("node"), col("u").as("nb")))
      val deg = adjAll.groupBy(col("node")).agg(count(lit(1)).as("dg"))
      val sampNodes = deg.filter(
        substring(md5(col("node").cast("string")), 1, 2) <= "0f")
      val sadj = adjAll.join(broadcast(sampNodes.select(col("node"))),
        Seq("node"), "left_semi")
      // carry the shared neighbor's degree ON the wedge (one
      // vocab-sized join against the degree relation, before the
      // wedge self-join) so scoring needs no post-join
      val sadjDeg = sadj.join(deg.select(col("node").as("nb"),
        col("dg").as("nbdg")), Seq("nb"))
      // per-term quantization: each wedge contributes exact decimals,
      // so the per-pair sums are independent of accumulation order
      val wedges = sadjDeg.select(col("node").as("u"), col("nb"),
          col("nbdg"))
        .join(sadjDeg.select(col("node").as("v"), col("nb")), Seq("nb"))
        .filter(col("u") < col("v"))
        .select(col("u"), col("v"),
          round(lit(1.0) / log(col("nbdg").cast("double")), 12)
            .cast("decimal(18,12)").as("aa_term"),
          round(lit(1.0) / col("nbdg").cast("double"), 12)
            .cast("decimal(18,12)").as("ra_term"))
      val scored = wedges.groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("cn"),
          sum(col("aa_term")).cast("double").as("aa"),
          sum(col("ra_term")).cast("double").as("ra"))
      val sampledEdges = pairs
        .join(broadcast(sampNodes.select(col("node").as("u"))),
          Seq("u"), "left_semi")
        .join(broadcast(sampNodes.select(col("node").as("v"))),
          Seq("v"), "left_semi")
      scored
        .join(broadcast(sampledEdges), Seq("u", "v"), "left_anti")
        .select(col("u"), col("v"), col("cn"),
          round(col("aa"), 10).as("aa_score"),
          round(col("ra"), 10).as("ra_score"))
        .orderBy(col("aa_score").desc, col("u"), col("v"))
        .limit(50)
    },

    // ---- modularity of the nation partition ------------------------
    "x9_modularity" -> { (s, d) =>
      val custComm = customer(s, d).select(
        (col("c_custkey") * 2).as("node"),
        col("c_nationkey").cast("long").as("comm"))
      val suppComm = supplier(s, d).select(
        (col("s_suppkey") * 2 + 1).as("node"),
        col("s_nationkey").cast("long").as("comm"))
      val comm = custComm.unionAll(suppComm)
      val eo = lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
      val und = eo.union(eo.select(col("dst").as("src"), col("src").as("dst")))
      val edges = und.groupBy(col("src"), col("dst"))
        .agg(count(lit(1)).as("w"))
      // node→community is dimension-sized: broadcast both lookups
      val lab = edges
        .join(broadcast(comm.select(col("node").as("src"),
          col("comm").as("cs"))), Seq("src"))
        .join(broadcast(comm.select(col("node").as("dst"),
          col("comm").as("cd"))), Seq("dst"))
      val tot = lab.agg(sum(col("w")).as("big_w"))
      val perC = lab.groupBy(col("cs"))
        .agg(sum(when(col("cs") === col("cd"), col("w")).otherwise(0L))
            .as("w_in"),
          sum(col("w")).as("strength"))
      val scoredC = perC.crossJoin(broadcast(tot))
        .select(col("cs").as("community"), col("w_in"), col("strength"),
          col("big_w"),
          round(col("w_in").cast("double") / col("big_w").cast("double") -
            (col("strength").cast("double") / col("big_w").cast("double")) *
            (col("strength").cast("double") / col("big_w").cast("double")),
            12).as("q_c"))
      val qTot = scoredC.agg(
        sum(col("q_c").cast("decimal(18,12)")).cast("double").as("q"))
      scoredC.crossJoin(broadcast(qTot))
        .select(col("community"), col("w_in"), col("strength"),
          col("q_c"), round(col("q"), 10).as("modularity"))
        .orderBy(col("community"))
    },

    // ---- shuffle-key skew audit ------------------------------------
    "x8_skew_audit" -> { (s, d) =>
      val cand = lineitem(s, d).selectExpr(
        "stack(3, 'l_orderkey', l_orderkey, 'l_partkey', l_partkey, " +
          "'l_suppkey', l_suppkey) AS (col_name, k)")
      val counts = cand.groupBy(col("col_name"), col("k"))
        .agg(count(lit(1)).as("cnt"))
      counts.groupBy(col("col_name"))
        .agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("n_rows"),
          max(col("cnt")).as("max_cnt"),
          min(struct(negate(col("cnt")), col("k"))).getField("k")
            .as("heaviest_key"))
        .select(col("col_name"), col("n_keys"), col("n_rows"),
          col("max_cnt"), col("heaviest_key"),
          round(col("n_rows").cast("double") / col("n_keys").cast("double"),
            6).as("mean_cnt"),
          round(col("max_cnt").cast("double") * col("n_keys").cast("double") /
            col("n_rows").cast("double"), 6).as("skew_ratio"),
          // integer ceil(max/mean) = ceil(max*keys/rows): the salt
          // fan-out that levels the heaviest bucket to the mean
          expr("(max_cnt * n_keys + n_rows - 1) DIV n_rows")
            .as("rec_salts"))
        .orderBy(col("col_name"))
    },

    // ---- day-of-week seasonal anomaly ------------------------------
    "x5_seasonal_anomaly" -> { (s, d) =>
      val daily = eventsNs(s, d)
        .select(col("event_type"), expr(s"ts DIV $NsPerDay").as("day_idx"))
        .groupBy(col("event_type"), col("day_idx"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("dow", col("day_idx") % 7)
      val base = daily.groupBy(col("event_type"), col("dow"))
        .agg(count(lit(1)).as("n"), sum(col("cnt")).as("sx"),
          sum(col("cnt") * col("cnt")).as("sxx"))
      daily.join(base, Seq("event_type", "dow"))
        .select(col("event_type"), col("day_idx"), col("dow"), col("cnt"),
          // z = (n·c − Σc)/√(n·Σc² − (Σc)²): integer numerator and
          // radicand, ONE mirrored IEEE quotient
          when(col("n") * col("sxx") - col("sx") * col("sx") > 0,
            round((col("n") * col("cnt") - col("sx")).cast("double") /
              sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
                .cast("double")), 8)).as("z"))
        .withColumn("is_anomaly",
          when(abs(col("z")) >= ZThresh, 1L).otherwise(0L))
        .orderBy(col("event_type"), col("day_idx"))
    },

    // ---- temporal train/val leakage audit --------------------------
    "x7_leakage_audit" -> { (s, d) =>
      val ev = eventsNs(s, d)
        .select(col("user_id"), expr(s"ts DIV $NsPerDay").as("day"))
      val train = ev.filter(col("day") < CutoffDay)
      val vl = ev.filter(col("day") >= CutoffDay)
      val tu = train.select(col("user_id")).distinct()
      val vu = vl.select(col("user_id")).distinct()
      val both = vu.join(tu, Seq("user_id"), "left_semi")
      val agg = train.agg(count(lit(1)).as("n_train")).crossJoin(
        vl.agg(count(lit(1)).as("n_val"))).crossJoin(
        tu.agg(count(lit(1)).as("users_train"))).crossJoin(
        vu.agg(count(lit(1)).as("users_val"))).crossJoin(
        both.agg(count(lit(1)).as("users_both")))
      agg.select(lit(CutoffDay).as("cutoff_day"), col("n_train"),
        col("n_val"), col("users_train"), col("users_val"),
        col("users_both"),
        round(col("users_both").cast("double") /
          col("users_val").cast("double"), 6).as("leakage_ratio"))
    })

  val oracles: Map[String, String] = Map(
    "x9_link_predict" ->
      """WITH baskets AS (SELECT l_orderkey, list_sort(list_distinct(
             list(l_partkey))) AS ps
           FROM lineitem GROUP BY l_orderkey),
         pr AS (SELECT DISTINCT ps[i] AS u, ps[j] AS v
           FROM baskets, unnest(range(1, len(ps) + 1)) AS t1(i),
             unnest(range(1, len(ps) + 1)) AS t2(j)
           WHERE i < j),
         adj AS (SELECT u AS node, v AS nb FROM pr
           UNION ALL SELECT v, u FROM pr),
         deg AS (SELECT node, CAST(count(*) AS BIGINT) AS dg
           FROM adj GROUP BY node),
         samp AS (SELECT node FROM deg
           WHERE substring(md5(CAST(node AS VARCHAR)), 1, 2) <= '0f'),
         sadj AS (SELECT a.node, a.nb FROM adj a
           JOIN samp s ON a.node = s.node),
         sadjd AS (SELECT sadj.node, sadj.nb, deg.dg AS nbdg
           FROM sadj JOIN deg ON sadj.nb = deg.node),
         wedges AS (SELECT a.node AS u, b.node AS v,
             CAST(round(1.0 / ln(CAST(a.nbdg AS DOUBLE)), 12)
               AS DECIMAL(18,12)) AS aa_term,
             CAST(round(1.0 / CAST(a.nbdg AS DOUBLE), 12)
               AS DECIMAL(18,12)) AS ra_term
           FROM sadjd a JOIN sadjd b ON a.nb = b.nb AND a.node < b.node),
         scored AS (SELECT u, v, CAST(count(*) AS BIGINT) AS cn,
             CAST(sum(aa_term) AS DOUBLE) AS aa,
             CAST(sum(ra_term) AS DOUBLE) AS ra
           FROM wedges GROUP BY u, v),
         se AS (SELECT pr.u, pr.v FROM pr
           JOIN samp s1 ON pr.u = s1.node
           JOIN samp s2 ON pr.v = s2.node)
         SELECT sc.u, sc.v, sc.cn, round(sc.aa, 10) AS aa_score,
           round(sc.ra, 10) AS ra_score
         FROM scored sc LEFT JOIN se
           ON sc.u = se.u AND sc.v = se.v
         WHERE se.u IS NULL
         ORDER BY aa_score DESC, sc.u, sc.v LIMIT 50""",
    "x9_modularity" ->
      """WITH comm AS (
           SELECT c_custkey * 2 AS node, CAST(c_nationkey AS BIGINT) AS comm
             FROM customer
           UNION ALL
           SELECT s_suppkey * 2 + 1, CAST(s_nationkey AS BIGINT)
             FROM supplier),
         eo AS (SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         und AS (SELECT src, dst FROM eo UNION ALL SELECT dst, src FROM eo),
         edges AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w
           FROM und GROUP BY src, dst),
         lab AS (SELECT e.src, e.dst, e.w, cs.comm AS cs, cd.comm AS cd
           FROM edges e
           JOIN comm cs ON e.src = cs.node
           JOIN comm cd ON e.dst = cd.node),
         tot AS (SELECT CAST(sum(w) AS BIGINT) AS big_w FROM lab),
         perc AS (SELECT cs,
             CAST(sum(CASE WHEN cs = cd THEN w ELSE 0 END) AS BIGINT)
               AS w_in,
             CAST(sum(w) AS BIGINT) AS strength
           FROM lab GROUP BY cs),
         sc AS (SELECT cs AS community, w_in, strength, big_w,
             round(CAST(w_in AS DOUBLE) / CAST(big_w AS DOUBLE) -
               (CAST(strength AS DOUBLE) / CAST(big_w AS DOUBLE)) *
               (CAST(strength AS DOUBLE) / CAST(big_w AS DOUBLE)), 12)
               AS q_c
           FROM perc CROSS JOIN tot),
         qt AS (SELECT CAST(sum(CAST(q_c AS DECIMAL(18,12))) AS DOUBLE)
             AS q FROM sc)
         SELECT community, w_in, strength, q_c,
           round(q, 10) AS modularity
         FROM sc CROSS JOIN qt ORDER BY community""",
    "x8_skew_audit" ->
      """WITH cand AS (
           SELECT 'l_orderkey' AS col_name, l_orderkey AS k FROM lineitem
           UNION ALL SELECT 'l_partkey', l_partkey FROM lineitem
           UNION ALL SELECT 'l_suppkey', l_suppkey FROM lineitem),
         counts AS (SELECT col_name, k, CAST(count(*) AS BIGINT) AS cnt
           FROM cand GROUP BY col_name, k),
         cm AS (SELECT col_name, k, cnt,
             max(cnt) OVER (PARTITION BY col_name) AS mx
           FROM counts),
         agg AS (SELECT col_name, CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(cnt) AS BIGINT) AS n_rows,
             CAST(max(cnt) AS BIGINT) AS max_cnt,
             CAST(min(CASE WHEN cnt = mx THEN k END) AS BIGINT)
               AS heaviest_key
           FROM cm GROUP BY col_name)
         SELECT col_name, n_keys, n_rows, max_cnt, heaviest_key,
           round(CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE), 6)
             AS mean_cnt,
           round(CAST(max_cnt AS DOUBLE) * CAST(n_keys AS DOUBLE) /
             CAST(n_rows AS DOUBLE), 6) AS skew_ratio,
           CAST((max_cnt * n_keys + n_rows - 1) // n_rows AS BIGINT)
             AS rec_salts
         FROM agg ORDER BY col_name""",
    "x5_seasonal_anomaly" ->
      s"""WITH daily AS (SELECT event_type,
             epoch_us(ts) * 1000 // $NsPerDay AS day_idx,
             CAST(count(*) AS BIGINT) AS cnt
           FROM events GROUP BY event_type, 2),
         dd AS (SELECT event_type, day_idx, cnt, day_idx % 7 AS dow
           FROM daily),
         base AS (SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cnt) AS BIGINT) AS sx,
             CAST(sum(cnt * cnt) AS BIGINT) AS sxx
           FROM dd GROUP BY event_type, dow),
         j AS (SELECT dd.event_type, dd.day_idx, dd.dow, dd.cnt,
             CASE WHEN b.n * b.sxx - b.sx * b.sx > 0
               THEN round(CAST(b.n * dd.cnt - b.sx AS DOUBLE) /
                 sqrt(CAST(b.n * b.sxx - b.sx * b.sx AS DOUBLE)), 8)
             END AS z
           FROM dd JOIN base b
             ON dd.event_type = b.event_type AND dd.dow = b.dow)
         SELECT event_type, day_idx, dow, cnt, z,
           CASE WHEN abs(z) >= $ZThresh THEN CAST(1 AS BIGINT)
             ELSE CAST(0 AS BIGINT) END AS is_anomaly
         FROM j ORDER BY event_type, day_idx""",
    "x7_leakage_audit" ->
      s"""WITH ev AS (SELECT user_id,
             epoch_us(ts) * 1000 // $NsPerDay AS day FROM events),
         tr AS (SELECT * FROM ev WHERE day < $CutoffDay),
         vl AS (SELECT * FROM ev WHERE day >= $CutoffDay),
         tu AS (SELECT DISTINCT user_id FROM tr),
         vu AS (SELECT DISTINCT user_id FROM vl),
         bo AS (SELECT vu.user_id FROM vu JOIN tu ON vu.user_id = tu.user_id)
         SELECT CAST($CutoffDay AS BIGINT) AS cutoff_day,
           (SELECT CAST(count(*) AS BIGINT) FROM tr) AS n_train,
           (SELECT CAST(count(*) AS BIGINT) FROM vl) AS n_val,
           (SELECT CAST(count(*) AS BIGINT) FROM tu) AS users_train,
           (SELECT CAST(count(*) AS BIGINT) FROM vu) AS users_val,
           (SELECT CAST(count(*) AS BIGINT) FROM bo) AS users_both,
           round(CAST((SELECT count(*) FROM bo) AS DOUBLE) /
             CAST((SELECT count(*) FROM vu) AS DOUBLE), 6)
             AS leakage_ratio""")
}
