package graft.queries

import graft.Tables._
import graft.ops.TextOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-11 batch 2: the missing cardinality sketch, product
  * analytics, and serial-correlation diagnostics — FULL-equality
  * DuckDB oracles.
  *
  *  - `x6_hll_poly`: oracle-replayable HyperLogLog (m=64 registers)
  *    over the corpus vocabulary — the cardinality sketch the x6
  *    family lacked next to KMV/theta (order statistics), CMS
  *    (frequency), Misra–Gries (heavy hitters) and t-digest
  *    (quantiles). The 60-bit md5-derived `polyHash60` splits into a
  *    6-bit register index (top bits) and a 54-bit suffix whose
  *    leading-zero rank feeds the register max; `bin()` gives the
  *    bit length identically in both engines, so registers — and the
  *    estimate — replay hash-for-hash in SQL. The 2^−M register sum
  *    is kept as an EXACT scaled BIGINT (Σ 2^(55−M) ≤ 64·2^55 <
  *    2^62), so no IEEE summation-order drift; only the final
  *    alpha·m²/S chain (and the standard V>0 linear-counting branch)
  *    is floating point, mirrored operation for operation.
  *  - `x5_retention_cohorts`: the cohort-retention triangle — users
  *    cohorted by first-activity day, per (cohort, day-offset)
  *    distinct active users and retention rate. THE product-analytics
  *    rollup every event warehouse ships.
  *  - `x6_autocorr`: lag-1/2/3 autocorrelation of the daily mean of
  *    `events.value` — the serial-correlation diagnostic behind
  *    seasonality detection and CUSUM/forecast validation. Daily
  *    means quantize to DECIMAL(18,6) so all moment sums are exact
  *    (order-free); one mirrored IEEE Pearson tail per lag.
  *
  * Scale posture: HLL is the point at 100 TB — m registers per
  * partial (here one grouped max over a map-only projection), merged
  * by register max, vs a full distinct shuffle for the exact count
  * (which here is oracle scaffolding). Retention is two keyed
  * aggregates over the (user, day) distinct relation plus a
  * cohort-sized join — all shuffles user/cohort-keyed. Autocorr
  * aggregates to day-count-sized input before its lag windows.
  */
object Parity33 {
  type Q = (SparkSession, String) => DataFrame

  private val HllM = graft.ops.Hll.M
  private val SufBits = graft.ops.Hll.SufBits
  private val NsPerDay = 86400L * 1000000000L
  private val Lags = Seq(1, 2, 3)

  val queries: Map[String, Q] = Map(
    // ---- oracle-replayable HyperLogLog -----------------------------
    // Two scopes so BOTH estimator branches execute on real data:
    // the tiny corpus vocabulary lands in the V>0 linear-counting
    // branch, the event-id set (≫ 2.5m) in the raw alpha·m²/S branch.
    "x6_hll_poly" -> { (s, d) =>
      def hll(vals: DataFrame, scope: String): DataFrame = {
        val est = graft.ops.Hll.estimate(s,
          graft.ops.Hll.registers(vals))
        val exact = vals.agg(countDistinct(col("sval")).as("n_exact"))
        est.crossJoin(exact)
          .select(lit(scope).as("scope"), lit(HllM.toLong).as("m"),
            col("n_exact"), col("v_zero"), col("s_scaled"),
            round(col("est"), 6).as("est"))
      }
      val toks = documents(s, d)
        .select(explode(TextOps.tokens(lower(col("text")))).as("sval"))
      val ids = events(s, d)
        .select(col("event_id").cast("string").as("sval"))
      hll(toks, "vocab").unionAll(hll(ids, "event_ids"))
        .orderBy(col("scope"))
    },

    // ---- cohort retention triangle ---------------------------------
    "x5_retention_cohorts" -> { (s, d) =>
      val act = eventsNs(s, d)
        .select(col("user_id"), expr(s"ts DIV $NsPerDay").as("day"))
        .distinct()
      val cohort = act.groupBy(col("user_id"))
        .agg(min(col("day")).as("cohort_day"))
      val sizes = cohort.groupBy(col("cohort_day"))
        .agg(count(lit(1)).as("cohort_size"))
      act.join(cohort, Seq("user_id"))
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("offset"))
        .agg(count(lit(1)).as("n_active"))
        .join(broadcast(sizes), Seq("cohort_day"))
        .select(col("cohort_day"), col("offset"), col("n_active"),
          col("cohort_size"),
          round(col("n_active").cast("double") /
            col("cohort_size").cast("double"), 8).as("retention"))
        .orderBy(col("cohort_day"), col("offset"))
    },

    // ---- lag-k autocorrelation of the daily mean -------------------
    "x6_autocorr" -> { (s, d) =>
      val daily = eventsNs(s, d)
        .select(expr(s"ts DIV $NsPerDay").as("day_idx"),
          Exact.dec2(col("value")).as("v"))
        .groupBy(col("day_idx"))
        .agg((sum(col("v")).cast("double") /
          count(lit(1)).cast("double")).as("mean_raw"))
        .select(col("day_idx"),
          round(col("mean_raw"), 6).cast("decimal(18,6)").as("x"))
      val lagged = Lags.foldLeft(daily) { (df, l) =>
        df.withColumn(s"x_$l",
          lag(col("x"), l).over(Window.orderBy(col("day_idx"))))
      }
      val perLag = Lags.map { l =>
        val y = col(s"x_$l")
        lagged.filter(y.isNotNull)
          .agg(count(lit(1)).as("n"),
            sum(col("x")).as("sx"), sum(y).as("sy"),
            sum(col("x") * y).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(y * y).as("syy"))
          .select(lit(l.toLong).as("lag"), col("n"),
            round((col("n").cast("double") * col("sxy").cast("double") -
              col("sx").cast("double") * col("sy").cast("double")) /
              sqrt((col("n").cast("double") * col("sxx").cast("double") -
                col("sx").cast("double") * col("sx").cast("double")) *
                (col("n").cast("double") * col("syy").cast("double") -
                  col("sy").cast("double") * col("sy").cast("double"))), 8)
              .as("r"))
      }
      perLag.reduce(_ unionAll _).orderBy(col("lag"))
    },

    // ---- SemDeDup-style cluster dedup (scale-safe path) ------------
    // The blocked-exact x3_embed_cluster_dedup needs a natural block
    // column and is quadratic inside blocks; semDedup is the path
    // WITHOUT one — nearest-of-k pseudo-centroid assignment bounds
    // the pair stage to cluster-sized blocks chosen by the data
    // (SemDeDup, Abbas et al. 2023 shape). Every stage is exact
    // integer/decimal arithmetic with deterministic tie-breaks, so
    // unlike the ANN rows this gets a FULL-equality oracle: DuckDB
    // replays quantization, centroid argmax, in-cluster pair cut and
    // the min-label closure step for step.
    "x3_semdedup" -> { (s, d) =>
      val sd = graft.ops.Similarity.semDedup(embeddings(s, d),
        k = SemK, tau = SemTau)
      val sz = sd.groupBy(col("comp"))
        .agg(count(lit(1)).as("n_members"), min(col("vec_id")).as("keeper"))
      sd.join(sz, Seq("comp"))
        .select(col("vec_id"), col("cluster"), col("comp"),
          col("n_members"),
          when(col("vec_id") === col("keeper"), 1L).otherwise(0L)
            .as("is_keeper"))
        .orderBy(col("vec_id"))
    })

  private val SemK = 16
  private val SemTau = 0.3

  /** DuckDB has no conv(): fold the first 15 md5 hex digits into the
    * same 60-bit BIGINT polyHash60 yields (the Parity20 idiom). */
  private def hx15(e: String): String = OracleSql.hx15(e)

  val oracles: Map[String, String] = Map(
    "x6_hll_poly" -> {
      val sufMod = 1L << SufBits
      def scopeSql(scope: String, valsSql: String): String =
        s"""SELECT '$scope' AS scope, m, n_exact, v_zero, s_scaled, est
          FROM (
          WITH vals AS ($valsSql),
          h AS (SELECT ${hx15("sval")} AS h FROM vals),
          sp AS (SELECT h // $sufMod AS j, h % $sufMod AS suf FROM h),
          rho AS (SELECT j,
              CASE WHEN suf = 0 THEN ${SufBits + 1}
                   ELSE ${SufBits + 1} - length(bin(suf)) END AS rho
            FROM sp),
          regs AS (SELECT j, max(rho) AS m FROM rho GROUP BY j),
          grid AS (SELECT unnest(generate_series(0, ${HllM - 1})) AS j),
          full_regs AS (SELECT coalesce(regs.m, 0) AS m
            FROM grid LEFT JOIN regs ON grid.j = regs.j),
          folded AS (SELECT
              CAST(sum(CAST(1 AS BIGINT) << CAST(${SufBits + 1} - m AS INTEGER))
                AS BIGINT) AS s_scaled,
              CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_zero
            FROM full_regs),
          ex AS (SELECT CAST(count(DISTINCT sval) AS BIGINT) AS n_exact
            FROM vals),
          est0 AS (SELECT s_scaled, v_zero,
              (0.7213 / (1.0 + 1.079 / 64.0)) * 64.0 * 64.0 *
                pow(2.0, ${(SufBits + 1)}.0) / CAST(s_scaled AS DOUBLE) AS raw
            FROM folded)
          SELECT CAST($HllM AS BIGINT) AS m, n_exact, v_zero, s_scaled,
            round(CASE WHEN raw <= ${2.5 * HllM} AND v_zero > 0
              THEN 64.0 * ln(64.0 / CAST(v_zero AS DOUBLE))
              ELSE raw END, 6) AS est
          FROM est0 CROSS JOIN ex)"""
      scopeSql("vocab",
        """SELECT unnest(string_split_regex(trim(lower(text)), '\s+'))
             AS sval FROM documents""") +
        "\nUNION ALL\n" +
        scopeSql("event_ids",
          "SELECT CAST(event_id AS VARCHAR) AS sval FROM events") +
        "\nORDER BY scope"
    },
    "x5_retention_cohorts" ->
      s"""WITH act AS (
           SELECT DISTINCT user_id, epoch_us(ts) * 1000 // $NsPerDay AS day
           FROM events),
         cohort AS (SELECT user_id, min(day) AS cohort_day
           FROM act GROUP BY user_id),
         sizes AS (SELECT cohort_day, count(*) AS cohort_size
           FROM cohort GROUP BY cohort_day),
         ret AS (SELECT c.cohort_day, a.day - c.cohort_day AS "offset",
             count(*) AS n_active
           FROM act a JOIN cohort c ON a.user_id = c.user_id
           GROUP BY 1, 2)
         SELECT r.cohort_day, r."offset", r.n_active, s.cohort_size,
           round(CAST(r.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE),
             8) AS retention
         FROM ret r JOIN sizes s ON r.cohort_day = s.cohort_day
         ORDER BY r.cohort_day, r."offset"""",
    "x3_semdedup" ->
      s"""WITH RECURSIVE ex AS (SELECT vec_id,
             CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(18,6)) AS x,
             generate_subscripts(embedding, 1) AS i
           FROM embeddings),
         n2 AS (SELECT vec_id, sum(x * x) AS n2 FROM ex GROUP BY vec_id),
         cdots AS (SELECT a.vec_id, c.vec_id AS cid, sum(a.x * c.x) AS d
           FROM ex a JOIN ex c ON a.i = c.i AND c.vec_id < $SemK
           GROUP BY a.vec_id, c.vec_id),
         csc AS (SELECT cdots.vec_id, cid,
             CAST(CAST(d AS DOUBLE) /
               (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE)))
               AS DOUBLE) AS cos
           FROM cdots
           JOIN n2 na ON cdots.vec_id = na.vec_id
           JOIN n2 nc ON cdots.cid = nc.vec_id),
         assign AS (SELECT vec_id, cid AS cluster FROM (
             SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
               ORDER BY cos DESC, cid ASC) AS rn FROM csc)
           WHERE rn = 1),
         dots AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             sum(a.x * b.x) AS d
           FROM ex a
           JOIN assign sa ON a.vec_id = sa.vec_id
           JOIN assign sb ON sa.cluster = sb.cluster
           JOIN ex b ON b.vec_id = sb.vec_id AND a.i = b.i
             AND a.vec_id < b.vec_id
           GROUP BY a.vec_id, b.vec_id),
         pairs AS (SELECT id_a, id_b FROM dots
           JOIN n2 na ON dots.id_a = na.vec_id
           JOIN n2 nb ON dots.id_b = nb.vec_id
           WHERE CAST(CAST(d AS DOUBLE) /
             (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
             AS DOUBLE) >= $SemTau),
         edges AS (SELECT id_a AS a, id_b AS b FROM pairs
           UNION SELECT id_b, id_a FROM pairs),
         nodes AS (SELECT DISTINCT a AS id FROM edges),
         reach(id, lbl) AS (
           SELECT id, id FROM nodes
           UNION
           SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.id),
         comp AS (SELECT id, min(lbl) AS comp FROM reach GROUP BY id),
         base AS (SELECT s.vec_id, s.cluster,
             coalesce(c.comp, s.vec_id) AS comp
           FROM assign s LEFT JOIN comp c ON s.vec_id = c.id),
         sz AS (SELECT comp, CAST(count(*) AS BIGINT) AS n_members,
             min(vec_id) AS keeper
           FROM base GROUP BY comp)
         SELECT b.vec_id, b.cluster, b.comp, sz.n_members,
           CAST(CASE WHEN b.vec_id = sz.keeper THEN 1 ELSE 0 END AS BIGINT)
             AS is_keeper
         FROM base b JOIN sz USING (comp)
         ORDER BY b.vec_id""",
    "x6_autocorr" -> {
      val lagSel = Lags.map { l =>
        s"""SELECT $l AS lag, x, lag(x, $l) OVER (ORDER BY day_idx) AS y
           FROM daily"""
      }.mkString("\n UNION ALL ")
      s"""WITH e AS (
           SELECT epoch_us(ts) * 1000 // $NsPerDay AS day_idx,
                  CAST(value AS DECIMAL(18,2)) AS v
           FROM events),
         daily AS (
           SELECT day_idx,
                  CAST(round(CAST(sum(v) AS DOUBLE) /
                    CAST(count(*) AS DOUBLE), 6) AS DECIMAL(18,6)) AS x
           FROM e GROUP BY day_idx),
         pairs AS ($lagSel),
         mm AS (SELECT lag, CAST(count(*) AS BIGINT) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
             sum(x * x) AS sxx, sum(y * y) AS syy
           FROM pairs WHERE y IS NOT NULL GROUP BY lag)
         SELECT CAST(lag AS BIGINT) AS lag, n,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
             CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
               CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
               (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
                 CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 8) AS r
         FROM mm ORDER BY lag"""
    }
  )
}
