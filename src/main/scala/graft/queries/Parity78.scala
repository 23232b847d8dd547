package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-14 batch 11: sorted-neighborhood blocking and CUPED —
  * a third record-linkage blocking discipline and the standard
  * experimentation-platform variance-reduction estimator.
  *
  *  - `x2_sorted_blocking`: the classic sorted-neighborhood method
  *    (Hernández–Stolfo) next to the grid blocking of
  *    `x2_record_linkage` and the LSH banding of `x2_minhash_lsh`:
  *    sort the records on a discriminating key (balance, ties by
  *    id), slide a fixed window w over the SORT ORDER, and emit
  *    only within-window pairs — candidates are ≤ n·(w-1)
  *    BY CONSTRUCTION, no density knob needed (the fixed-width band
  *    of linkage_bands goes quadratic when density grows; the
  *    sorted window cannot). Global ranks come from the
  *    x1_surrogate_keys two-phase machinery (range partition +
  *    partition-local window + ≤P-row offset join — no
  *    SinglePartition exchange), and the window join is a
  *    bucket-adjacency equi-join (Δrank ≤ w-1 ⇒ same or adjacent
  *    rank-bucket of size w), never a rank-inequality theta-join.
  *    The planted twins sit +1.5 balance from their base record —
  *    inside the window at the gate's density — and are recovered
  *    by the same name-edit-distance rule the linkage row uses.
  *  - `x6_cuped`: CUPED variance reduction (Deng et al.) — the
  *    pre-period covariate x (pre-cutoff spend) absorbs between-user
  *    variance from the experiment metric y: y' = y − θ(x − x̄),
  *    θ = cov(x,y)/var(x) pooled. All moments are EXACT integer
  *    sums of cent-quantized values (the x9_assortativity
  *    discipline); θ and the per-arm adjusted means/variances are a
  *    single mirrored IEEE tail, rounded once — so a statistical
  *    estimator gets a bit-stable full-equality oracle. The emitted
  *    var_y vs var_y_adj columns show the reduction the covariate
  *    buys (the reason every experimentation platform runs this).
  *
  * Scale posture: sorted blocking is one range shuffle + local
  * sorts + a broadcast offset join + one bucket-keyed equi-join —
  * the pair stream is n·(w-1)-bounded. CUPED is two keyed
  * aggregates (per-user, then per-arm) + one 1-row broadcast of the
  * pooled moments.
  */
object Parity78 {
  type Q = (SparkSession, String) => DataFrame

  private val RangeParts = 16
  private val WindowW = 8L
  /** 2024-01-15T00:00:00Z in epoch nanos (the x1_time_travel cutoff). */
  private val CutoffNs = 1705276800000000000L

  val queries: Map[String, Q] = Map(
    "x2_sorted_blocking" -> { (s, d) =>
      val recs = Parity73.linkageRecords(customer(s, d))
        .select(col("rec_id"), col("name"), col("bal"))
      // global rank over (bal, rec_id): range shuffle + local window
      // + offset join — the x1_surrogate_keys two-phase shape
      val src = recs
        .repartitionByRange(RangeParts, col("bal"), col("rec_id"))
        .withColumn("pid", spark_partition_id())
      val local = src.withColumn("rn", row_number().over(
        Window.partitionBy(col("pid"))
          .orderBy(col("bal"), col("rec_id"))).cast("long"))
      val offsets = local.groupBy(col("pid"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("off", coalesce(sum(col("cnt")).over(
          Window.orderBy(col("pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("pid"), col("off"))
      val ranked = graft.ops.Iter.truncate(
        local.join(broadcast(offsets), Seq("pid"))
          .select(col("rec_id"), col("name"), col("bal"),
            (col("off") + col("rn")).as("rk")), None)
      // Δrank ≤ w-1 ⇒ rank buckets of size w are same or adjacent:
      // the left side probes its own bucket and the previous one —
      // an equi-join on the bucket key, never a rank theta-join
      val a = ranked.select(col("rec_id").as("ra"),
        col("name").as("name_a"), col("rk").as("rka"))
        .withColumn("bkt", expr(s"rka DIV $WindowW"))
      val b = ranked.select(col("rec_id").as("rb"),
        col("name").as("name_b"), col("rk").as("rkb"))
        .select(col("rb"), col("name_b"), col("rkb"),
          explode(array(expr(s"rkb DIV $WindowW"),
            expr(s"rkb DIV $WindowW - 1"))).as("bkt"))
      val cand = a.join(b, Seq("bkt"))
        .filter(col("rkb") > col("rka") &&
          col("rkb") - col("rka") <= WindowW - 1)
      val n = cand.agg(count(lit(1)).as("n_candidates"))
      cand
        .filter(levenshtein(col("name_a"), col("name_b")) <= 1)
        .select(col("ra"), col("rb"),
          (col("rkb") - col("rka")).as("drank"))
        .crossJoin(broadcast(n))
        .orderBy(col("ra"), col("rb"))
    },

    "x6_cuped" -> { (s, d) =>
      val ev = eventsNs(s, d)
        .select(col("user_id"), col("ts"),
          expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
      val per = ev.groupBy(col("user_id"))
        .agg(
          sum(when(col("ts") <= CutoffNs, col("cents"))
            .otherwise(0L)).as("x"),
          sum(when(col("ts") > CutoffNs, col("cents"))
            .otherwise(0L)).as("y"))
        .withColumn("arm", (col("user_id") % 2).cast("int"))
      // pooled second moments as EXACT integer sums; θ and the means
      // are the one IEEE tail, mirrored verbatim in the oracle
      val pooled = per.agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      val arms = per.groupBy(col("arm"))
        .agg(count(lit(1)).as("n_arm"),
          sum(col("x")).as("sxa"), sum(col("y")).as("sya"),
          sum(col("y") * col("y")).as("syya"),
          sum(col("x") * col("x")).as("sxxa"),
          sum(col("x") * col("y")).as("sxya"))
      arms.crossJoin(broadcast(pooled))
        .withColumn("th", expr(
          """(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
             (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"""))
        .select(col("arm"), col("n_arm"),
          expr("round(th, 8)").as("theta"),
          expr("round(CAST(sya AS DOUBLE) / n_arm / 100, 6)")
            .as("mean_y"),
          expr("""round((CAST(sya AS DOUBLE) / n_arm -
              th * (CAST(sxa AS DOUBLE) / n_arm - CAST(sx AS DOUBLE) / n))
              / 100, 6)""").as("mean_y_adj"),
          expr("""round((CAST(syya AS DOUBLE) / n_arm -
              (CAST(sya AS DOUBLE) / n_arm) *
              (CAST(sya AS DOUBLE) / n_arm)) / 10000, 4)""")
            .as("var_y"),
          expr("""round(((CAST(syya AS DOUBLE) / n_arm -
              (CAST(sya AS DOUBLE) / n_arm) *
              (CAST(sya AS DOUBLE) / n_arm)) -
              2 * th * (CAST(sxya AS DOUBLE) / n_arm -
                (CAST(sxa AS DOUBLE) / n_arm) *
                (CAST(sya AS DOUBLE) / n_arm)) +
              th * th * (CAST(sxxa AS DOUBLE) / n_arm -
                (CAST(sxa AS DOUBLE) / n_arm) *
                (CAST(sxa AS DOUBLE) / n_arm))) / 10000, 4)""")
            .as("var_y_adj"))
        .orderBy(col("arm"))
    },

    // ---- difference-in-differences ---------------------------------
    // The 2x2 quasi-experimental estimator next to x6_cuped: arm =
    // user parity, period = the shared cutoff; cell sums are exact
    // integer cents, the four cell means and the DiD contrast are one
    // mirrored IEEE tail rounded once.
    "x6_diff_in_diff" -> { (s, d) =>
      val cells = eventsNs(s, d)
        .select((col("user_id") % 2).cast("int").as("arm"),
          when(col("ts") <= CutoffNs, 0).otherwise(1).as("period"),
          expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
        .groupBy(col("arm"), col("period"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sc"))
      val wide = cells
        .groupBy()
        .pivot(concat(col("arm"), lit("_"), col("period")),
          Seq("0_0", "0_1", "1_0", "1_1"))
        .agg(first(expr("CAST(sc AS DOUBLE) / n")).as("m"))
      wide.select(
        expr("round(`0_0` / 100, 6)").as("ctrl_pre"),
        expr("round(`0_1` / 100, 6)").as("ctrl_post"),
        expr("round(`1_0` / 100, 6)").as("treat_pre"),
        expr("round(`1_1` / 100, 6)").as("treat_post"),
        expr("round(((`1_1` - `1_0`) - (`0_1` - `0_0`)) / 100, 6)")
          .as("did"))
    })

  val oracles: Map[String, String] = Map(
    "x2_sorted_blocking" -> {
      val twins = """
        SELECT c_custkey + 1000000 AS rec_id,
               substring(c_name, 1, length(c_name) - 1) || 'X' AS name,
               c_acctbal + 1.5 AS bal
        FROM customer
        WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 2) <= '0f'"""
      s"""WITH recs AS (
           SELECT c_custkey AS rec_id, c_name AS name, c_acctbal AS bal
           FROM customer
           UNION ALL $twins),
         ranked AS (
           SELECT rec_id, name, bal,
             CAST(row_number() OVER (ORDER BY bal, rec_id) AS BIGINT)
               AS rk
           FROM recs),
         cand AS (
           SELECT a.rec_id AS ra, a.name AS name_a,
                  b.rec_id AS rb, b.name AS name_b,
                  b.rk - a.rk AS drank
           FROM ranked a JOIN ranked b
             ON b.rk > a.rk AND b.rk - a.rk <= ${WindowW - 1}),
         n AS (SELECT count(*) AS n_candidates FROM cand)
         SELECT ra, rb, drank, n_candidates
         FROM cand CROSS JOIN n
         WHERE levenshtein(name_a, name_b) <= 1
         ORDER BY ra, rb"""
    },
    "x6_cuped" ->
      s"""WITH ev AS (
           SELECT user_id, epoch_us(ts) * 1000 AS tsn,
                  CAST(floor(value * 100) AS BIGINT) AS cents
           FROM events),
         per AS (
           SELECT user_id,
                  sum(CASE WHEN tsn <= $CutoffNs THEN cents ELSE 0 END)
                    AS x,
                  sum(CASE WHEN tsn > $CutoffNs THEN cents ELSE 0 END)
                    AS y,
                  CAST(user_id % 2 AS INTEGER) AS arm
           FROM ev GROUP BY user_id),
         pooled AS (
           SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                  sum(x * x) AS sxx, sum(x * y) AS sxy
           FROM per),
         arms AS (
           SELECT arm, count(*) AS n_arm, sum(x) AS sxa,
                  sum(y) AS sya, sum(y * y) AS syya,
                  sum(x * x) AS sxxa, sum(x * y) AS sxya
           FROM per GROUP BY arm),
         wth AS (
           SELECT arms.*, pooled.*,
             (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
             (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS th
           FROM arms CROSS JOIN pooled)
         SELECT arm, n_arm,
           round(th, 8) AS theta,
           round(CAST(sya AS DOUBLE) / n_arm / 100, 6) AS mean_y,
           round((CAST(sya AS DOUBLE) / n_arm -
               th * (CAST(sxa AS DOUBLE) / n_arm - CAST(sx AS DOUBLE) / n))
               / 100, 6) AS mean_y_adj,
           round((CAST(syya AS DOUBLE) / n_arm -
               (CAST(sya AS DOUBLE) / n_arm) *
               (CAST(sya AS DOUBLE) / n_arm)) / 10000, 4) AS var_y,
           round(((CAST(syya AS DOUBLE) / n_arm -
               (CAST(sya AS DOUBLE) / n_arm) *
               (CAST(sya AS DOUBLE) / n_arm)) -
               2 * th * (CAST(sxya AS DOUBLE) / n_arm -
                 (CAST(sxa AS DOUBLE) / n_arm) *
                 (CAST(sya AS DOUBLE) / n_arm)) +
               th * th * (CAST(sxxa AS DOUBLE) / n_arm -
                 (CAST(sxa AS DOUBLE) / n_arm) *
                 (CAST(sxa AS DOUBLE) / n_arm))) / 10000, 4) AS var_y_adj
         FROM wth ORDER BY arm""",
    "x6_diff_in_diff" ->
      s"""WITH cells AS (
           SELECT CAST(user_id % 2 AS INTEGER) AS arm,
                  CASE WHEN epoch_us(ts) * 1000 <= $CutoffNs
                       THEN 0 ELSE 1 END AS period,
                  count(*) AS n,
                  sum(CAST(floor(value * 100) AS BIGINT)) AS sc
           FROM events GROUP BY 1, 2),
         m AS (SELECT arm, period, CAST(sc AS DOUBLE) / n AS m
           FROM cells)
         SELECT
           round((SELECT m FROM m WHERE arm = 0 AND period = 0) / 100, 6)
             AS ctrl_pre,
           round((SELECT m FROM m WHERE arm = 0 AND period = 1) / 100, 6)
             AS ctrl_post,
           round((SELECT m FROM m WHERE arm = 1 AND period = 0) / 100, 6)
             AS treat_pre,
           round((SELECT m FROM m WHERE arm = 1 AND period = 1) / 100, 6)
             AS treat_post,
           round((((SELECT m FROM m WHERE arm = 1 AND period = 1) -
                   (SELECT m FROM m WHERE arm = 1 AND period = 0)) -
                  ((SELECT m FROM m WHERE arm = 0 AND period = 1) -
                   (SELECT m FROM m WHERE arm = 0 AND period = 0)))
                 / 100, 6) AS did"""
  )
}
