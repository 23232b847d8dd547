package graft.queries

import graft.Tables._
import graft.ops.{Sessionize, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Round-10 batch: four operators —
  *
  *  - `x1_changelog_compact`: CDC changelog compaction with DELETE
  *    semantics — net a keyed change stream (upserts + deletes) down
  *    to the final table state. The missing sibling of
  *    `x1_latest_per_key` (no deletes) and `x1_merge_upsert`
  *    (batch-vs-target): this is the log-to-snapshot collapse every
  *    CDC ingest (Debezium topic -> lakehouse table) runs.
  *  - `x6_cms_est`: count-min sketch expressed RELATIONALLY — the
  *    counter matrix is a (depth, bucket) aggregate, estimates are a
  *    broadcast join + min. Demonstrates the sketch with a FULL
  *    equality oracle (deterministic md5 bucket hashes replayed in
  *    SQL), unlike the bounded-assertion-only sketch rows.
  *  - `x5_interpolate`: linear-interpolation resampling onto an hourly
  *    grid — the interpolating sibling of the forward-fill
  *    `x5_resample`, same single-pass ownership formulation (lead +
  *    sequence explode, no dense-grid join).
  *  - `x8_hilbert_curve`: Hilbert space-filling-curve clustering index
  *    via the native codegen'd `Hilbert2` expression — the
  *    locality-preserving alternative to `x8_zorder_curve` (what
  *    Delta/Iceberg OPTIMIZE offer beside Z-order); the oracle replays
  *    the 16 bit-plane iterations as a recursive CTE.
  *
  * Scale posture: changelog compaction is ONE keyed shuffle (two
  * window functions over the same partitioning); the CMS counter
  * matrix is fixed-size (depth x width, corpus-independent) so it
  * broadcasts; interpolation shuffles once on user_id with per-row
  * explode width bounded by the largest observation gap; the Hilbert
  * kernel is map-only constant-time integer ops inside whole-stage
  * codegen. Deterministic total ORDER BY on every output.
  */
object Parity14 {
  type Q = (SparkSession, String) => DataFrame

  /** CMS geometry: depth 4 rows x width 1024 counters. eps = e/1024
    * (~0.27% of corpus mass), delta = e^-4. Fixed size — the sketch
    * stays 4 KiB of longs whether the corpus is 60k tokens or 100 TB. */
  private val CmsDepth = 4
  private val CmsWidth = 1024L
  /** Interpolation grid step: 1 hour in microseconds. */
  private val StepUs = 3600L * 1000000L

  /** md5-derived CMS bucket of `tok` for depth row `dd` — 12 hex
    * digits (48 bits) mod the power-of-two width keeps the low 10
    * bits, uniform and engine-replayable (same digits in the oracle). */
  private def cmsBucket(dd: org.apache.spark.sql.Column,
      tok: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(concat(dd.cast("string"), lit(":"), tok)), 1, 12),
      16, 10).cast(LongType) % CmsWidth

  val queries: Map[String, Q] = Map(
    // ---- CDC changelog compaction (deletes net out) ----------------
    // events as the changelog: user_id is the entity key, 'error'
    // rows are tombstones, everything else an upsert of `value`.
    // Last op per key wins — ordered by (us, event_id), the
    // deterministic total order of the stream. One shuffle on the
    // key; both window functions (last-op rank, op count) share the
    // same partitioning. At 100 TB the shuffle is the floor for any
    // keyed compaction; AQE skew-split handles hot keys.
    "x1_changelog_compact" -> { (s, d) =>
      val e = eventsNs(s, d).select(col("user_id"), col("event_id"),
        Sessionize.nsToUs(col("ts")).as("us"),
        col("event_type"), col("value"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us").desc, col("event_id").desc)
      e.withColumn("rn", row_number().over(w))
        .withColumn("n_ops",
          count(lit(1)).over(Window.partitionBy(col("user_id"))))
        .filter(col("rn") === 1 && col("event_type") =!= "error")
        .select(col("user_id"), col("us").as("last_us"),
          col("value").as("last_value"), col("n_ops"))
        .orderBy(col("user_id"))
    },

    // ---- count-min sketch, relational form -------------------------
    // counter[d][b] = total occurrences of tokens hashing to bucket b
    // in depth row d — built from per-token counts (one aggregate),
    // NOT from re-hashing every occurrence. est(t) = min over d of
    // counter[d][h_d(t)] >= true count, with overcount bounded by
    // eps * corpus mass per classic CMS analysis. The counter matrix
    // is depth*width rows REGARDLESS of corpus size -> broadcast; the
    // only corpus-scale work is the token count aggregate every
    // pipeline already runs. Output: the top-20 exact tokens with
    // their sketch estimate and overcount (est == n_exact for heavy
    // hitters here — the planted skew keeps them above the noise).
    "x6_cms_est" -> { (s, d) =>
      val cnt = documents(s, d)
        .select(explode(TextOps.tokens(lower(col("text")))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      val bk = cnt.select(col("tok"), col("n"),
          explode(sequence(lit(0), lit(CmsDepth - 1))).as("dd"))
        .withColumn("bkt", cmsBucket(col("dd"), col("tok")))
      val ctr = bk.groupBy(col("dd"), col("bkt"))
        .agg(sum(col("n")).as("c"))
      val top = cnt.orderBy(col("n").desc, col("tok").asc).limit(20)
      top.join(bk.select(col("tok"), col("dd"), col("bkt")), Seq("tok"))
        .join(broadcast(ctr), Seq("dd", "bkt"))
        .groupBy(col("tok"), col("n"))
        .agg(min(col("c")).as("est"))
        .select(col("tok"), col("n").as("n_exact"), col("est"),
          (col("est") - col("n")).as("overcount"))
        .orderBy(col("n_exact").desc, col("tok").asc)
    },

    // ---- linear-interpolation resampling ---------------------------
    // Same ownership formulation as x5_resample (each observation owns
    // the grid buckets up to the next observation; lead() gives the
    // bound, sequence() emits them — no dense grid, no grid-join):
    // but the carried value is linearly interpolated toward the next
    // observation instead of held. All grid arithmetic is integer;
    // the interpolation itself is one IEEE (sub, div, mul, add)
    // chain evaluated identically by Spark and DuckDB.
    "x5_interpolate" -> { (s, d) =>
      val obs = eventsNs(s, d)
        .select(col("user_id"), Sessionize.nsToUs(col("ts")).as("us"),
          col("value"))
        .withColumn("ob", expr(s"us DIV $StepUs") * StepUs)
        .groupBy(col("user_id"), col("ob"))
        .agg(max_by(col("value"), col("us")).as("v"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ob"))
      obs
        .withColumn("nob", lead(col("ob"), 1).over(w))
        .withColumn("nv", lead(col("v"), 1).over(w))
        .select(col("user_id"), col("ob"), col("v"), col("nob"), col("nv"),
          explode(sequence(col("ob"),
            coalesce(col("nob") - StepUs, col("ob")), lit(StepUs)))
            .as("bucket_us"))
        .withColumn("value_i",
          when(col("nob").isNull || col("bucket_us") === col("ob"), col("v"))
            .otherwise(col("v") + (col("nv") - col("v")) *
              ((col("bucket_us") - col("ob")).cast(DoubleType) /
                (col("nob") - col("ob")).cast(DoubleType)))
            .cast(DoubleType))
        .withColumn("is_obs",
          when(col("bucket_us") === col("ob"), 1L).otherwise(0L))
        .select(col("user_id"), col("bucket_us"), col("value_i"),
          col("is_obs"))
        .orderBy(col("user_id"), col("bucket_us"))
    },

    // ---- Hilbert-curve clustering index ----------------------------
    // The native kernel on the 16-bit grid of (l_partkey, l_suppkey).
    // Like x8_zorder_curve this exercises the RAW kernel (inputs
    // masked to 16 bits); the production layout path grid-normalizes
    // real ranges via min/max first. Map-only, constant-time per row,
    // inside whole-stage codegen.
    "x8_hilbert_curve" -> { (s, d) =>
      lineitem(s, d).filter(col("l_orderkey") <= 2000)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"),
          graft.functions.Hilbert2.hilbert2(
            col("l_partkey"), col("l_suppkey")).as("h"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    })

  val oracles: Map[String, String] = Map(
    "x1_changelog_compact" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
             event_type, value FROM events),
         r AS (SELECT user_id, us, event_type, value,
             row_number() OVER (PARTITION BY user_id
               ORDER BY us DESC, event_id DESC) AS rn,
             CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_ops
           FROM e)
         SELECT user_id, us AS last_us, value AS last_value, n_ops
         FROM r WHERE rn = 1 AND event_type <> 'error'
         ORDER BY user_id""",
    "x6_cms_est" ->
      """WITH tok0 AS (SELECT unnest(string_split_regex(trim(lower(text)),
             '\s+')) AS tok FROM documents),
         cnt AS (SELECT tok, CAST(count(*) AS BIGINT) AS n
           FROM tok0 GROUP BY tok),
         bk AS (SELECT tok, n, dd,
             CAST(list_sum(list_transform(generate_series(1, 12),
               p -> (CAST(strpos('0123456789abcdef',
                 substring(md5(CAST(dd AS VARCHAR) || ':' || tok), p, 1))
                 AS BIGINT) - 1) << (4 * (12 - p)))) AS BIGINT) % 1024 AS bkt
           FROM cnt, unnest([0, 1, 2, 3]) AS u(dd)),
         ctr AS (SELECT dd, bkt, CAST(sum(n) AS BIGINT) AS c
           FROM bk GROUP BY dd, bkt),
         top AS (SELECT tok, n FROM cnt ORDER BY n DESC, tok ASC LIMIT 20)
         SELECT t.tok AS tok, t.n AS n_exact,
           CAST(min(c.c) AS BIGINT) AS est,
           CAST(min(c.c) - t.n AS BIGINT) AS overcount
         FROM top t
           JOIN bk b ON t.tok = b.tok
           JOIN ctr c ON b.dd = c.dd AND b.bkt = c.bkt
         GROUP BY t.tok, t.n
         ORDER BY n_exact DESC, tok ASC""",
    "x5_interpolate" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
         m AS (SELECT user_id, (us // 3600000000) * 3600000000 AS ob,
             us, value FROM e),
         obs AS (SELECT user_id, ob, arg_max(value, us) AS v
           FROM m GROUP BY user_id, ob),
         l AS (SELECT user_id, ob, v,
             lead(ob) OVER (PARTITION BY user_id ORDER BY ob) AS nob,
             lead(v) OVER (PARTITION BY user_id ORDER BY ob) AS nv
           FROM obs),
         g AS (SELECT user_id, ob, v, nob, nv,
             unnest(range(ob, coalesce(nob - 3600000000, ob) + 1,
               3600000000)) AS bucket_us
           FROM l)
         SELECT user_id, bucket_us,
           CAST(CASE WHEN nob IS NULL OR bucket_us = ob THEN v
             ELSE v + (nv - v) *
               (CAST(bucket_us - ob AS DOUBLE) / CAST(nob - ob AS DOUBLE))
             END AS DOUBLE) AS value_i,
           CASE WHEN bucket_us = ob THEN 1 ELSE 0 END AS is_obs
         FROM g ORDER BY user_id, bucket_us""",
    "x8_hilbert_curve" ->
      """WITH RECURSIVE h AS (
           SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             l_partkey & 65535 AS x, l_suppkey & 65535 AS y,
             CAST(32768 AS BIGINT) AS s, CAST(0 AS BIGINT) AS d
           FROM lineitem WHERE l_orderkey <= 2000
           UNION ALL
           SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             CASE WHEN (y & s) = 0
               THEN (CASE WHEN (x & s) > 0 THEN s - 1 - y ELSE y END)
               ELSE x END,
             CASE WHEN (y & s) = 0
               THEN (CASE WHEN (x & s) > 0 THEN s - 1 - x ELSE x END)
               ELSE y END,
             s // 2,
             d + s * s * xor(3 * (CASE WHEN (x & s) > 0 THEN 1 ELSE 0 END),
                             CASE WHEN (y & s) > 0 THEN 1 ELSE 0 END)
           FROM h WHERE s > 0)
         SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, d AS h
         FROM h WHERE s = 0
         ORDER BY l_orderkey, l_linenumber""")
}
