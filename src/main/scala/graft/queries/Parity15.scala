package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Round-10 batch 2: three more training-data-pipeline operators —
  *
  *  - `x7_weighted_sample`: Efraimidis–Spirakis weighted sampling
  *    without replacement (top-k by u^(1/w), ranked as ln(u)/w) with
  *    deterministic md5-derived uniforms — longer documents are
  *    proportionally likelier to be kept, reproducible on any engine
  *    or cluster. The weighted counterpart of `x7_hash_sample`.
  *  - `x1_snapshot_diff`: snapshot-to-snapshot CDC EXTRACTION — the
  *    inverse of `x1_changelog_compact`: given the entity state at
  *    two cutoffs, emit the insert/update/delete changelog between
  *    them (what a lakehouse "table changes"/CDC feed computes).
  *  - `asof_forward` / `asof_tolerance`: the remaining as-of join
  *    directions — next-event (forward) enrichment and
  *    bounded-staleness (tolerance) matching, both via the same
  *    union-merge window machinery as `asof_join` and both
  *    cross-checked against DuckDB's native ASOF JOIN.
  *  - `x8_compaction_plan`: small-file compaction planning — assign
  *    documents (in deterministic key order, per source partition) to
  *    target-size output files by running-prefix-sum bin packing, and
  *    report the planned file manifest. The OPTIMIZE/compaction
  *    planner every 100 TB table needs; same distributed prefix-sum
  *    shape as `x4_seq_pack`.
  *
  * Scale posture: weighted sampling is map-only key computation + a
  * bounded top-k (TakeOrdered, never a full sort); snapshot diff is
  * one full-outer join of two keyed states (each itself one keyed
  * window over the log); compaction planning is one shuffle on the
  * partition column with a per-partition running sum. Deterministic
  * total ORDER BY on every output.
  */
object Parity15 {
  type Q = (SparkSession, String) => DataFrame

  /** Weighted-sample size. */
  private val WsK = 200
  /** Compaction target file size (chars stand in for bytes). */
  private val TargetBytes = 4096L
  /** Snapshot cutoff: a fixed absolute micros timestamp inside the
    * generator's event-time range (events span 2024-01-01..01-30 at
    * every sf), so snapshot A is the mid-month state and snapshot B
    * the final state — the diff is a real I/U/D changelog. */
  private val CutoffUs1 = 1705363200000000L // 2024-01-16 00:00:00 UTC

  val queries: Map[String, Q] = Map(
    // ---- Efraimidis-Spirakis weighted sampling ---------------------
    // key_i = ln(u_i)/w_i with u_i = (v_i+1)/2^48 from the md5 of the
    // doc id, w_i = n_chars: the k LARGEST keys are a weighted sample
    // without replacement (P(i in sample) increases with w_i). The
    // only cross-engine float is ln() (1-ulp library variance on a
    // continuous key — rank-flip probability ~1e-12 at this corpus);
    // the key itself is NOT emitted, so outputs hash-compare exactly.
    // Map-only + TakeOrdered(k): no full sort, no shuffle beyond the
    // bounded top-k collect — at 100 TB this is a scan.
    "x7_weighted_sample" -> { (s, d) =>
      documents(s, d)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .withColumn("v",
          conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10)
            .cast(LongType))
        .withColumn("es_key",
          log((col("v") + 1).cast(DoubleType) / lit(281474976710656.0)) /
            col("n_chars").cast(DoubleType))
        .orderBy(col("es_key").desc, col("doc_id").asc)
        .limit(WsK)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    },

    // ---- snapshot-to-snapshot CDC diff -----------------------------
    // State at a cutoff = changelog compaction of events up to it
    // (last op per user_id; 'error' = tombstone). The diff of the two
    // states is the emitted changelog: I (only in new), D (only in
    // old), U (in both, value changed). One window per snapshot (same
    // user_id partitioning) + one full-outer join on the key. This is
    // the table-changes feed between two table versions; at 100 TB
    // both sides are keyed scans of the same log segment family.
    "x1_snapshot_diff" -> { (s, d) =>
      def stateAt(cutUs: Option[Long]): DataFrame = {
        val e = eventsNs(s, d).select(col("user_id"), col("event_id"),
          graft.ops.Sessionize.nsToUs(col("ts")).as("us"),
          col("event_type"), col("value"))
        val bounded = cutUs.map(c => e.filter(col("us") <= c)).getOrElse(e)
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us").desc, col("event_id").desc)
        bounded.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1 && col("event_type") =!= "error")
          .select(col("user_id"), col("value"))
      }
      val a = stateAt(Some(CutoffUs1)).withColumnRenamed("value", "value_old")
      val b = stateAt(None).withColumnRenamed("value", "value_new")
      a.join(b, Seq("user_id"), "full_outer")
        .withColumn("op",
          when(col("value_old").isNull, lit("I"))
            .when(col("value_new").isNull, lit("D"))
            .when(col("value_old") =!= col("value_new"), lit("U")))
        .filter(col("op").isNotNull)
        .select(col("user_id"), col("op"), col("value_old"), col("value_new"))
        .orderBy(col("user_id"))
    },

    // ---- forward as-of: next purchase after each view --------------
    // The funnel-enrich direction DuckDB's ASOF also supports (probe
    // time <= reference time picks the EARLIEST at-or-after match):
    // our union-merge machinery run in descending order. Right side
    // deduplicated per (user, time) so ties are deterministic. Same
    // one-keyed-shuffle cost as backward.
    "asof_forward" -> { (s, d) =>
      val e = eventsNs(s, d).select(col("event_id"), col("user_id"),
        graft.ops.Sessionize.nsToUs(col("ts")).as("t_us"),
        col("event_type"), col("value"))
      val probe = e.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("t_us"))
      val ref = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("t_us"))
        .agg(max_by(struct(col("event_id"), col("value")), col("event_id"))
          .as("_v"))
        .select(col("user_id"), col("t_us"),
          col("_v.event_id").as("p_event_id"),
          col("_v.value").as("p_value"))
      graft.ops.AsofJoin.asofForward(probe, ref, "user_id", "t_us", "t_us",
          Seq("p_event_id", "p_value"))
        .orderBy(col("event_id"))
    },

    // ---- tolerance as-of: last click within 1 h before a purchase --
    // Bounded-staleness attribution (pandas merge_asof `tolerance`):
    // the most recent click attributes to the purchase only when it
    // happened inside the hour; staler matches null out, which is the
    // difference between "last touch" and "last RELEVANT touch".
    "asof_tolerance" -> { (s, d) =>
      val e = eventsNs(s, d).select(col("event_id"), col("user_id"),
        graft.ops.Sessionize.nsToUs(col("ts")).as("t_us"),
        col("event_type"), col("value"))
      val probe = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("t_us"))
      val ref = e.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("t_us"))
        .agg(max_by(struct(col("event_id"), col("value")), col("event_id"))
          .as("_v"))
        .select(col("user_id"), col("t_us"),
          col("_v.event_id").as("c_event_id"),
          col("_v.value").as("c_value"))
      graft.ops.AsofJoin.asofBackward(probe, ref, "user_id", "t_us", "t_us",
          Seq("c_event_id", "c_value"), tolerance = Some(3600000000L))
        .orderBy(col("event_id"))
    },

    // ---- compaction / OPTIMIZE planning ----------------------------
    // Per source partition, walk documents in doc_id order and cut a
    // new output file whenever the running byte total crosses the
    // target: file_seq = floor(bytes_before / target). One shuffle on
    // source; the running sum is the per-partition window prefix sum
    // (rows preceding), identical machinery to x4_seq_pack. Output is
    // the planned manifest: per (source, file_seq) the doc count,
    // byte total, and fill ratio — what an OPTIMIZE job would then
    // execute with a repartitionByRange write.
    "x8_compaction_plan" -> { (s, d) =>
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      documents(s, d)
        .select(col("source"), col("doc_id"), col("n_chars"))
        .withColumn("before",
          coalesce(sum(col("n_chars")).over(w), lit(0L)))
        .withColumn("file_seq", expr(s"before DIV $TargetBytes"))
        .groupBy(col("source"), col("file_seq"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast(LongType).as("bytes"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .withColumn("fill_ratio",
          (col("bytes").cast(DoubleType) / lit(TargetBytes.toDouble))
            .cast(DoubleType))
        .orderBy(col("source"), col("file_seq"))
    })

  val oracles: Map[String, String] = Map(
    "x7_weighted_sample" ->
      s"""WITH k AS (SELECT doc_id, source, n_chars,
             CAST(list_sum(list_transform(generate_series(1, 12),
               p -> (CAST(strpos('0123456789abcdef',
                 substring(md5(CAST(doc_id AS VARCHAR)), p, 1))
                 AS BIGINT) - 1) << (4 * (12 - p)))) AS BIGINT) AS v
           FROM documents),
         r AS (SELECT doc_id, source, n_chars,
             ln(CAST(v + 1 AS DOUBLE) / 281474976710656.0)
               / CAST(n_chars AS DOUBLE) AS es_key
           FROM k)
         SELECT doc_id, source, n_chars FROM r
         ORDER BY es_key DESC, doc_id ASC LIMIT $WsK""",
    "x1_snapshot_diff" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
             event_type, value FROM events),
         sa AS (SELECT user_id, value AS value_old FROM (
             SELECT user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY us DESC, event_id DESC) AS rn
             FROM e WHERE us <= $CutoffUs1)
           WHERE rn = 1 AND event_type <> 'error'),
         sb AS (SELECT user_id, value AS value_new FROM (
             SELECT user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY us DESC, event_id DESC) AS rn
             FROM e)
           WHERE rn = 1 AND event_type <> 'error'),
         j AS (SELECT coalesce(sa.user_id, sb.user_id) AS user_id,
             value_old, value_new
           FROM sa FULL OUTER JOIN sb ON sa.user_id = sb.user_id)
         SELECT user_id,
           CASE WHEN value_old IS NULL THEN 'I'
                WHEN value_new IS NULL THEN 'D'
                WHEN value_old <> value_new THEN 'U' END AS op,
           value_old, value_new
         FROM j
         WHERE (CASE WHEN value_old IS NULL THEN 'I'
                WHEN value_new IS NULL THEN 'D'
                WHEN value_old <> value_new THEN 'U' END) IS NOT NULL
         ORDER BY user_id""",
    "asof_forward" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t_us,
             event_type, value FROM events),
         v AS (SELECT event_id, user_id, t_us FROM e
           WHERE event_type = 'view'),
         p_raw AS (SELECT user_id, t_us, event_id, value,
             row_number() OVER (PARTITION BY user_id, t_us
               ORDER BY event_id DESC) AS rn
           FROM e WHERE event_type = 'purchase'),
         p AS (SELECT user_id, t_us AS p_us, event_id AS p_event_id,
             value AS p_value FROM p_raw WHERE rn = 1)
         SELECT v.event_id, v.user_id, v.t_us, p.p_event_id, p.p_value
         FROM v ASOF LEFT JOIN p
           ON v.user_id = p.user_id AND v.t_us <= p.p_us
         ORDER BY v.event_id""",
    "asof_tolerance" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t_us,
             event_type, value FROM events),
         pu AS (SELECT event_id, user_id, t_us FROM e
           WHERE event_type = 'purchase'),
         c_raw AS (SELECT user_id, t_us, event_id, value,
             row_number() OVER (PARTITION BY user_id, t_us
               ORDER BY event_id DESC) AS rn
           FROM e WHERE event_type = 'click'),
         c AS (SELECT user_id, t_us AS c_us, event_id AS c_event_id,
             value AS c_value FROM c_raw WHERE rn = 1),
         j AS (SELECT pu.event_id, pu.user_id, pu.t_us,
             c.c_us, c.c_event_id, c.c_value
           FROM pu ASOF LEFT JOIN c
             ON pu.user_id = c.user_id AND pu.t_us >= c.c_us)
         SELECT event_id, user_id, t_us,
           CASE WHEN c_us >= t_us - 3600000000 THEN c_event_id END
             AS c_event_id,
           CASE WHEN c_us >= t_us - 3600000000 THEN c_value END AS c_value
         FROM j ORDER BY event_id""",
    "x8_compaction_plan" ->
      s"""WITH b AS (SELECT source, doc_id, n_chars,
             CAST(coalesce(sum(n_chars) OVER (PARTITION BY source
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS before
           FROM documents),
         f AS (SELECT source, doc_id, n_chars,
             CAST(before // $TargetBytes AS BIGINT) AS file_seq FROM b)
         SELECT source, file_seq,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS bytes,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc,
           CAST(CAST(sum(n_chars) AS DOUBLE) / ${TargetBytes}.0 AS DOUBLE)
             AS fill_ratio
         FROM f GROUP BY source, file_seq
         ORDER BY source, file_seq""")
}
