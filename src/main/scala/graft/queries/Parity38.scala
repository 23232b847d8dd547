package graft.queries

import graft.Tables._
import graft.ops.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Round-11 batch 7: right-to-be-forgotten planning and the
  * inverted-index cost profile — FULL-equality DuckDB oracles.
  *
  *  - `x1_forget_plan`: GDPR/CCPA deletion planning — given a batch
  *    of user ids to forget (a deterministic id-class here), compute
  *    per data file whether it is untouched (`skip`), fully owned by
  *    forgotten users (`drop`), or needs a rewrite (`rewrite`), plus
  *    the affected-row accounting. THE erasure-compliance op for
  *    immutable-file lakes: deletes are file rewrites, and this
  *    relation is exactly the rewrite job's work list (the
  *    x8_compaction_plan posture applied to deletion).
  *  - `x2_df_profile`: shingle document-frequency profile — log2
  *    df-bucket histogram of the corpus's posting lists with each
  *    bucket's Σ df·(df−1)/2 pair-work share. The operational
  *    analysis BEHIND the dfCap knob (`ngramJaccardPairsCapped`):
  *    the s-curve table prices banding, this prices the inverted
  *    index, showing which df decade owns the quadratic pair cost.
  *
  * Scale posture: the forget plan is one broadcast semi-join mark
  * (the forget set is request-batch-sized) plus one file-keyed
  * aggregate — output is file-count rows, the planning relation a
  * 100 TB rewrite job consumes directly. The df profile is the
  * inverted index's (shingle, df) aggregate — vocabulary-sized —
  * re-aggregated to ~30 bucket rows; both shuffles are map-side
  * combinable.
  */
object Parity38 {
  type Q = (SparkSession, String) => DataFrame

  /** events-file model (8192 ids per file). */
  private val FileIds = 8192L
  /** deletion request batch: every 97th user. */
  private val ForgetMod = 97L

  val queries: Map[String, Q] = Map(
    // ---- right-to-be-forgotten rewrite plan ------------------------
    "x1_forget_plan" -> { (s, d) =>
      val ev = events(s, d).select(
        expr(s"event_id DIV $FileIds").as("file_id"), col("user_id"))
      val marked = ev.withColumn("del",
        when(col("user_id") % ForgetMod === 0, 1L).otherwise(0L))
      val perFile = marked.groupBy(col("file_id"))
        .agg(count(lit(1)).as("n_rows"), sum(col("del")).as("n_del"))
        .withColumn("action",
          when(col("n_del") === 0, "skip")
            .when(col("n_del") === col("n_rows"), "drop")
            .otherwise("rewrite"))
      val tot = perFile.agg(
        sum(when(col("action") =!= "skip", 1L).otherwise(0L))
          .as("files_touched"),
        sum(col("n_del")).as("rows_deleted"),
        sum(col("n_rows")).as("rows_total"))
      perFile.crossJoin(broadcast(tot))
        .select(col("file_id"), col("n_rows"), col("n_del"), col("action"),
          col("files_touched"),
          round(col("rows_deleted").cast(DoubleType) /
            col("rows_total").cast(DoubleType), 8).as("pct_deleted"))
        .orderBy(col("file_id"))
    },

    // ---- shingle document-frequency / pair-work profile ------------
    "x2_df_profile" -> { (s, d) =>
      val df = documents(s, d)
        .select(col("doc_id"), TextOps.shingles(col("text"), 3).as("sh"))
        .filter(size(col("sh")) > 0)
        .select(explode(col("sh")).as("g"))
        .groupBy(col("g")).agg(count(lit(1)).as("df"))
      // log2 buckets via bin() bit length (the Hll idiom): bucket =
      // floor(log2 df) with exact integer arithmetic in both engines
      val bucketed = df.select(col("df"),
        (length(bin(col("df"))) - 1).cast("long").as("bucket"),
        expr("df * (df - 1) DIV 2").as("pairs"))
      val agg = bucketed.groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_shingles"), sum(col("df")).as("postings"),
          sum(col("pairs")).as("pair_work"))
      val tot = agg.agg(sum(col("pair_work")).as("total_pairs"))
      agg.crossJoin(broadcast(tot))
        .select(col("bucket"), col("n_shingles"), col("postings"),
          col("pair_work"),
          round(col("pair_work").cast(DoubleType) /
            col("total_pairs").cast(DoubleType), 8).as("pair_share"))
        .orderBy(col("bucket"))
    })

  val oracles: Map[String, String] = Map(
    "x1_forget_plan" ->
      s"""WITH ev AS (SELECT event_id // $FileIds AS file_id, user_id
           FROM events),
         marked AS (SELECT file_id,
             CASE WHEN user_id % $ForgetMod = 0 THEN 1 ELSE 0 END AS del
           FROM ev),
         pf AS (SELECT file_id, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(del) AS BIGINT) AS n_del
           FROM marked GROUP BY file_id),
         pa AS (SELECT file_id, n_rows, n_del,
             CASE WHEN n_del = 0 THEN 'skip'
                  WHEN n_del = n_rows THEN 'drop'
                  ELSE 'rewrite' END AS action
           FROM pf),
         tot AS (SELECT
             CAST(sum(CASE WHEN action <> 'skip' THEN 1 ELSE 0 END)
               AS BIGINT) AS files_touched,
             CAST(sum(n_del) AS BIGINT) AS rows_deleted,
             CAST(sum(n_rows) AS BIGINT) AS rows_total
           FROM pa)
         SELECT file_id, n_rows, n_del, action, files_touched,
           round(CAST(rows_deleted AS DOUBLE) /
             CAST(rows_total AS DOUBLE), 8) AS pct_deleted
         FROM pa CROSS JOIN tot ORDER BY file_id""",
    "x2_df_profile" ->
      """WITH tk AS (SELECT doc_id,
             string_split_regex(trim(text), '\s+') AS t FROM documents),
         sh AS (SELECT doc_id,
             list_distinct(CASE WHEN length(t) >= 3
               THEN list_transform(generate_series(1, length(t) - 2),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
               ELSE CAST([] AS VARCHAR[]) END) AS s
           FROM tk),
         g AS (SELECT unnest(s) AS g FROM sh WHERE length(s) > 0),
         df AS (SELECT g, CAST(count(*) AS BIGINT) AS df FROM g GROUP BY g),
         bucketed AS (SELECT df,
             CAST(length(bin(df)) - 1 AS BIGINT) AS bucket,
             CAST(df * (df - 1) // 2 AS BIGINT) AS pairs
           FROM df),
         agg AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_shingles,
             CAST(sum(df) AS BIGINT) AS postings,
             CAST(sum(pairs) AS BIGINT) AS pair_work
           FROM bucketed GROUP BY bucket),
         tot AS (SELECT CAST(sum(pair_work) AS BIGINT) AS total_pairs
           FROM agg)
         SELECT bucket, n_shingles, postings, pair_work,
           round(CAST(pair_work AS DOUBLE) /
             CAST(total_pairs AS DOUBLE), 8) AS pair_share
         FROM agg CROSS JOIN tot ORDER BY bucket"""
  )
}
