package graft.queries

import graft.Tables._
import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Round-10 batch 7: join-size estimation, kNN-graph construction,
  * URL-canonicalization dedup, and class rebalancing — all with
  * FULL-equality DuckDB oracles.
  *
  *  - `x6_cms_join_est`: count-min-sketch INNER-PRODUCT join-size
  *    estimation (the CBO primitive: estimate |R ⋈ S| before paying
  *    the shuffle). Both sides' key frequencies fold into d×w counter
  *    grids; est = min over depth of Σ_j R[i][j]·S[i][j], always ≥
  *    the exact size. Counters and estimate are exact BIGINTs, the
  *    bucket hashes are md5-derived — the whole sketch replays in
  *    SQL next to the exact answer.
  *  - `x3_knn_graph`: k-nearest-neighbor GRAPH over the embedding
  *    table (every vector's top-3 in-block neighbors by exact
  *    cosine) — the SemDeDup/clustering precursor. Pair cosines are
  *    computed once per unordered pair and mirrored across both
  *    directions; ranking ties break on neighbor id.
  *  - `x2_url_dedup`: canonical-URL dedup — synthesized crawl URLs
  *    with case-noise hosts, default ports, tracking queries and
  *    fragments; canonicalization via Spark's `parse_url` (HOST
  *    drops the port) + lower-cased host + path; keep-min per
  *    canonical key. The oracle RECONSTRUCTS the canonical form from
  *    the raw fields, so the compare proves the extraction
  *    semantics, not a mirrored regex.
  *  - `x7_class_balance`: label-rebalancing plan (oversampling to
  *    the majority class): per label repeat factor + remainder, with
  *    the remainder copies deterministically chosen by md5 hash rank
  *    — the training-mix counterpart of `x7_temperature_sample`.
  *
  * Scale: cms_join_est is two map-side d×w-bounded aggregates + a
  * d×w join (the grids broadcast; nothing scales with row count but
  * the two scans). knn_graph bounds the quadratic stage inside label
  * blocks (the IVF posture) and the per-node top-k is a bounded-heap
  * window (TopKPerKey-rewritable). url_dedup is map-only parsing +
  * one keyed aggregate. class_balance is one count aggregate plus a
  * per-label hash-rank window on the remainder picks.
  */
object Parity20 {
  type Q = (SparkSession, String) => DataFrame

  private val CmsD = 4   // sketch depth
  private val CmsW = 64  // sketch width
  private val KnnK = 3

  val queries: Map[String, Q] = Map(
    // ---- CMS inner-product join-size estimation --------------------
    "x6_cms_join_est" -> { (s, d) =>
      def grid(df: DataFrame, key: String): DataFrame =
        df.select(col(key).cast(LongType).as("k"))
          .select(col("k"),
            explode(array((0 until CmsD).map(lit): _*)).as("i"))
          .select(col("i"),
            (graft.ops.TextOps.polyHash60(
              concat(col("i").cast("string"), lit("|"),
                col("k").cast("string"))) % CmsW).as("b"))
          .groupBy(col("i"), col("b")).agg(count(lit(1)).as("c"))
      val gr = grid(customer(s, d), "c_nationkey")
        .withColumnRenamed("c", "cr")
      val gs = grid(supplier(s, d), "s_nationkey")
        .withColumnRenamed("c", "cs")
      val est = gr.join(gs, Seq("i", "b"))
        .groupBy(col("i")).agg(sum(col("cr") * col("cs")).as("e"))
        .agg(min(col("e")).as("est_join_size"))
      val cr = customer(s, d).groupBy(col("c_nationkey").as("k"))
        .agg(count(lit(1)).as("nr"))
      val cs = supplier(s, d).groupBy(col("s_nationkey").as("k"))
        .agg(count(lit(1)).as("ns"))
      val exact = cr.join(cs, Seq("k"))
        .agg(sum(col("nr") * col("ns")).as("exact_join_size"))
      val sizes = customer(s, d).agg(count(lit(1)).as("n_r"))
        .crossJoin(supplier(s, d).agg(count(lit(1)).as("n_s")))
      sizes.crossJoin(exact).crossJoin(est)
        .select(col("n_r"), col("n_s"),
          col("exact_join_size"), col("est_join_size"))
    },

    // ---- kNN graph construction ------------------------------------
    "x3_knn_graph" -> { (s, d) =>
      val pairs = Similarity.cosinePairsBlocked(embeddings(s, d),
        tau = -2.0, blockCol = "label")
      val sym = pairs.select(col("id_a").as("src"), col("id_b").as("dst"),
          col("cosine_sim"))
        .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst"),
          col("cosine_sim")))
      val w = Window.partitionBy(col("src"))
        .orderBy(col("cosine_sim").desc, col("dst"))
      sym.withColumn("rk", row_number().over(w).cast(LongType))
        .filter(col("rk") <= KnnK)
        .select(col("src").as("vec_id"), col("dst").as("neighbor_id"),
          col("rk"), col("cosine_sim"))
        .orderBy(col("vec_id"), col("rk"))
    },

    // ---- canonical-URL dedup ---------------------------------------
    "x2_url_dedup" -> { (s, d) =>
      val raw = documents(s, d).select(col("doc_id"), concat(
          lit("https://"),
          when(col("doc_id") % 2 === 0, col("source"))
            .otherwise(upper(col("source"))),
          lit(".Example.COM"),
          when(col("doc_id") % 5 === 0, lit(":443")).otherwise(lit("")),
          lit("/doc/"), expr("doc_id DIV 80"),
          when(col("doc_id") % 2 === 1,
            concat(lit("?utm_source=track"), col("doc_id") % 4))
            .otherwise(lit("")),
          when(col("doc_id") % 3 === 0, lit("#frag")).otherwise(lit("")))
          .as("url"))
      raw.select(col("doc_id"),
          concat(lower(expr("parse_url(url, 'HOST')")),
            expr("parse_url(url, 'PATH')")).as("canonical_url"))
        .groupBy(col("canonical_url"))
        .agg(min(col("doc_id")).as("keeper"),
          count(lit(1)).as("n_variants"),
          sum(col("doc_id")).as("ids_sum"))
        .orderBy(col("canonical_url"))
    },

    // ---- class-rebalancing plan ------------------------------------
    "x7_class_balance" -> { (s, d) =>
      val emb = embeddings(s, d)
      val cnt = emb.groupBy(col("label")).agg(count(lit(1)).as("cnt"))
      val tgt = cnt.agg(max(col("cnt")).as("target"))
      val plan = cnt.crossJoin(broadcast(tgt))
        .select(col("label"), col("cnt"),
          expr("target DIV cnt").as("repeat_factor"),
          (col("target") % col("cnt")).as("remainder"),
          col("target"))
      val w = Window.partitionBy(col("label"))
        .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      val extras = emb.select(col("label"), col("vec_id"))
        .withColumn("rk", row_number().over(w))
        .join(plan.select(col("label"), col("remainder")), Seq("label"))
        .filter(col("rk") <= col("remainder"))
        .groupBy(col("label")).agg(sum(col("vec_id")).as("extra_ids_sum"))
      plan.join(extras, Seq("label"), "left")
        .select(col("label").cast(LongType).as("label"), col("cnt"),
          col("repeat_factor"), col("remainder"),
          coalesce(col("extra_ids_sum"), lit(0L)).as("extra_ids_sum"),
          col("target").as("total_after"))
        .orderBy(col("label"))
    })

  private def hx(e: String): String =
    s"""CAST(list_sum(list_transform(generate_series(1, 15),
       p -> (CAST(strpos('0123456789abcdef', substring(md5($e), p, 1))
         AS BIGINT) - 1) << (4 * (15 - p)))) AS BIGINT)"""

  val oracles: Map[String, String] = Map(
    "x6_cms_join_est" ->
      s"""WITH dep AS (SELECT unnest(generate_series(0, ${CmsD - 1})) AS i),
         gr AS (SELECT i,
             ${hx("CAST(i AS VARCHAR) || '|' || CAST(c_nationkey AS VARCHAR)")}
               % $CmsW AS b,
             CAST(count(*) AS BIGINT) AS cr
           FROM customer CROSS JOIN dep GROUP BY 1, 2),
         gs AS (SELECT i,
             ${hx("CAST(i AS VARCHAR) || '|' || CAST(s_nationkey AS VARCHAR)")}
               % $CmsW AS b,
             CAST(count(*) AS BIGINT) AS cs
           FROM supplier CROSS JOIN dep GROUP BY 1, 2),
         est AS (SELECT CAST(min(e) AS BIGINT) AS est_join_size FROM
           (SELECT i, sum(cr * cs) AS e FROM gr JOIN gs USING (i, b)
            GROUP BY i)),
         cr2 AS (SELECT c_nationkey AS k, count(*) AS nr
           FROM customer GROUP BY 1),
         cs2 AS (SELECT s_nationkey AS k, count(*) AS ns
           FROM supplier GROUP BY 1),
         ex AS (SELECT CAST(sum(nr * ns) AS BIGINT) AS exact_join_size
           FROM cr2 JOIN cs2 USING (k)),
         sz AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM customer)
             AS n_r,
           (SELECT CAST(count(*) AS BIGINT) FROM supplier) AS n_s)
         SELECT n_r, n_s, exact_join_size, est_join_size
         FROM sz CROSS JOIN ex CROSS JOIN est""",
    "x3_knn_graph" ->
      s"""WITH ex AS (SELECT vec_id, label,
             CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(18,6)) AS x,
             generate_subscripts(embedding, 1) AS i
           FROM embeddings),
         n2 AS (SELECT vec_id, sum(x * x) AS n2 FROM ex GROUP BY vec_id),
         dots AS (SELECT a.vec_id AS src, b.vec_id AS dst,
             sum(a.x * b.x) AS d
           FROM ex a JOIN ex b
             ON a.i = b.i AND a.label = b.label AND a.vec_id <> b.vec_id
           GROUP BY a.vec_id, b.vec_id),
         cos AS (SELECT src, dst,
             CAST(CAST(d AS DOUBLE) /
               (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
               AS DOUBLE) AS cosine_sim
           FROM dots
           JOIN n2 na ON dots.src = na.vec_id
           JOIN n2 nb ON dots.dst = nb.vec_id),
         rk AS (SELECT src, dst, cosine_sim,
             CAST(row_number() OVER (PARTITION BY src
               ORDER BY cosine_sim DESC, dst) AS BIGINT) AS rk
           FROM cos)
         SELECT src AS vec_id, dst AS neighbor_id, rk, cosine_sim
         FROM rk WHERE rk <= $KnnK ORDER BY vec_id, rk""",
    "x2_url_dedup" ->
      """SELECT lower(CASE WHEN doc_id % 2 = 0 THEN source
               ELSE upper(source) END || '.Example.COM')
             || '/doc/' || CAST(doc_id // 80 AS VARCHAR) AS canonical_url,
           min(doc_id) AS keeper,
           CAST(count(*) AS BIGINT) AS n_variants,
           CAST(sum(doc_id) AS BIGINT) AS ids_sum
         FROM documents GROUP BY 1 ORDER BY canonical_url""",
    "x7_class_balance" ->
      """WITH cnt AS (SELECT label, CAST(count(*) AS BIGINT) AS cnt
           FROM embeddings GROUP BY label),
         tgt AS (SELECT max(cnt) AS target FROM cnt),
         plan AS (SELECT label, cnt, target // cnt AS repeat_factor,
             target % cnt AS remainder, target
           FROM cnt CROSS JOIN tgt),
         rk AS (SELECT label, vec_id,
             row_number() OVER (PARTITION BY label
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
           FROM embeddings),
         ex AS (SELECT rk.label,
             CAST(sum(rk.vec_id) AS BIGINT) AS extra_ids_sum
           FROM rk JOIN plan ON rk.label = plan.label
           WHERE rk.rk <= plan.remainder GROUP BY rk.label)
         SELECT CAST(plan.label AS BIGINT) AS label, cnt,
           CAST(repeat_factor AS BIGINT) AS repeat_factor,
           CAST(remainder AS BIGINT) AS remainder,
           coalesce(ex.extra_ids_sum, 0) AS extra_ids_sum,
           CAST(target AS BIGINT) AS total_after
         FROM plan LEFT JOIN ex ON plan.label = ex.label
         ORDER BY label""")
}
