package graft.queries

import graft.Tables._
import graft.ops.{Sessionize, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Round-4 extension batch 2: interval algebra, record linkage, and
  * language-model-shaped corpus statistics —
  *
  *  - `x5_interval_merge`: merge overlapping per-key intervals
  *    (coverage/union, the complement of gaps-and-islands
  *    sessionization — reference's session semantics generalized to
  *    interval union; cf. reference dbt models building per-game
  *    spans, `/root/reference/dbt/models/`).
  *  - `x2_editdist_join`: blocked Levenshtein self-join for record
  *    linkage / canonicalization (the fuzzy-name dedup step of entity
  *    resolution; extends the X2 near-dup family to edit distance).
  *  - `x4_ngram_lm`: bigram conditional-probability table — the
  *    counting core of an n-gram LM over the corpus.
  *  - `x7_split_assign`: deterministic hash-based train/val/test
  *    split assignment with per-split checksums.
  *
  * Scale rules as every earlier batch: shuffles only on the natural
  * keys, vocabulary-sized relations broadcast, exact integer
  * arithmetic (single final IEEE divisions only), no collect(), and a
  * deterministic total ORDER BY on every output (the driver's
  * correctness hash is row-order-sensitive).
  */
object Parity9 {
  type Q = (SparkSession, String) => DataFrame

  /** Interval half-width for x5_interval_merge: each event opens a
    * 30-minute activity interval. */
  private val SpanUs = 1800L * 1000000L
  /** Levenshtein threshold for x2_editdist_join. */
  private val MaxDist = 2
  /** Bigram table size for x4_ngram_lm. */
  private val LmTopK = 30

  val queries: Map[String, Q] = Map(
    // ---- interval union / coverage merge ---------------------------
    // Each event opens a [ts, ts+30min) activity interval; merge
    // overlapping intervals per user and report how many disjoint
    // activity spans remain, their total coverage, and the longest
    // one. The classic sweep: a running max(end) over the
    // start-ordered stream marks interval starts (start > furthest
    // end seen so far), a prefix sum of those flags numbers the
    // islands. Everything — both windows and both aggregates — sits
    // on the user_id partitioning, so the whole chain is ONE shuffle
    // family; per-user state in the window is a single long. All
    // event-time math stays in integer microseconds (exact; the
    // driver's ns timestamps never touch doubles).
    "x5_interval_merge" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("st"))
      eventsNs(s, d)
        .select(col("user_id"), Sessionize.nsToUs(col("ts")).as("st"))
        .withColumn("en", col("st") + SpanUs)
        .withColumn("prev_max_en",
          max(col("en")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("new_isl",
          when(col("prev_max_en").isNull || col("st") > col("prev_max_en"),
            1L).otherwise(0L))
        .withColumn("isl", sum(col("new_isl")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("isl"))
        .agg(min(col("st")).as("ist"), max(col("en")).as("ien"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("ien") - col("ist")).cast(LongType).as("covered_us"),
          max(col("ien") - col("ist")).cast(LongType).as("max_span_us"))
        .orderBy(col("user_id"))
    },

    // ---- blocked edit-distance record linkage ----------------------
    // Entity-resolution canonicalization: find name pairs within
    // Levenshtein distance 2, candidate-limited to pairs sharing a
    // blocking key (the trailing token — the stable noun of the
    // name). The scale shape: dedup to DISTINCT names first (the name
    // vocabulary is data-bounded, ≪ row count — here 64 names over
    // 20k parts, and the same ratio holds at 100 TB for real entity
    // vocabularies), so the quadratic verify runs inside tiny blocks
    // of an already-tiny relation, never on the fact. Each surviving
    // pair carries both names' part counts for merge weighting.
    "x2_editdist_join" -> { (s, d) =>
      val names = part(s, d)
        .groupBy(col("p_name")).agg(count(lit(1)).as("n_parts"))
        .withColumn("blk", regexp_extract(col("p_name"), "[^ ]+$", 0))
      val a = names.select(col("blk"), col("p_name").as("name1"),
        col("n_parts").as("n1"))
      val b = names.select(col("blk"), col("p_name").as("name2"),
        col("n_parts").as("n2"))
      a.join(b, Seq("blk"))
        .filter(col("name1") < col("name2"))
        .withColumn("dist",
          levenshtein(col("name1"), col("name2")).cast(LongType))
        .filter(col("dist") <= MaxDist)
        .select(col("name1"), col("name2"), col("dist"),
          col("n1"), col("n2"))
        .orderBy(col("name1"), col("name2"))
    },

    // ---- bigram language-model table -------------------------------
    // The counting core of an n-gram LM: corpus bigram counts and the
    // conditional probability p(w2|w1) = c(w1,w2) / Σ_w2' c(w1,w2').
    // Bigram generation is MAP-ONLY: the token array is bound once
    // per row (CollapseProject keeps non-cheap aliases out-of-line,
    // so the split runs once) and zip_with over two slices pairs
    // adjacent tokens without a per-document shuffle — no
    // doc-partitioned window anywhere. One shuffle aggregates
    // (w1,w2); the denominator is a window sum over the already
    // vocabulary²-sized count relation partitioned by w1. The single
    // division happens on exact integer counts in IEEE double —
    // bit-identical in any engine. Top-K by a total order.
    "x4_ngram_lm" -> { (s, d) =>
      val toks = documents(s, d)
        .select(TextOps.tokens(lower(col("text"))).as("toks"))
        .withColumn("n", size(col("toks")))
        .filter(col("n") >= 2)
      val bi = toks
        .select(explode(zip_with(
          slice(col("toks"), lit(1), col("n") - 1),
          slice(col("toks"), lit(2), col("n") - 1),
          (x, y) => struct(x.as("w1"), y.as("w2")))).as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
        .withColumn("tot",
          sum(col("c")).over(Window.partitionBy(col("w1"))).cast(LongType))
        .withColumn("p",
          (col("c").cast(DoubleType) / col("tot").cast(DoubleType))
            .cast(DoubleType))
        .select(col("w1"), col("w2"), col("c"), col("p"))
        .orderBy(col("c").desc, col("w1"), col("w2"))
        .limit(LmTopK)
    },

    // ---- dbt-generic-test data-quality suite -----------------------
    // The reference's declared-but-empty dbt test surface
    // (unique / not_null / relationships / accepted_values) as one
    // report: each check is a single aggregate or anti-join, the
    // suite is a union of one-row frames — a single job, no actions
    // inside. The strict order-status check fires (the testdata has
    // status 'P'), so the report shape covers violations, not only
    // zeros.
    "dq_suite" -> { (s, d) =>
      graft.ops.DqChecks.suite(Seq(
        graft.ops.DqChecks.uniqueKey("unique_orders_pk",
          orders(s, d), Seq("o_orderkey")),
        graft.ops.DqChecks.uniqueKey("unique_lineitem_pk",
          lineitem(s, d), Seq("l_orderkey", "l_linenumber")),
        graft.ops.DqChecks.notNull("not_null_customer_name",
          customer(s, d), "c_name"),
        graft.ops.DqChecks.referentialIntegrity("ri_lineitem_orders",
          lineitem(s, d), "l_orderkey", orders(s, d), "o_orderkey"),
        graft.ops.DqChecks.acceptedValues("accepted_returnflag",
          lineitem(s, d), "l_returnflag", Seq("A", "N", "R")),
        graft.ops.DqChecks.acceptedValues("accepted_orderstatus_strict",
          orders(s, d), "o_orderstatus", Seq("F", "O"))))
    },

    // ---- deterministic train/val/test split ------------------------
    // Hash-based split assignment — the reproducibility contract of a
    // training pipeline: membership depends only on content (first
    // md5 byte: <0xcd train ~80%, <0xe6 val ~10%, else test), never
    // on partitioning, row order, or cluster size, so re-running on
    // different hardware yields byte-identical splits, and new
    // documents never move old ones between splits. Map-only
    // assignment + one tiny 3-group aggregate with exact integer
    // checksums over each split.
    "x7_split_assign" -> { (s, d) =>
      documents(s, d)
        .withColumn("h", substring(md5(col("text")), 1, 2))
        .withColumn("split",
          when(col("h") < "cd", "train")
            .when(col("h") < "e6", "val")
            .otherwise("test"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast(LongType).as("sum_chars"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
        .orderBy(col("split"))
    })

  val oracles: Map[String, String] = Map(
    "x5_interval_merge" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS st,
             epoch_us(ts) + 1800000000 AS en FROM events),
         f AS (SELECT user_id, st, en,
             max(en) OVER (PARTITION BY user_id ORDER BY st
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
           FROM e),
         g AS (SELECT user_id, st, en,
             CASE WHEN pme IS NULL OR st > pme THEN 1 ELSE 0 END AS ni
           FROM f),
         h AS (SELECT user_id, st, en,
             sum(ni) OVER (PARTITION BY user_id ORDER BY st
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
           FROM g),
         i AS (SELECT user_id, isl, min(st) AS ist, max(en) AS ien
           FROM h GROUP BY user_id, isl)
         SELECT user_id, count(*) AS n_intervals,
           CAST(sum(ien - ist) AS BIGINT) AS covered_us,
           CAST(max(ien - ist) AS BIGINT) AS max_span_us
         FROM i GROUP BY user_id ORDER BY user_id""",
    "x2_editdist_join" ->
      """WITH n AS (SELECT p_name, count(*) AS n_parts FROM part
           GROUP BY p_name),
         k AS (SELECT p_name, n_parts,
             regexp_extract(p_name, '[^ ]+$') AS blk FROM n)
         SELECT a.p_name AS name1, b.p_name AS name2,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
           a.n_parts AS n1, b.n_parts AS n2
         FROM k a JOIN k b ON a.blk = b.blk AND a.p_name < b.p_name
         WHERE levenshtein(a.p_name, b.p_name) <= 2
         ORDER BY name1, name2""",
    "x4_ngram_lm" ->
      """WITH t AS (SELECT string_split_regex(trim(lower(text)), '\s+')
             AS toks FROM documents),
         f AS (SELECT toks FROM t WHERE len(toks) >= 2),
         bi AS (SELECT toks[i] AS w1, toks[i + 1] AS w2
           FROM f, unnest(range(1, len(toks))) AS u(i)),
         c AS (SELECT w1, w2, count(*) AS c FROM bi GROUP BY w1, w2),
         w AS (SELECT w1, w2, c,
             CAST(sum(c) OVER (PARTITION BY w1) AS BIGINT) AS tot
           FROM c)
         SELECT w1, w2, c,
           CAST(CAST(c AS DOUBLE) / CAST(tot AS DOUBLE) AS DOUBLE) AS p
         FROM w ORDER BY c DESC, w1, w2 LIMIT 30""",
    "dq_suite" ->
      """SELECT * FROM (
           SELECT 'unique_orders_pk' AS check_name,
             CAST((SELECT count(*) FROM (SELECT o_orderkey FROM orders
               GROUP BY o_orderkey HAVING count(*) > 1)) AS BIGINT)
               AS n_violations
           UNION ALL
           SELECT 'unique_lineitem_pk',
             CAST((SELECT count(*) FROM (SELECT l_orderkey, l_linenumber
               FROM lineitem GROUP BY l_orderkey, l_linenumber
               HAVING count(*) > 1)) AS BIGINT)
           UNION ALL
           SELECT 'not_null_customer_name',
             CAST((SELECT count(*) FROM customer WHERE c_name IS NULL)
               AS BIGINT)
           UNION ALL
           SELECT 'ri_lineitem_orders',
             CAST((SELECT count(*) FROM lineitem l
               LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
               WHERE l.l_orderkey IS NOT NULL AND o.o_orderkey IS NULL)
               AS BIGINT)
           UNION ALL
           SELECT 'accepted_returnflag',
             CAST((SELECT count(*) FROM lineitem
               WHERE l_returnflag NOT IN ('A','N','R')
                  OR l_returnflag IS NULL) AS BIGINT)
           UNION ALL
           SELECT 'accepted_orderstatus_strict',
             CAST((SELECT count(*) FROM orders
               WHERE o_orderstatus NOT IN ('F','O')
                  OR o_orderstatus IS NULL) AS BIGINT))
         ORDER BY check_name""",
    "x7_split_assign" ->
      """WITH a AS (SELECT doc_id, n_chars,
             CASE WHEN substring(md5(text), 1, 2) < 'cd' THEN 'train'
                  WHEN substring(md5(text), 1, 2) < 'e6' THEN 'val'
                  ELSE 'test' END AS split
           FROM documents)
         SELECT split, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
         FROM a GROUP BY split ORDER BY split""")
}
