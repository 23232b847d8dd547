package graft.queries

import graft.Tables._
import graft.ops.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Round-10 batch 8: tokenizer-vocabulary induction and A/B
  * inference — both with FULL-equality DuckDB oracles.
  *
  *  - `x4_bpe_train`: BPE MERGE TRAINING over the corpus — 5 rounds
  *    of "count adjacent token pairs → take the most frequent →
  *    merge every occurrence leftmost-first → recount". This is the
  *    learning half of the tokenizer (x4_bpe_tokens applies a fixed
  *    segmentation); each round's winning pair, its count, and the
  *    post-merge corpus size replay exactly in 5 unrolled CTE steps.
  *    Leftmost-first non-overlap (the aaa→(aa)a case) is island
  *    parity: runs of consecutive match positions keep even offsets
  *    only — a window chain both engines express identically.
  *  - `x6_ab_welch`: Welch's t-test between two event cohorts
  *    (click vs view): exact decimal count/sum/sum-of-squares per
  *    cohort, then ONE mirrored IEEE chain for means, variances,
  *    t statistic and Welch–Satterthwaite dof.
  *
  * Scale: each BPE round is (a) a lead window + pair count aggregate
  * (token-stream-linear, vocab²-bounded output), (b) a global top-1
  * (bounded TakeOrdered), (c) a per-doc window + two hash joins
  * against the (tiny) kept-position set to rewrite the stream. The
  * token stream is lineage-truncated per round (ops/Iter — reliable
  * checkpointing at 100 TB), and the winning pair is a 1-row
  * broadcast, so rounds never touch the driver. ab_welch is one
  * filtered scan with map-side partial aggregates into 2 rows.
  */
object Parity21 {
  type Q = (SparkSession, String) => DataFrame

  private val BpeRounds = 5

  val queries: Map[String, Q] = Map(
    // ---- BPE merge training ----------------------------------------
    "x4_bpe_train" -> { (s, d) =>
      var toks = graft.ops.Iter.truncate(
        documents(s, d).select(col("doc_id"),
            posexplode(TextOps.tokens(lower(col("text")))))
          // 1-based positions, matching the row_number renumbering of
          // later rounds (the run-start parity below relies on p >= 1)
          .select(col("doc_id"), (col("pos") + 1).cast(LongType).as("p"),
            col("col").as("tok")), None)
      var merges = Vector.empty[DataFrame]
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("p"))
      for (r <- 1 to BpeRounds) {
        val withNext = toks.withColumn("nxt", lead(col("tok"), 1).over(wDoc))
        val best = graft.ops.Iter.truncate(
          withNext.filter(col("nxt").isNotNull)
            .groupBy(col("tok"), col("nxt")).agg(count(lit(1)).as("bcnt"))
            .orderBy(col("bcnt").desc, col("tok"), col("nxt")).limit(1)
            .select(col("tok").as("bw1"), col("nxt").as("bw2"),
              col("bcnt")), None)
        // Single pass over the doc_id shuffle: match flag, leftmost-
        // first keep (parity of the offset from the last NON-match
        // position — runs longer than 1 only arise for self-pairs
        // x,x), drop-the-second-token, rewrite, renumber. Every
        // window shares the (doc_id, p) partitioning, so the round
        // is one exchange plus in-partition sorts (an earlier
        // join-shaped rebuild cost 2 extra hash joins and a second
        // shuffle per round: 11 s vs ~5 s at sf0.1).
        val cum = wDoc.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)
        val t2 = withNext.crossJoin(broadcast(best))
          .withColumn("m", col("nxt").isNotNull &&
            col("tok") === col("bw1") && col("nxt") === col("bw2"))
          .withColumn("lastnm",
            max(when(!col("m"), col("p"))).over(cum))
          .withColumn("kept", col("m") &&
            (col("p") - coalesce(col("lastnm"), lit(0L)) - 1) % 2 === 0)
          .withColumn("dropped",
            coalesce(lag(col("kept"), 1).over(wDoc), lit(false)))
          .filter(!col("dropped"))
          .select(col("doc_id"),
            row_number().over(wDoc).cast(LongType).as("p2"),
            when(col("kept"), concat(col("bw1"), lit("_"), col("bw2")))
              .otherwise(col("tok")).as("tok"))
          .withColumnRenamed("p2", "p")
        toks = graft.ops.Iter.truncate(
          t2.select(col("doc_id"), col("p"), col("tok")), None)
        merges = merges :+ best
          .crossJoin(toks.agg(count(lit(1)).as("tokens_after")))
          .select(lit(r.toLong).as("merge_round"), col("bw1").as("w1"),
            col("bw2").as("w2"), col("bcnt").as("pair_count"),
            col("tokens_after"))
      }
      merges.reduce(_ union _).orderBy(col("merge_round"))
    },

    // ---- Welch's t-test between two event cohorts ------------------
    "x6_ab_welch" -> { (s, d) =>
      // micro-unit quantization via floor(v*1e6 + 0.5): the ONLY
      // engine-portable double→fixed-point cut (a double→decimal CAST
      // rounds Spark's shortest-string repr but DuckDB's binary
      // value — they disagree on .5e-6 boundaries). Sums are then
      // exact integers; one mirrored IEEE chain at the end.
      val xm = floor(col("value") * lit(1000000.0) + lit(0.5))
      val agg = events(s, d)
        .filter(col("event_type").isin("click", "view"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(xm).as("sxi"),
          sum((xm * xm).cast("decimal(38,0)")).as("sxxi"))
        .select(col("event_type"), col("n"),
          (col("sxi").cast("double") / lit(1000000.0)).as("sx"),
          (col("sxxi").cast("double") / lit(1000000.0) / lit(1000000.0))
            .as("sxx"))
      val a = agg.filter(col("event_type") === "click")
        .select(col("n").as("n_a"), col("sx").as("sx_a"),
          col("sxx").as("sxx_a"))
      val b = agg.filter(col("event_type") === "view")
        .select(col("n").as("n_b"), col("sx").as("sx_b"),
          col("sxx").as("sxx_b"))
      a.crossJoin(b)
        .withColumn("mean_a", col("sx_a") / col("n_a"))
        .withColumn("mean_b", col("sx_b") / col("n_b"))
        .withColumn("var_a",
          (col("sxx_a") - col("sx_a") * col("sx_a") / col("n_a")) /
            (col("n_a") - 1))
        .withColumn("var_b",
          (col("sxx_b") - col("sx_b") * col("sx_b") / col("n_b")) /
            (col("n_b") - 1))
        .withColumn("se2",
          col("var_a") / col("n_a") + col("var_b") / col("n_b"))
        .select(col("n_a"), col("n_b"), col("mean_a"), col("mean_b"),
          col("var_a"), col("var_b"),
          ((col("mean_a") - col("mean_b")) / sqrt(col("se2")))
            .as("t_stat"),
          ((col("se2") * col("se2")) /
            ((col("var_a") / col("n_a")) * (col("var_a") / col("n_a")) /
              (col("n_a") - 1) +
              (col("var_b") / col("n_b")) * (col("var_b") / col("n_b")) /
                (col("n_b") - 1))).as("welch_dof"))
    })

  /** One unrolled BPE round as a chain of window layers, each
    * referencing ONLY the previous layer once. DuckDB 1.0 inlines
    * CTEs at every reference (the MATERIALIZED hint is not honored),
    * so a join-shaped round that touches the prior round's stream
    * 3-4 times re-evaluates the entire history — measured ~15×
    * per round. The single-reference form keeps the unrolled oracle
    * linear; values are identical to the Spark loop. */
  private def bpeStep(r: Int): String = {
    val prev = s"t${r - 1}"
    s"""w$r AS (SELECT doc_id, p, tok,
         lead(tok) OVER (PARTITION BY doc_id ORDER BY p) AS nxt
       FROM $prev),
     c$r AS (SELECT doc_id, p, tok, nxt,
         count(*) OVER (PARTITION BY tok, nxt) AS cnt
       FROM w$r),
     g$r AS (SELECT doc_id, p, tok, nxt,
         first_value(tok) OVER ow AS bw1,
         first_value(nxt) OVER ow AS bw2,
         first_value(cnt) OVER ow AS bcnt
       FROM c$r WINDOW ow AS (
         ORDER BY (nxt IS NOT NULL) DESC, cnt DESC, tok, nxt
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
     h$r AS (SELECT doc_id, p, tok, bw1, bw2, bcnt,
         (nxt IS NOT NULL AND tok = bw1 AND nxt = bw2) AS m
       FROM g$r),
     j$r AS (SELECT doc_id, p, tok, bw1, bw2, bcnt, m,
         sum(CASE WHEN m THEN 0 ELSE 1 END) OVER (
           PARTITION BY doc_id ORDER BY p
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
       FROM h$r),
     k$r AS (SELECT doc_id, p, tok, bw1, bw2, bcnt,
         (m AND (row_number() OVER (PARTITION BY doc_id, grp, m
             ORDER BY p) - 1) % 2 = 0) AS kept
       FROM j$r),
     e$r AS (SELECT doc_id, p, tok, bw1, bw2, bcnt, kept,
         coalesce(lag(kept) OVER (PARTITION BY doc_id ORDER BY p),
           false) AS dropped
       FROM k$r),
     t$r AS (SELECT doc_id,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY p)
           AS BIGINT) AS p,
         CASE WHEN kept THEN bw1 || '_' || bw2 ELSE tok END AS tok,
         bw1, bw2, bcnt
       FROM e$r WHERE NOT dropped),
     mrg$r AS (SELECT CAST($r AS BIGINT) AS merge_round,
         min(bw1) AS w1, min(bw2) AS w2,
         CAST(min(bcnt) AS BIGINT) AS pair_count,
         CAST(count(*) AS BIGINT) AS tokens_after
       FROM t$r)"""
  }

  val oracles: Map[String, String] = Map(
    "x4_bpe_train" ->
      s"""WITH tk AS (SELECT doc_id,
             string_split_regex(trim(lower(text)), '\\s+') AS t
           FROM documents),
         t0 AS MATERIALIZED (SELECT doc_id, CAST(i AS BIGINT) AS p, t[i] AS tok
           FROM tk, unnest(generate_series(1, len(t))) AS u(i)),
         ${(1 to BpeRounds).map(bpeStep).mkString(",\n         ")}
         SELECT * FROM (${(1 to BpeRounds)
        .map(r => s"SELECT * FROM mrg$r").mkString(" UNION ALL ")})
         ORDER BY merge_round""",
    "x6_ab_welch" ->
      """WITH q AS (SELECT event_type,
             CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS xm
           FROM events WHERE event_type IN ('click', 'view')),
         agg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(xm) AS DOUBLE) / 1000000.0 AS sx,
             CAST(sum(CAST(xm * xm AS DECIMAL(38,0))) AS DOUBLE)
               / 1000000.0 / 1000000.0 AS sxx
           FROM q GROUP BY event_type),
         a AS (SELECT n AS n_a, sx AS sx_a, sxx AS sxx_a FROM agg
           WHERE event_type = 'click'),
         b AS (SELECT n AS n_b, sx AS sx_b, sxx AS sxx_b FROM agg
           WHERE event_type = 'view'),
         c AS (SELECT *, sx_a / n_a AS mean_a, sx_b / n_b AS mean_b,
             (sxx_a - sx_a * sx_a / n_a) / (n_a - 1) AS var_a,
             (sxx_b - sx_b * sx_b / n_b) / (n_b - 1) AS var_b
           FROM a CROSS JOIN b),
         e AS (SELECT *, var_a / n_a + var_b / n_b AS se2 FROM c)
         SELECT n_a, n_b, mean_a, mean_b, var_a, var_b,
           (mean_a - mean_b) / sqrt(se2) AS t_stat,
           (se2 * se2) /
             ((var_a / n_a) * (var_a / n_a) / (n_a - 1) +
              (var_b / n_b) * (var_b / n_b) / (n_b - 1)) AS welch_dof
         FROM e""")
}
