package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Round-10 batch 16: frequency sketches and privacy auditing.
  *
  *  - `x6_heavy_hitters`: Misra–Gries top-token sketch
  *    (functions/MisraGries — the frequency-domain mergeable
  *    summary) checked with the t-digest-style BOUNDED oracle: the
  *    exact top-3 tokens must each appear in the k=64 sketch with
  *    count error ≤ n/(k+1), booleans the oracle requires TRUE
  *    (sketch counts legitimately vary with partition order inside
  *    that bound).
  *  - `x4_kanon`: k-anonymity audit over quasi-identifiers
  *    (lang, source, length bucket) — how many equivalence classes
  *    are smaller than k=5 and how many documents are re-identifiable
  *    through them. The privacy gate a release pipeline runs next to
  *    x4_redact's PII scrub.
  *
  * Scale posture: Misra–Gries is the point — k counters per
  * partial, merged associatively, instead of a full token group-by
  * when only the heavy tail matters (the exact top-3 side here is
  * the ORACLE's scaffolding, not the production path). The k-anon
  * audit is one keyed aggregate over the quasi-identifier tuple +
  * a two-row rollup.
  */
object Parity29 {
  type Q = (SparkSession, String) => DataFrame

  private val MgK = 64
  private val KAnon = 5

  val queries: Map[String, Q] = Map(
    // ---- Misra-Gries heavy hitters --------------------------------
    "x6_heavy_hitters" -> { (s, d) =>
      val toks = documents(s, d)
        .select(explode(graft.ops.TextOps.tokens(lower(col("text"))))
          .as("tok"))
      val sketch = toks.agg(
        graft.functions.MisraGries.misra_gries(s, col("tok"), MgK).as("mg"),
        count(lit(1)).as("n"))
      val exactTop = toks.groupBy(col("tok"))
        .agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("tok")).limit(3)
      exactTop.crossJoin(broadcast(sketch))
        .select(col("tok"), col("exact_cnt"),
          // the sketch entry for this token, if kept
          filter(col("mg"), e => e.getField("item") === col("tok"))
            .as("hit"), col("n"))
        .select(col("tok"), col("exact_cnt"),
          // Misra-Gries guarantees presence only for items with
          // frequency > n/(k+1) — a top-3 token at or under that
          // threshold may legitimately be evicted, so the presence
          // assertion is guarded by the same bound the sketch
          // promises (vacuously true below it); err_in_bound stays
          // the unconditional check
          ((size(col("hit")) === 1) ||
            (col("exact_cnt") <= col("n") / (MgK + 1))).as("in_sketch"),
          (abs(coalesce(element_at(col("hit"), 1).getField("cnt"), lit(0L)) -
            col("exact_cnt")) <= col("n") / (MgK + 1)).as("err_in_bound"))
    },
    // ---- k-anonymity audit ----------------------------------------
    "x4_kanon" -> { (s, d) =>
      val groups = documents(s, d)
        .select(col("lang"), col("source"),
          expr("n_chars DIV 100").as("len_bucket"))
        .groupBy(col("lang"), col("source"), col("len_bucket"))
        .agg(count(lit(1)).as("sz"))
      groups.agg(
        count(lit(1)).as("n_groups"),
        sum(when(col("sz") < KAnon, 1L).otherwise(0L)).as("n_risky_groups"),
        sum(when(col("sz") < KAnon, col("sz")).otherwise(0L))
          .as("n_risky_docs"))
    }
  )

  val oracles: Map[String, String] = Map(
    "x6_heavy_hitters" ->
      """WITH toks AS (
           SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
           FROM documents)
         SELECT tok, count(*) AS exact_cnt,
                TRUE AS in_sketch, TRUE AS err_in_bound
         FROM toks GROUP BY tok
         ORDER BY exact_cnt DESC, tok LIMIT 3""",
    "x4_kanon" ->
      s"""WITH g AS (
            SELECT lang, source, n_chars // 100 AS len_bucket,
                   count(*) AS sz
            FROM documents GROUP BY 1, 2, 3)
          SELECT count(*) AS n_groups,
                 CAST(sum(CASE WHEN sz < $KAnon THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_risky_groups,
                 CAST(sum(CASE WHEN sz < $KAnon THEN sz ELSE 0 END) AS BIGINT)
                   AS n_risky_docs
          FROM g"""
  )
}
