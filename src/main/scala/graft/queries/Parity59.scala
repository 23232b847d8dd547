package graft.queries

import graft.Tables._
import graft.ops.{Connect, Dedup, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Round-12 batch 8: the end-to-end curation pipeline — the proof
  * that the curation stages COMPOSE, not just pass in isolation.
  *
  *  - `x7_curation_e2e`: raw documents → Gopher rule gate (the exact
  *    `x4_gopher_rules` stage, reused by function) → exact dedup
  *    (md5 content key, smallest doc_id survives) → near-dup soft
  *    weighting on the survivors (banded n-gram Jaccard pairs →
  *    connected components → 1e6 DIV cluster-size, the
  *    `x2_soft_dedup` stage) → per-source EFFECTIVE token supply
  *    (Σ wc·w_micro DIV 1e6 — duplicates contribute one doc's worth)
  *    → data-constrained epoch allocation (the `x7_epoch_plan` stage
  *    on the curated supply). One FULL DuckDB oracle chains all five
  *    stages, so a change to ANY stage that shifts the composed
  *    result — a gate threshold, a dedup tie-break, a CC label, an
  *    allocator DIV — goes red here even if its unit row stays green.
  *
  * Scale posture: the composition adds NO new join shapes — it is the
  * pinned stages back to back. The gate and dedup shrink the corpus
  * before the (quadratic-candidate-prone) near-dup stage runs — the
  * ordering a production pipeline uses for exactly that reason — and
  * the allocator runs on the per-source frame with unpartitioned
  * windows.
  */
object Parity59 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "x7_curation_e2e" -> { (s, d) =>
      val docs = documents(s, d)
      // stage 1: rule gate
      val gate = Parity56.gopherRules(docs).filter(col("pass") === 1)
        .select("doc_id", "wc")
      // stage 2: exact dedup among gated docs (content md5, min id)
      val keep = docs.join(gate, "doc_id")
        .groupBy(md5(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      val surv = docs.join(keep, "doc_id")
      // stage 3: near-dup soft weights on the survivors
      val pairs = Dedup.ngramJaccardPairs(surv, tau = 0.5,
        blockCol = "lang")
      val comp = Connect.connectedComponents(pairs, "id_a", "id_b")
      val dc = surv.select("doc_id", "source")
        .join(comp, col("doc_id") === col("id"), "left_outer")
        .select(col("doc_id"), col("source"),
          coalesce(col("comp"), col("doc_id")).as("comp"))
      val sz = dc.groupBy("comp").agg(count(lit(1)).as("csize"))
      val wdoc = dc.join(broadcast(sz), Seq("comp"))
        .join(gate, "doc_id")
        .select(col("doc_id"), col("source"), col("wc"),
          expr("1000000 DIV csize").as("w_micro"))
      // stage 4: per-source effective token supply
      val src = wdoc.groupBy("source")
        .agg(count(lit(1)).cast(LongType).as("n_docs"),
          expr("CAST(sum(wc * w_micro) DIV 1000000 AS BIGINT)")
            .as("toks_eff"))
      // stage 5: data-constrained epoch allocation on the curated
      // supply (the x7_epoch_plan allocator, same mixture/caps)
      src.withColumn("w_tgt", TextOps.polyHash60(col("source")) % 151 + 50)
        .withColumn("budget", expr("3 * (sum(toks_eff) OVER ())"))
        .withColumn("alloc",
          expr("(budget * w_tgt) DIV (sum(w_tgt) OVER ())"))
        .withColumn("cap", expr("4 * toks_eff"))
        .withColumn("base", least(col("alloc"), col("cap")))
        .withColumn("capped", (col("alloc") > col("cap")).cast(LongType))
        .withColumn("extra",
          expr("""((sum(alloc - base) OVER ()) * (cap - base))
                 DIV greatest(sum(cap - base) OVER (), 1)"""))
        .withColumn("final_alloc",
          least(col("cap"), col("base") + col("extra")))
        .withColumn("epochs_milli",
          expr("(final_alloc * 1000) DIV greatest(toks_eff, 1)"))
        .select(col("source"), col("n_docs"), col("toks_eff"),
          col("alloc").cast(LongType).as("alloc"), col("capped"),
          col("final_alloc").cast(LongType).as("final_alloc"),
          col("epochs_milli").cast(LongType).as("epochs_milli"))
        .orderBy("source")
    })

  /** DuckDB replay of `TextOps.polyHash60`. */
  private def hx15(e: String): String = OracleSql.hx15(e)

  val oracles: Map[String, String] = Map(
    "x7_curation_e2e" -> s"""
      WITH RECURSIVE
      tok AS (SELECT d.doc_id, t.tok
        FROM documents d,
        unnest(string_split_regex(trim(lower(d.text)), '\\s+')) AS t(tok)),
      t2 AS (SELECT doc_id,
          string_split_regex(trim(lower(text)), '\\s+') AS toks
        FROM documents),
      base AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS wc,
          CAST(sum(length(tok)) AS BIGINT) AS chars,
          CAST(count(DISTINCT CASE WHEN tok IN ('the', 'a', 'and',
              'of', 'to', 'in', 'is', 'it', 'for', 'on')
            THEN tok END) AS BIGINT) AS n_stop
        FROM tok GROUP BY doc_id),
      gc AS (SELECT doc_id, gram, glen, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS gram,
            length(toks[i]) + length(toks[i+1]) AS glen
          FROM t2, unnest(range(1, len(toks))) AS u(i))
        GROUP BY doc_id, gram, glen),
      rep AS (SELECT gc.doc_id,
          CAST(max(cnt * glen * 1000 // chars) AS BIGINT) AS rep_milli
        FROM gc JOIN base USING (doc_id) GROUP BY gc.doc_id),
      gate AS (SELECT base.doc_id, wc
        FROM base LEFT JOIN rep USING (doc_id)
        WHERE wc BETWEEN 30 AND 100000
          AND (chars * 1000) // wc BETWEEN 3000 AND 10000
          AND n_stop >= 2 AND COALESCE(rep_milli, 0) <= 200),
      keep AS (SELECT min(d.doc_id) AS doc_id
        FROM documents d JOIN gate ON d.doc_id = gate.doc_id
        GROUP BY md5(d.text)),
      surv AS (SELECT d.* FROM documents d JOIN keep USING (doc_id)),
      sh AS (SELECT doc_id, lang,
          list_distinct(CASE WHEN length(t) >= 3
            THEN list_transform(generate_series(1, length(t) - 2),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
            ELSE CAST([] AS VARCHAR[]) END) AS s
        FROM (SELECT doc_id, lang,
            string_split_regex(trim(text), '\\s+') AS t FROM surv)),
      pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE length(a.s) > 0 AND length(b.s) > 0
          AND CAST(CAST(length(list_intersect(a.s, b.s)) AS DOUBLE) /
               (length(a.s) + length(b.s)
                - length(list_intersect(a.s, b.s))) AS DOUBLE) >= 0.5),
      edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                UNION SELECT id_b, id_a FROM pairs),
      nodes AS (SELECT DISTINCT a AS id FROM edges),
      reach(id, lbl) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.id),
      comp AS (SELECT id, min(lbl) AS comp FROM reach GROUP BY id),
      dc AS (SELECT s.doc_id, s.source, coalesce(c.comp, s.doc_id) AS comp
        FROM surv s LEFT JOIN comp c ON s.doc_id = c.id),
      sz AS (SELECT comp, CAST(count(*) AS BIGINT) AS csize
        FROM dc GROUP BY comp),
      wdoc AS (SELECT dc.doc_id, dc.source, g.wc,
          1000000 // sz.csize AS w_micro
        FROM dc JOIN sz USING (comp) JOIN gate g ON dc.doc_id = g.doc_id),
      src AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(wc * w_micro) // 1000000 AS BIGINT) AS toks_eff
        FROM wdoc GROUP BY source),
      wt AS (SELECT source, n_docs, toks_eff,
          (${hx15("source")}) % 151 + 50 AS w_tgt,
          3 * (sum(toks_eff) OVER ()) AS budget FROM src),
      al AS (SELECT *, (budget * w_tgt) // (sum(w_tgt) OVER ()) AS alloc,
          4 * toks_eff AS cap FROM wt),
      bs AS (SELECT *, least(alloc, cap) AS bse,
          CAST(alloc > cap AS BIGINT) AS capped FROM al),
      rd AS (SELECT *, ((sum(alloc - bse) OVER ()) * (cap - bse))
            // greatest(sum(cap - bse) OVER (), 1) AS extra FROM bs)
      SELECT source, n_docs, toks_eff, CAST(alloc AS BIGINT) AS alloc,
        capped, CAST(least(cap, bse + extra) AS BIGINT) AS final_alloc,
        CAST((least(cap, bse + extra) * 1000)
          // greatest(toks_eff, 1) AS BIGINT) AS epochs_milli
      FROM rd ORDER BY source"""
  )
}
