package graft.queries

import graft.Tables._
import graft.ops.{Connect, Dedup, Similarity, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-2 coverage batch #3: the last two classic TPC-H shapes
  * expressible on the testdata (Q16 NOT-IN + count-distinct; Q21's
  * double-correlated EXISTS / NOT EXISTS, decorrelated into semi/anti
  * joins with inequality conditions) and two dedup APPLICATIONS (the
  * pair queries exist in ExtQueries; these are the keep/drop
  * compactions a pipeline actually runs).
  */
object Parity6 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Q16 (adapted): distinct supplier count per brand, excluding
    // negative-balance suppliers. The NOT IN set is a broadcast
    // anti-join (s_suppkey is non-null, so left_anti == null-aware
    // NOT IN here — the divergence is pinned in SemanticsSpec).
    "q16_supplier_cnt" -> { (s, d) =>
      val bad = supplier(s, d).filter(col("s_acctbal") < 0)
        .select(col("s_suppkey"))
      lineitem(s, d)
        .join(broadcast(part(s, d).filter(col("p_type") =!= "PROMO")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    },
    // Q21 (adapted; "late" = shipped > 60 days after the order date):
    // suppliers whose line was late in a multi-supplier order where NO
    // other supplier was late. Both correlated subqueries decorrelate
    // into ONE per-order aggregate over the joined fact:
    //   EXISTS(other supplier)       ⟺ |distinct suppliers(order)| > 1
    //   NOT EXISTS(other late supp)  ⟺ |distinct late supps(order)| = 1
    // The distinct-supplier sets are collect_sets with BOUNDED state
    // (TPC-H orders have ≤ 7 lines, and generally |supps per order| is
    // small at any scale), so this is one fact-fact join + one
    // aggregate that REUSES the join's orderkey partitioning — no
    // extra shuffle — where the previous shape scanned lineitem three
    // times through four shuffles.
    "q21_waiting" -> { (s, d) =>
      val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS")
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"), late.as("is_late"))
        .groupBy(col("l_orderkey"))
        .agg(collect_set(when(col("is_late"), col("l_suppkey"))).as("late_s"),
          collect_set(col("l_suppkey")).as("all_s"))
        .filter(size(col("late_s")) === 1 && size(col("all_s")) > 1)
        .select(element_at(col("late_s"), 1).as("lsupp"))
        .join(broadcast(supplier(s, d)), col("lsupp") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
    },
    // Keep-BEST exact dedup: one survivor per content fingerprint,
    // preferring the longest text (then lowest id) — the compaction
    // step after x1_dedup_exact's group census.
    "x1_dedup_best" -> { (s, d) =>
      val w = Window.partitionBy(col("fp"))
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      documents(s, d)
        .select(col("doc_id"), col("n_chars"),
          TextOps.fingerprint(col("text")).as("fp"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("fp"), col("doc_id").as("keep_id"), col("n_chars"))
    },
    // Transitive near-dup clustering: pairwise exact-Jaccard edges →
    // connected components (iterative min-label propagation) → every
    // document labelled with its duplicate-cluster id. This is what
    // one-round dedup cannot do: chains a~b~c collapse into ONE
    // component even though a and c are not directly similar.
    "x2_cc_dedup" -> { (s, d) =>
      val pairs = Dedup.ngramJaccardPairs(documents(s, d), tau = 0.5,
        blockCol = "lang")
      val comp = Connect.connectedComponents(pairs, "id_a", "id_b")
      documents(s, d)
        .join(comp, col("doc_id") === col("id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("comp"), col("doc_id")).as("comp"))
    },
    // The same clustering through the large-star/small-star algorithm
    // (O(log diameter) rounds — the billion-edge posture): identical
    // output contract as x2_cc_dedup, checked against the same
    // recursive-CTE oracle, so both CC variants are oracle-pinned on
    // real near-dup edges.
    "x2_cc_largestar" -> { (s, d) =>
      val pairs = Dedup.ngramJaccardPairs(documents(s, d), tau = 0.5,
        blockCol = "lang")
      val comp = Connect.connectedComponentsLargeStar(pairs, "id_a", "id_b")
      documents(s, d)
        .join(comp, col("doc_id") === col("id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("comp"), col("doc_id")).as("comp"))
    },
    // Embedding near-dup dedup: drop every vector with a cosine >= tau
    // neighbour at a smaller id inside its label block — the
    // embedding-space compaction (exact pairs; the ANN path generates
    // the same candidates at scale).
    "x2_embed_dedup" -> { (s, d) =>
      val drops = Similarity
        .cosinePairsBlocked(embeddings(s, d), tau = 0.3, blockCol = "label")
        .select(col("id_b").as("vec_id")).distinct()
      embeddings(s, d)
        .join(drops, Seq("vec_id"), "left_anti")
        .select(col("vec_id"), col("label"))
    })

  val oracles: Map[String, String] = Map(
    "q16_supplier_cnt" ->
      """SELECT p_brand, count(DISTINCT l_suppkey) AS supplier_cnt
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_type <> 'PROMO'
           AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                 WHERE s_acctbal < 0)
         GROUP BY p_brand""",
    "q21_waiting" ->
      """WITH late AS (SELECT DISTINCT l_orderkey AS lo, l_suppkey AS lsupp
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY),
         allsup AS (SELECT DISTINCT l_orderkey AS ao, l_suppkey AS asupp
           FROM lineitem)
         SELECT s_name, count(*) AS numwait
         FROM late l1 JOIN supplier ON l1.lsupp = s_suppkey
         WHERE EXISTS (SELECT 1 FROM allsup a
                       WHERE a.ao = l1.lo AND a.asupp <> l1.lsupp)
           AND NOT EXISTS (SELECT 1 FROM late l2
                           WHERE l2.lo = l1.lo AND l2.lsupp <> l1.lsupp)
         GROUP BY s_name""",
    "x1_dedup_best" ->
      """WITH f AS (SELECT doc_id, n_chars,
           md5(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp
           FROM documents),
         r AS (SELECT fp, doc_id, n_chars,
             row_number() OVER (PARTITION BY fp
               ORDER BY n_chars DESC, doc_id ASC) AS rn FROM f)
         SELECT fp, doc_id AS keep_id, n_chars FROM r WHERE rn = 1""",
    "x2_cc_dedup" -> s"""
      WITH RECURSIVE pairs AS (${ExtQueries.oracles("x2_ngram_jaccard")}),
      edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                UNION SELECT id_b, id_a FROM pairs),
      nodes AS (SELECT DISTINCT a AS id FROM edges),
      reach(id, lbl) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.id),
      comp AS (SELECT id, min(lbl) AS comp FROM reach GROUP BY id)
      SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS comp
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.id""",
    "x2_cc_largestar" -> s"""
      WITH RECURSIVE pairs AS (${ExtQueries.oracles("x2_ngram_jaccard")}),
      edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                UNION SELECT id_b, id_a FROM pairs),
      nodes AS (SELECT DISTINCT a AS id FROM edges),
      reach(id, lbl) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.id),
      comp AS (SELECT id, min(lbl) AS comp FROM reach GROUP BY id)
      SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS comp
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.id""",
    "x2_embed_dedup" ->
      """WITH ex AS (SELECT vec_id, label,
             CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(18,6)) AS x,
             generate_subscripts(embedding, 1) AS i
           FROM embeddings),
         n2 AS (SELECT vec_id, sum(x * x) AS n2 FROM ex GROUP BY vec_id),
         dots AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.x * b.x) AS d
           FROM ex a JOIN ex b
             ON a.i = b.i AND a.label = b.label AND a.vec_id < b.vec_id
           GROUP BY a.vec_id, b.vec_id),
         drops AS (SELECT DISTINCT id_b FROM dots
           JOIN n2 na ON id_a = na.vec_id
           JOIN n2 nb ON id_b = nb.vec_id
           WHERE CAST(CAST(d AS DOUBLE) /
             (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
             AS DOUBLE) >= 0.3)
         SELECT vec_id, label FROM embeddings
         WHERE vec_id NOT IN (SELECT id_b FROM drops)""")
}
