package graft.queries

import graft.Tables._
import graft.ops.{Connect, Dedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Round-11 batch 18: contamination-proof dataset splitting —
  * FULL-equality DuckDB oracle.
  *
  *  - `x7_cluster_split`: train/val/test assignment at the NEAR-DUP
  *    CLUSTER level — every document maps to its connected component
  *    under the exact-Jaccard near-dup relation (the x2_cc_dedup
  *    machinery), and the split hash is taken on the COMPONENT
  *    representative, so a document and all its near-duplicates land
  *    on the same side by construction. Splitting per document
  *    (x7_split_assign) leaks: a train doc's near-twin in test
  *    inflates eval — the exact contamination x7_leakage_audit
  *    measures temporally, prevented here structurally. The output
  *    carries the audited invariant: `violations` counts near-dup
  *    pairs straddling splits and must be 0 — not asserted offline
  *    but COMPUTED in-query and hash-checked by the oracle.
  *
  * Scale posture: the pair relation and CC are the dedup pipeline's
  * own (inverted index + O(log d) rounds); the split is a map-only
  * hash on the component id; the violation audit is one self-join of
  * the pair relation against the assignment — pair-relation-sized,
  * not corpus².
  */
object Parity49 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "x7_cluster_split" -> { (s, d) =>
      val pairs = Dedup.ngramJaccardPairs(documents(s, d), tau = 0.5,
        blockCol = "lang")
      val comp = Connect.connectedComponents(pairs, "id_a", "id_b")
      val assigned = documents(s, d)
        .join(comp, col("doc_id") === col("id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("comp"), col("doc_id")).as("comp"))
        .withColumn("h", substring(md5(col("comp").cast("string")), 1, 2))
        .withColumn("split",
          when(col("h") < "cd", "train")
            .when(col("h") < "e6", "val")
            .otherwise("test"))
      // the audited invariant: near-dup pairs may never straddle
      val viol = pairs
        .join(assigned.select(col("doc_id").as("id_a"),
          col("split").as("sa")), Seq("id_a"))
        .join(assigned.select(col("doc_id").as("id_b"),
          col("split").as("sb")), Seq("id_b"))
        .agg(sum(when(col("sa") =!= col("sb"), 1L).otherwise(0L))
          .as("violations"))
      assigned.groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("comp")).as("n_clusters"))
        .crossJoin(broadcast(viol))
        .select(col("split"), col("n_docs"), col("n_clusters"),
          coalesce(col("violations"), lit(0L)).as("violations"),
          round(col("n_docs").cast(DoubleType) /
            sum(col("n_docs")).over(), 6).as("share"))
        .orderBy(col("split"))
    })

  val oracles: Map[String, String] = Map(
    "x7_cluster_split" -> s"""
      WITH RECURSIVE pairs AS (${ExtQueries.oracles("x2_ngram_jaccard")}),
      edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                UNION SELECT id_b, id_a FROM pairs),
      nodes AS (SELECT DISTINCT a AS id FROM edges),
      reach(id, lbl) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.id),
      comp AS (SELECT id, min(lbl) AS comp FROM reach GROUP BY id),
      assigned AS (SELECT d.doc_id,
          coalesce(c.comp, d.doc_id) AS comp,
          substring(md5(CAST(coalesce(c.comp, d.doc_id) AS VARCHAR)),
            1, 2) AS h
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
      sp AS (SELECT doc_id, comp,
          CASE WHEN h < 'cd' THEN 'train'
               WHEN h < 'e6' THEN 'val'
               ELSE 'test' END AS split
        FROM assigned),
      viol AS (SELECT CAST(coalesce(sum(CASE WHEN a.split <> b.split
            THEN 1 ELSE 0 END), 0) AS BIGINT) AS violations
        FROM pairs p
        JOIN sp a ON p.id_a = a.doc_id
        JOIN sp b ON p.id_b = b.doc_id),
      agg AS (SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(count(DISTINCT comp) AS BIGINT) AS n_clusters
        FROM sp GROUP BY split),
      tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS nt FROM agg)
      SELECT agg.split, agg.n_docs, agg.n_clusters, viol.violations,
        round(CAST(agg.n_docs AS DOUBLE) / CAST(tot.nt AS DOUBLE), 6)
          AS share
      FROM agg CROSS JOIN viol CROSS JOIN tot
      ORDER BY agg.split"""
  )
}
