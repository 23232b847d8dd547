package graft.queries

import graft.Tables._
import graft.ops.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Round-10 batch 3: corpus monitoring + dedup provenance —
  *
  *  - `x6_source_drift`: contingency (chi-square) drift analysis of
  *    token usage across sources — the corpus-monitoring query that
  *    flags which tokens are most over/under-represented in which
  *    source vs the independence expectation (vocabulary drift,
  *    contamination, template leakage all surface here first).
  *  - `x1_dedup_lineage`: exact dedup WITH provenance — for every
  *    dropped duplicate, the keeper that absorbed it. Dedup that
  *    cannot say what it deleted is unauditable at 100 TB; this is
  *    the lineage side-output every production dedup job writes.
  *
  * Scale: drift is two keyed aggregates (token, source×token) plus a
  * broadcast of the source-marginal frame (|sources| rows); lineage
  * is ONE fingerprint aggregate (min-keeper via map-side combine)
  * joined back — no window, no per-group sort. All counts exact
  * integers; the chi statistic is a single mirrored IEEE chain.
  */
object Parity16 {
  type Q = (SparkSession, String) => DataFrame

  /** Minimum corpus-wide token frequency for a drift cell (stability
    * floor — rare tokens make chi-square explode meaninglessly). */
  private val DriftMinCol = 50L
  private val DriftTopK = 30

  val queries: Map[String, Q] = Map(
    // ---- chi-square source drift -----------------------------------
    // o = observed (source, token) count; e = rowTotal*colTotal/N the
    // independence expectation; chi = (o-e)^2/e. Integer counts
    // throughout; e and chi are one sub/mul/div chain mirrored
    // verbatim in the oracle, so the doubles are bit-identical. The
    // source-marginal frame is |sources| rows (broadcast); the token
    // marginal joins on the token key it was aggregated on — at
    // 100 TB both aggregates are the same one shuffle family any
    // token-count pipeline already runs.
    "x6_source_drift" -> { (s, d) =>
      val tok = documents(s, d)
        .select(col("source"),
          explode(TextOps.tokens(lower(col("text")))).as("tok"))
      val o = tok.groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).as("o"))
      val colT = o.groupBy(col("tok")).agg(sum(col("o")).as("ct"))
        .filter(col("ct") >= DriftMinCol)
      val rowT = o.groupBy(col("source")).agg(sum(col("o")).as("rt"))
      val n = o.agg(sum(col("o")).as("n"))
      o.join(colT, Seq("tok"))
        .join(broadcast(rowT), Seq("source"))
        .crossJoin(broadcast(n))
        .withColumn("e",
          (col("rt") * col("ct")).cast(DoubleType) / col("n").cast(DoubleType))
        .withColumn("chi",
          (col("o").cast(DoubleType) - col("e")) *
            (col("o").cast(DoubleType) - col("e")) / col("e"))
        .withColumn("direction",
          when(col("o").cast(DoubleType) >= col("e"), lit("over"))
            .otherwise(lit("under")))
        .select(col("source"), col("tok"), col("o"), col("ct"),
          col("chi"), col("direction"))
        .orderBy(col("chi").desc, col("source").asc, col("tok").asc)
        .limit(DriftTopK)
    },

    // ---- dedup with lineage ----------------------------------------
    // Fingerprint = md5 of the first 8 tokens (boilerplate-prefix
    // dedup — the shared-header/template key; whole-content dedup is
    // x1_dedup_exact's job and the corpus at gate-SF has no full
    // duplicates). keeper = min doc_id per fingerprint via
    // map-side-combining min() — no row_number window. The lineage
    // table is (dropped, keeper, fingerprint): joining the aggregate
    // back on the fingerprint is the only corpus-scale shuffle, and
    // AQE broadcasts the keeper side when duplicates are sparse.
    "x1_dedup_lineage" -> { (s, d) =>
      val fp = documents(s, d)
        .select(col("doc_id"),
          md5(array_join(slice(
            TextOps.tokens(lower(col("text"))), 1, 8), " ")).as("fp"))
      val keeper = fp.groupBy(col("fp"))
        .agg(min(col("doc_id")).as("keeper_id"),
          count(lit(1)).as("n_copies"))
        .filter(col("n_copies") > 1)
      fp.join(keeper, Seq("fp"))
        .filter(col("doc_id") =!= col("keeper_id"))
        .select(col("doc_id").as("dropped_id"), col("keeper_id"),
          col("fp"), col("n_copies"))
        .orderBy(col("dropped_id"))
    })

  val oracles: Map[String, String] = Map(
    "x6_source_drift" ->
      s"""WITH tok AS (SELECT source,
             unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
           FROM documents),
         o AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS o
           FROM tok GROUP BY source, tok),
         ct AS (SELECT tok, CAST(sum(o) AS BIGINT) AS ct FROM o
           GROUP BY tok HAVING sum(o) >= $DriftMinCol),
         rt AS (SELECT source, CAST(sum(o) AS BIGINT) AS rt FROM o
           GROUP BY source),
         n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o),
         j AS (SELECT o.source, o.tok, o.o, ct.ct,
             CAST(rt.rt * ct.ct AS DOUBLE) / CAST(n.n AS DOUBLE) AS e
           FROM o JOIN ct USING (tok) JOIN rt USING (source) CROSS JOIN n)
         SELECT source, tok, o, ct,
           (CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e AS chi,
           CASE WHEN CAST(o AS DOUBLE) >= e THEN 'over' ELSE 'under' END
             AS direction
         FROM j
         ORDER BY chi DESC, source ASC, tok ASC LIMIT $DriftTopK""",
    "x1_dedup_lineage" ->
      """WITH fp AS (SELECT doc_id,
             md5(array_to_string(
               string_split_regex(trim(lower(text)), '\s+')[1:8], ' '))
               AS fp
           FROM documents),
         k AS (SELECT fp, min(doc_id) AS keeper_id,
             CAST(count(*) AS BIGINT) AS n_copies
           FROM fp GROUP BY fp HAVING count(*) > 1)
         SELECT f.doc_id AS dropped_id, k.keeper_id, f.fp, k.n_copies
         FROM fp f JOIN k USING (fp)
         WHERE f.doc_id <> k.keeper_id
         ORDER BY dropped_id""")
}
