package graft.queries

import graft.Tables._
import graft.ops.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 batch 6: encoding repair (mojibake) — the ftfy-shaped
  * corpus-cleaning pass every web-scale text pipeline runs before
  * anything else (UTF-8 bytes that were somewhere decoded as
  * ISO-8859-1/Windows-1252: "Ã©" for é, "â€™" for a curly quote,
  * doubly-encoded variants of both).
  *
  *  - `x4_mojibake_fix`: plant a non-ASCII suffix on every document,
  *    corrupt one third of the corpus (doc_id % 3) with the Latin-1
  *    misread and one ninth (doc_id % 9) with the DOUBLE misread,
  *    then run [[TextOps.fixMojibake]] over the MIXED corpus. The
  *    repair must (a) restore every corrupted document to its exact
  *    original bytes — the DuckDB oracle recomputes the originals
  *    from scratch and hash-compares — and (b) leave every clean
  *    document untouched, including its real non-Latin-1 chars
  *    (em dash, curly quotes) that a careless "repair" would destroy.
  *    `was_fixed` (output differs from input) must equal exactly the
  *    planted corruption set.
  *
  * Scale posture: detection + repair is all built-in string
  * expressions (rlike gate, encode/decode, is_valid_utf8) — map-only,
  * codegen'd, no shuffle, no UDF; the validity gate runs BEFORE the
  * strict UTF-8 decode (CaseWhen evaluates only the taken branch) so
  * the pass never throws on genuinely binary garbage. MojibakeSpec
  * pins the gate's precision: non-Latin-1 text, ASCII text, and
  * invalid-byte text all pass through untouched.
  */
object Parity70 {
  type Q = (SparkSession, String) => DataFrame

  /** Non-ASCII suffix planted on every doc: two chars that survive a
    * Latin-1 round trip (é, ï) and two that do NOT (curly quotes are
    * above U+00FF) — so clean rows also prove the no-touch path. */
  private val Suffix = " café “naïve” ok"

  val queries: Map[String, Q] = Map(
    "x4_mojibake_fix" -> { (s, d) =>
      val base = documents(s, d).select(col("doc_id"),
        concat(col("text"), lit(Suffix)).as("clean"))
      val wired = base.withColumn("text_in",
        when(col("doc_id") % 9 === 0,
          TextOps.mojibake(TextOps.mojibake(col("clean"))))
          .when(col("doc_id") % 3 === 0, TextOps.mojibake(col("clean")))
          .otherwise(col("clean")))
      wired
        .withColumn("text_fixed", TextOps.fixMojibake(col("text_in")))
        .select(col("doc_id"), col("text_fixed"),
          (col("text_fixed") =!= col("text_in")).as("was_fixed"))
        .orderBy(col("doc_id"))
    })

  val oracles: Map[String, String] = Map(
    "x4_mojibake_fix" ->
      s"""SELECT doc_id, text || '$Suffix' AS text_fixed,
            (doc_id % 3 = 0) AS was_fixed
          FROM documents ORDER BY doc_id"""
  )
}
