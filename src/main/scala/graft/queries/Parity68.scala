package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14: TYPE WIDENING across file generations — the conflict
  * case s16's add-column evolution cannot express. A long-lived
  * ingest narrows-then-outgrows numeric types (an `acct` column
  * lands as INT for years, then overflows and later files carry
  * BIGINT); parquet schema merge REFUSES such generations ("Failed
  * to merge incompatible data types", Parity68Spec pins the refusal),
  * so the table is unreadable as-is — rewriting history at 100 TB is
  * not an option.
  *
  * `s17_type_widening`: the reconciling reader — each generation is
  * read under its OWN file schema and cast to the widest type in the
  * lattice (int32 → int64 here; the Delta "type widening" feature
  * shape), then unioned by name. Casts are widening-only, so the
  * union is lossless and the oracle replays it from the canonical
  * table. The widest-type decision is per-column metadata (file
  * footers), not data.
  *
  * Scale posture: one footer pass to discover per-generation schemas,
  * then N plain scans with a cast in the projection — pruning and
  * pushdown intact per generation (the cast sits above the scan;
  * filters on the widened column push down POST-cast semantics via
  * the per-generation native type). At 100 TB the widest-schema
  * verdict lives in the catalog (VersionedTable log), computed once
  * at commit time, exactly like s16's merged schema.
  */
object Parity68 {
  type Q = (SparkSession, String) => DataFrame

  /** Stage two generations whose `acct` column types CONFLICT
    * (gen1 INT, gen2 BIGINT), then read them reconciled-to-widest. */
  private[graft] def stage(s: SparkSession, d: String, dir: String): Unit = {
    Scratch.clean(s, dir)
    val c = customer(s, d)
    // gen 1: acct in cents as INT (the historical narrow type)
    c.filter(col("c_custkey") % 10 === 3)
      .select(col("c_custkey").as("k"),
        (col("c_acctbal") * 100).cast("int").as("acct"),
        lit(1L).as("gen"))
      .write.mode("overwrite").parquet(s"$dir/gen1")
    // gen 2: the outgrown BIGINT form (values beyond int range)
    c.filter(col("c_custkey") % 10 === 4)
      .select(col("c_custkey").as("k"),
        ((col("c_acctbal") * 100).cast("bigint") + 10000000000L)
          .as("acct"),
        lit(2L).as("gen"))
      .write.mode("overwrite").parquet(s"$dir/gen2")
  }

  /** The reconciling reader: per-generation scans cast to the widest
    * type, unioned by name. */
  private[graft] def widenedRead(s: SparkSession, dir: String): DataFrame = {
    val gens = Seq(s"$dir/gen1", s"$dir/gen2").map(s.read.parquet(_))
    // widest type in the lattice per conflicted column — here the
    // int32/int64 pair widens to long; the decision is schema
    // metadata, no data pass
    val widest = "bigint"
    gens.map(g => g.withColumn("acct", col("acct").cast(widest)))
      .reduce(_.unionByName(_))
  }

  val queries: Map[String, Q] = Map(
    "s17_type_widening" -> { (s, d) =>
      val dir = Scratch.dir("p68", "widen", d)
      stage(s, d, dir)
      widenedRead(s, dir)
        .select(col("k"), col("acct"), col("gen"))
        .orderBy(col("k"))
    })

  val oracles: Map[String, String] = Map(
    // trunc() on the SQL side: Spark's double->integral cast
    // truncates toward zero while DuckDB's rounds — the trunc makes
    // both engines run the identical IEEE multiply-then-truncate
    "s17_type_widening" ->
      """SELECT c_custkey AS k,
           CAST(CAST(trunc(c_acctbal * 100) AS INTEGER) AS BIGINT) AS acct,
           CAST(1 AS BIGINT) AS gen
         FROM customer WHERE c_custkey % 10 = 3
         UNION ALL
         SELECT c_custkey AS k,
           CAST(trunc(c_acctbal * 100) AS BIGINT) + 10000000000 AS acct,
           CAST(2 AS BIGINT) AS gen
         FROM customer WHERE c_custkey % 10 = 4
         ORDER BY k"""
  )
}
