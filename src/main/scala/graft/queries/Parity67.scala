package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14: schema evolution across file generations — the lake-ops
  * capability the S-row inventory lacked: long-lived tables GROW
  * columns, and a reader must reconcile file generations written
  * under different schemas without rewriting history.
  *
  * `s16_schema_evolution`: generation 1 lands (k, name); generation 2
  * adds `mktsegment`. The read is Spark's native parquet schema merge
  * (`mergeSchema=true` — footer-level union of field sets), so
  * gen-1 rows surface the added column as NULL and the oracle replays
  * the union from the canonical table. A `gen` partition-style column
  * tags provenance so the null pattern is hash-checked per
  * generation, not just in aggregate.
  *
  * Scale posture: schema merge reads FOOTERS, not data — at 100 TB
  * the merge cost is one metadata pass (and production tables pin the
  * merged schema in a catalog after evolution rather than re-merging
  * per query; `VersionedTable`'s log entries are where that schema
  * would live — noted there). The data path is unchanged parquet
  * scanning with pruning/pushdown intact (Parity67Spec pins the
  * added-column filter pushes down and gen-1 files still prune).
  */
object Parity67 {
  type Q = (SparkSession, String) => DataFrame

  /** Stage the two generations under `dir` and read them back
    * through the merged schema. */
  private[graft] def evolvedRead(s: SparkSession, d: String,
      dir: String): DataFrame = {
    Scratch.clean(s, dir)
    val c = customer(s, d)
    c.filter(col("c_custkey") % 10 === 1)
      .select(col("c_custkey").as("k"), col("c_name").as("name"),
        lit(1L).as("gen"))
      .write.mode("overwrite").parquet(s"$dir/gen1")
    c.filter(col("c_custkey") % 10 === 2)
      .select(col("c_custkey").as("k"), col("c_name").as("name"),
        col("c_mktsegment").as("mktsegment"), lit(2L).as("gen"))
      .write.mode("overwrite").parquet(s"$dir/gen2")
    s.read.option("mergeSchema", "true")
      .parquet(s"$dir/gen1", s"$dir/gen2")
  }

  val queries: Map[String, Q] = Map(
    "s16_schema_evolution" -> { (s, d) =>
      val dir = Scratch.dir("p67", "evo", d)
      evolvedRead(s, d, dir)
        .select(col("k"), col("name"), col("mktsegment"), col("gen"))
        .orderBy(col("k"))
    })

  val oracles: Map[String, String] = Map(
    "s16_schema_evolution" ->
      """SELECT c_custkey AS k, c_name AS name,
           CAST(NULL AS VARCHAR) AS mktsegment, CAST(1 AS BIGINT) AS gen
         FROM customer WHERE c_custkey % 10 = 1
         UNION ALL
         SELECT c_custkey AS k, c_name AS name, c_mktsegment AS mktsegment,
           CAST(2 AS BIGINT) AS gen
         FROM customer WHERE c_custkey % 10 = 2
         ORDER BY k"""
  )
}
