package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-11 batch 16: scalable surrogate-key assignment —
  * FULL-equality DuckDB oracle.
  *
  *  - `x1_surrogate_keys`: assign dense sequential ids in key order
  *    WITHOUT the naive global window (`row_number() OVER (ORDER BY
  *    k)` plans an Exchange SinglePartition — one executor sorts the
  *    world, the classic warehouse-loader scaling wall). The
  *    scalable shape: range-repartition on the key, rank WITHIN each
  *    partition (sorts are partition-local), compute per-partition
  *    row counts, prefix-sum them into offsets (a partition-count-
  *    sized window — metadata), and add. The result equals the
  *    global dense rank REGARDLESS of where the range boundaries
  *    fall (offsets are derived from actual counts), which is
  *    exactly what the oracle checks with the naive formulation.
  *    PlanShapeSpec pins the absence of a SinglePartition exchange
  *    on the data path.
  *
  * Scale posture: one range shuffle (sampled boundaries, the
  * x8_total_sort machinery) + partition-local sorts + a ≤ nPartition
  * row offset join — the id assignment a 100 TB dimension load runs.
  */
object Parity47 {
  type Q = (SparkSession, String) => DataFrame

  private val RangeParts = 16

  val queries: Map[String, Q] = Map(
    "x1_surrogate_keys" -> { (s, d) =>
      val src = customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"))
        .repartitionByRange(RangeParts, col("c_custkey"))
        .withColumn("pid", spark_partition_id())
      // partition-LOCAL rank: the window partitions by pid, so no
      // executor ever sorts more than its own range
      val local = src.withColumn("rn", row_number().over(
        Window.partitionBy(col("pid")).orderBy(col("c_custkey")))
        .cast("long"))
      // offsets: a <= RangeParts-row relation — metadata, not data
      val offsets = local.groupBy(col("pid"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("off", coalesce(sum(col("cnt")).over(
          Window.orderBy(col("pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("pid"), col("off"))
      local.join(broadcast(offsets), Seq("pid"))
        .select(col("c_custkey"), col("c_nationkey"),
          (col("off") + col("rn")).as("sk"))
        .orderBy(col("sk"))
    })

  val oracles: Map[String, String] = Map(
    "x1_surrogate_keys" ->
      """SELECT c_custkey, c_nationkey,
           CAST(row_number() OVER (ORDER BY c_custkey) AS BIGINT) AS sk
         FROM customer ORDER BY sk"""
  )
}
