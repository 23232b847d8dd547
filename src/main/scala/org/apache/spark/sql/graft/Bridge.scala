package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into `private[sql]` constructors needed to expose a
  * custom logical operator through the public Dataset API (the same
  * device third-party Spark extensions use; no Spark internals are
  * modified). */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Rebuild a checkpointed Dataset's LogicalRDD leaf with CAPPED
    * origin statistics. Spark copies the source plan's stats through
    * (local)checkpoint (`LogicalRDD.fromDataset`), so in an iterative
    * operator the per-round self-join SQUARES sizeInBytes round over
    * round — after ~25 truncated rounds the stats are BigIntegers
    * with millions of digits and every later checkpoint burns MINUTES
    * in Toom-Cook multiplication inside the stats visitor (found
    * live: the contraction list-rank expansion pinned one core for
    * 20+ min on BigInteger.multiply). DROPPING the stats fixes the
    * blow-up but also forgets that a small iterative state is small —
    * Catalyst then stops broadcasting the fixpoint joins (measured:
    * scc_tiers 8.2 → 28.2 s). CAPPING keeps accurate small estimates
    * (broadcast planning intact) while bounding every propagated
    * value, so the per-round product can never leave the cheap
    * long-arithmetic range. Output partitioning and ordering are
    * preserved (msg-arm co-partitioning relies on them). */
  def capStats(df: DataFrame,
      capBytes: Long = 1L << 40): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.Statistics
    import org.apache.spark.sql.execution.LogicalRDD
    val qe = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution
    qe.analyzed match {
      case lr: LogicalRDD =>
        val st = lr.computeStats()
        val capped =
          if (st.sizeInBytes <= BigInt(capBytes)) st
          else Statistics(sizeInBytes = BigInt(capBytes),
            rowCount = st.rowCount.map(_.min(BigInt(capBytes))))
        ofRows(df.sparkSession, LogicalRDD(
          lr.output, lr.rdd, lr.outputPartitioning, lr.outputOrdering,
          lr.isStreaming, lr.stream)(
          df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
          Some(capped),
          // carry the origin constraints too (non-null/filter facts
          // Catalyst uses for filter inference) — only the SIZE
          // estimate needed capping
          Some(lr.constraints)))
      case _ => df
    }
  }
}
