package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, InterpretedOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator Catalyst extension (SURVEY.md custom-op preference
  * (c)): top-k rows per key WITHOUT sorting whole partitions.
  *
  * The built-in formulation — `row_number().over(Window.partitionBy(
  * key).orderBy(ord))` then `filter(rn <= k)` — shuffles on the key
  * and then SORTS every partition fully (O(n log n), full spill
  * surface). This operator keeps a bounded k-heap per key in a hash
  * map: same single shuffle (declared via ClusteredDistribution, so
  * Spark plans the exchange), O(n log k) work, O(keys·k) memory.
  *
  * Ordering must be total (include a tie-breaker column) for
  * deterministic output. Registered through the public
  * `spark.experimental.extraStrategies` hook.
  */
case class TopKPerKeyNode(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyNode =
    copy(child = c)
}

case class TopKPerKeyExec(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] =
    TopKPerKey.heapPass(child.execute(), child.output, keys, order, k)

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

/** Map-side PARTIAL top-k: the same bounded-heap pass with NO
  * required distribution, run BEFORE any key exchange. Each input
  * partition independently keeps at most k rows per key, so a
  * following [[TopKPerKeyNode]] (or rank window) shuffles at most
  * k · (partitions a key appears in) rows per key instead of the
  * full candidate stream — the classic two-phase top-k combiner
  * (correct because a row outside its partition's per-key top-k can
  * never be in the global top-k). */
case class TopKPerKeyPartialNode(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(
      c: LogicalPlan): TopKPerKeyPartialNode = copy(child = c)
}

case class TopKPerKeyPartialExec(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override protected def doExecute(): RDD[InternalRow] =
    TopKPerKey.heapPass(child.execute(), child.output, keys, order, k)

  override protected def withNewChildInternal(
      c: SparkPlan): TopKPerKeyPartialExec = copy(child = c)
}

object TopKStrategy extends org.apache.spark.sql.classic.Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case TopKPerKeyPartialNode(keys, order, k, child) =>
      TopKPerKeyPartialExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {
  /** Shared bounded-heap pass: at most k rows per key per input
    * partition, O(n log k), O(keys·k) memory. */
  private[plans] def heapPass(rdd: RDD[InternalRow],
      childOutput: Seq[Attribute], keyExprs: Seq[Expression],
      sortOrder: Seq[SortOrder], kk: Int): RDD[InternalRow] =
    rdd.mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = new InterpretedOrdering(sortOrder, childOutput)
      // heap head = worst kept row (reverse of the target ordering)
      val heapCmp = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int =
          ord.compare(b, a)
      }
      val heaps = new java.util.HashMap[UnsafeRow,
        java.util.PriorityQueue[UnsafeRow]]()
      while (it.hasNext) {
        val row = it.next().asInstanceOf[UnsafeRow]
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](kk, heapCmp)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < kk) {
          heap.add(row.copy())
        } else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().asScala.iterator
        .flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)

  private def planFor(df: DataFrame, keyCols: Seq[String],
      orderKeys: Seq[(String, Boolean)])
      : (LogicalPlan, Seq[Expression], Seq[SortOrder]) = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }
    val plan = df.queryExecution.analyzed
    def attr(c: String): Attribute =
      plan.output.find(_.name.equalsIgnoreCase(c)).getOrElse(
        sys.error(s"no column $c in ${plan.output.map(_.name)}"))
    val keyExprs: Seq[Expression] = keyCols.map(attr)
    val sortOrder: Seq[SortOrder] = orderKeys.map { case (c, desc) =>
      SortOrder(attr(c),
        if (desc) org.apache.spark.sql.catalyst.expressions.Descending
        else Ascending)
    }
    (plan, keyExprs, sortOrder)
  }

  /** Public API: top-k rows per key, ranked lexicographically by
    * `orderKeys` — (columnName, descending) pairs; include a
    * tie-breaker column for determinism. SortOrders are built from
    * plan attributes directly (Column-derived SortOrder nodes carry
    * non-serializable column-node origins). */
  def topKPerKey(df: DataFrame, keyCols: Seq[String],
      orderKeys: Seq[(String, Boolean)], k: Int): DataFrame = {
    val (plan, keyExprs, sortOrder) = planFor(df, keyCols, orderKeys)
    org.apache.spark.sql.graft.Bridge.ofRows(df.sparkSession,
      TopKPerKeyNode(keyExprs, sortOrder, k, plan))
  }

  /** Two-phase top-k: a map-side partial pass (no exchange; caps the
    * stream at k rows per key per partition) feeding the exact keyed
    * pass (one exchange over the capped stream). Use when the
    * candidate stream is much larger than keys·k — e.g. ANN candidate
    * generation, where the join emits O(n · listSize) scored pairs
    * but only keys·k survive. */
  def topKPerKeyTwoPhase(df: DataFrame, keyCols: Seq[String],
      orderKeys: Seq[(String, Boolean)], k: Int): DataFrame = {
    val (plan, keyExprs, sortOrder) = planFor(df, keyCols, orderKeys)
    val partial = org.apache.spark.sql.graft.Bridge.ofRows(df.sparkSession,
      TopKPerKeyPartialNode(keyExprs, sortOrder, k, plan))
    topKPerKey(partial, keyCols, orderKeys, k)
  }
}
