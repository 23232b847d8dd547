package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.TopKPerKey

/** Custom TopKPerKey physical operator == the window+filter
  * formulation, on real data and on edge cases. */
class TopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def windowTopK(df: org.apache.spark.sql.DataFrame,
      key: String, order: Seq[org.apache.spark.sql.Column], k: Int) = {
    val w = Window.partitionBy(col(key)).orderBy(order: _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k).drop("_rn")
  }

  test("top-3 orders per customer equals window formulation") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    val custom = TopKPerKey.topKPerKey(orders, Seq("o_custkey"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), 3)
    val builtin = windowTopK(orders, "o_custkey",
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
    assert(custom.count() == builtin.count())
    assert(custom.exceptAll(builtin).count() == 0)
    assert(builtin.exceptAll(custom).count() == 0)
  }

  test("k larger than group size returns whole groups") {
    val nation = Tables.nation(spark, "/root/testdata/sf0.001")
    val custom = TopKPerKey.topKPerKey(nation, Seq("n_regionkey"),
      Seq(("n_nationkey", false)), 1000)
    assert(custom.count() == nation.count())
  }

  test("two-phase top-k == window formulation; partial pass caps " +
      "pre-exchange rows") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
      .repartition(7) // several map partitions so the partial pass matters
    val custom = TopKPerKey.topKPerKeyTwoPhase(orders, Seq("o_custkey"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), 3)
    val builtin = windowTopK(orders, "o_custkey",
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
    assert(custom.count() == builtin.count())
    assert(custom.exceptAll(builtin).count() == 0)
    assert(builtin.exceptAll(custom).count() == 0)
    // both heap passes present (partial BELOW the key exchange),
    // still no sort/window
    val plan = custom.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyPartial"))
    assert(plan.replace("TopKPerKeyPartial", "").contains("TopKPerKey"))
    assert(plan.indexOf("TopKPerKeyPartial") > plan.indexOf("Exchange hash"),
      "partial pass must sit below the key exchange")
    assert(!plan.contains("WindowExec") && !plan.toLowerCase.contains("sortexec"))
  }

  test("plan contains the custom exec and a single exchange") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    val custom = TopKPerKey.topKPerKey(orders, Seq("o_custkey"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), 3)
    custom.count() // force planning/execution
    val plan = custom.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"))
    assert(!plan.contains("WindowExec") && !plan.toLowerCase.contains("sortexec"))
  }
}
