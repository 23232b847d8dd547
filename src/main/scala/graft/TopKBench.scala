package graft
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
object TopKBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val orders = Tables.orders(spark, "/root/testdata/sf0.1")
    def t(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[topk] $label%-12s ${(System.nanoTime()-t0)/1e9}%6.2f s")
    }
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t("window")(orders.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= 3).drop("_rn"))
    t("custom-heap")(graft.plans.TopKPerKey.topKPerKey(orders,
      Seq("o_custkey"), Seq(("o_totalprice", true), ("o_orderkey", false)), 3))
    spark.stop()
  }
}
