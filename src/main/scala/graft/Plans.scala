package graft

/** Dump formatted physical plans for headline queries to stdout /
  * target/plans — the plan-quality audit loop (pushed filters,
  * broadcast joins, codegen spans). */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q1_agg", "q3_top_revenue", "q5_region_revenue", "q6_filter_agg",
      "mart_join_union", "a2_union_distinct", "x2_minhash_lsh",
      "x3_knn_bruteforce", "x5_sessionize")
    new java.io.File("target/plans").mkdirs()
    names.foreach { n =>
      val plan = SparkEntry.queries(n)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"target/plans/$n.txt"), plan)
      println(s"=== $n ===")
    }
    spark.stop()
  }
}
