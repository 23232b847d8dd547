package graft

object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "time-one")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (name <- args) {
      for (run <- 1 to 3) {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sf)
          .write.format("noop").mode("overwrite").save()
        println(f"[timeone] $name run$run ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
