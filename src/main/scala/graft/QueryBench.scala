package graft

/** Time individual harness queries: sbt "runMain graft.QueryBench <sfDir> <name> [name...]"
  * (min of 2 runs each, after one warmup of the first query). */
object QueryBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QueryBench <sfDir> <name> [name...]")
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-querybench")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run(names.head) // warmup (codegen/JIT)
    names.foreach { n =>
      val s = math.min(run(n), run(n))
      println(f"[querybench] $n%-24s $s%7.2f s")
    }
    spark.stop()
  }
}
