package graft

import org.scalatest.funsuite.AnyFunSuite

/** The portability claim behind every Exact/DECIMAL-quantized tail,
  * pinned directly: results must be BIT-IDENTICAL across shuffle
  * partition counts. On a 1000-executor cluster the partition count
  * (and with AQE, even the plan) differs from local[32]; any
  * accumulation-order-dependent float sum would produce different
  * bits there and fail the oracle hash — so we run representative
  * IEEE-tailed queries at 3 partition settings and require exact
  * row-for-row equality.
  */
class DeterminismSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** queries with floating outputs downstream of big aggregations —
    * the ones an order-dependent sum would betray first. */
  private val Sensitive = Seq("q1_agg", "x6_autocorr", "x5_ewma",
    "x9_modularity", "x4_pmi_cooc", "x6_bootstrap_ci",
    "x5_backtest_snaive", "x6_trimmed_mean",
    // round-12 integer-DIV pipelines: the DIV chains are exact by
    // construction, but the aggregates feeding them (token counts,
    // per-domain sums, histogram joins) must land identical rows at
    // any partitioning — and doremi/epoch_plan additionally pin that
    // the unpartitioned-window iteration is partition-count-blind
    "x4_bm25_topk", "x4_gopher_rules", "x7_doremi_weights",
    "x7_dsir_sample", "x7_epoch_plan", "mm_caption_align",
    "x6_theil_sen")

  test("IEEE-tailed queries are bit-identical at 4, 32 and 64 " +
      "shuffle partitions") {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    def runAll(parts: String): Map[String, Seq[String]] = {
      spark.conf.set(key, parts)
      Sensitive.map { q =>
        // sorted: partition count may permute unordered output rows
        // (the driver's gate sorts too); the claim is about VALUES
        q -> SparkEntry.queries(q)(spark, sf).collect()
          .map(_.toString).toSeq.sorted
      }.toMap
    }
    try {
      val at4 = runAll("4")
      val at32 = runAll("32")
      val at64 = runAll("64")
      Sensitive.foreach { q =>
        assert(at4(q) == at32(q),
          s"$q differs between 4 and 32 partitions")
        assert(at32(q) == at64(q),
          s"$q differs between 32 and 64 partitions")
      }
    } finally spark.conf.set(key, prev)
  }
}
