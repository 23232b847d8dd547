package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the round-10 batch 6 operators: LM-score bounds and
  * monotonicity, PageRank mass/teleport invariants, theta-sketch
  * estimate accuracy vs exact distincts, and stats/histogram
  * consistency against direct aggregates. */
class Parity19Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("x4_lm_score: scores are valid micro-probabilities; a repeated " +
    "document outscores a shuffled-vocabulary one") {
    val out = graft.queries.Parity19.queries("x4_lm_score")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n_bigrams")
      val sum = r.getAs[Long]("lm_sum")
      val avg = r.getAs[Long]("lm_avg_micro")
      assert(n > 0)
      // each bigram's micro-prob is in (0, 1e6]; the doc's own bigrams
      // always contribute, so the sum is positive
      assert(sum > 0 && sum <= n * 1000000L, s"lm_sum $sum out of range")
      assert(avg == sum / n)
    }
  }

  test("x4_lm_score: predictable text scores higher than unique text") {
    import spark.implicits._
    import graft.ops.TextOps
    // 9 docs of one repeated sentence (high bigram probability) + 1 doc
    // of entirely unique tokens (every bigram count = 1, but its w1
    // context is also unique so p = 1e6... make the unique doc SHARE
    // unigrams with the common docs so its bigrams are rare among
    // frequent contexts)
    val common = (1 to 9).map(i =>
      (i.toLong, "the cat sat on the mat " * 5))
    val rare = Seq((10L, "the mat the cat on sat the on mat cat"))
    val df = (common ++ rare).toDF("doc_id", "text")
    df.createOrReplaceTempView("lmdocs")
    // replicate the query inline on the planted frame
    val tk = df.select(col("doc_id"),
        TextOps.tokens(lower(col("text"))).as("t"))
      .withColumn("n", size(col("t"))).filter(col("n") >= 2)
    val bi = tk.select(col("doc_id"), explode(zip_with(
        slice(col("t"), lit(1), col("n") - 1),
        slice(col("t"), lit(2), col("n") - 1),
        (x, y) => struct(x.as("w1"), y.as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c2 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val lm = c2.join(c1, Seq("w1"))
      .select(col("w1"), col("w2"),
        expr("CAST((1000000 * c2) DIV c1 AS BIGINT)").as("p_micro"))
    val scores = bi.join(lm, Seq("w1", "w2")).groupBy(col("doc_id"))
      .agg(expr("CAST(sum(p_micro) DIV count(1) AS BIGINT)").as("avg"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scores(1L) > scores(10L),
      s"repeated text ${scores(1L)} should outscore shuffled ${scores(10L)}")
  }

  test("x9_pagerank: teleport floor, positive mass, near-conservation") {
    val out = graft.queries.Parity19.queries("x9_pagerank")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    val n = out.length.toLong
    val t = 1000000000000L
    val tp = ((t / n) * 15) / 100
    var total = 0L
    out.foreach { r =>
      val rank = r.getAs[Long]("rank_pico")
      // every node receives at least the teleport share; the graph is
      // bidirectional so there are no dangling sinks
      assert(rank >= tp, s"rank $rank below teleport floor $tp")
      total += rank
    }
    // integer floors only ever LOSE mass: total <= T, and the loss is
    // bounded by ~(#nodes + #edges) units per iteration — far under 1%
    assert(total <= t, s"mass created: $total > $t")
    assert(total >= t - t / 100, s"mass lost beyond rounding: $total")
    // both entity kinds present
    val kinds = out.map(_.getAs[String]("kind")).toSet
    assert(kinds == Set("customer", "supplier"))
  }

  test("x9_rank_advisor: the switch is pinned at the measured " +
      "crossover (62.5k nodes = 1.5 MB vector); fixture scale picks " +
      "broadcast; the routed pagerank is bit-equal to BOTH forced arms") {
    import graft.ops.Exchange
    // the exact flip node count implied by the modeled constants —
    // rank_arms measured broadcast winning at ~20k nodes and msg at
    // ~200k; the geometric midpoint is the pinned switch
    val flip = Exchange.RankArmCrossoverBytes / Exchange.VectorBytesPerNode
    assert(flip == 62500L)
    assert(!Exchange.adviseMsg(flip - 1))
    assert(Exchange.adviseMsg(flip))
    val row = graft.queries.Parity19.queries("x9_rank_advisor")(spark, sf)
      .head()
    assert(row.getAs[String]("arm") == "broadcast",
      "the sub-crossover fixture must route to the broadcast arm")
    assert(row.getAs[Long]("est_vector_bytes") ==
      row.getAs[Long]("n_nodes_est") * Exchange.VectorBytesPerNode)
    // routing changes the EXCHANGE strategy only, never the result
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val routed = rows(
      graft.queries.Parity19.queries("x9_pagerank")(spark, sf))
    assert(routed == rows(graft.queries.Parity19.pagerankQ(spark, sf,
      msg = false)))
    assert(routed == rows(graft.queries.Parity19.pagerankQ(spark, sf,
      msg = true)))
  }

  test("x6_kmv_theta: estimates land within the K=64 sketch error band " +
    "of the exact distinct counts") {
    import graft.ops.TextOps
    val out = graft.queries.Parity19.queries("x6_kmv_theta")(spark, sf)
      .collect().head
    val g = graft.Tables.documents(spark, sf)
      .filter(col("source").isin("src0", "src1"))
      .select(col("source"),
        explode(TextOps.shingles(lower(col("text")), 3)).as("gram"))
      .select(col("source"), TextOps.polyHash60(col("gram")).as("h"))
      .distinct()
    val exactA = g.filter(col("source") === "src0").count()
    val exactB = g.filter(col("source") === "src1").count()
    val exactU = g.select(col("h")).distinct().count()
    def inBand(est: Long, exact: Long): Boolean =
      exact < 64 || math.abs(est - exact).toDouble / exact < 0.5
    assert(inBand(out.getAs[Long]("est_a"), exactA),
      s"est_a ${out.getAs[Long]("est_a")} vs exact $exactA")
    assert(inBand(out.getAs[Long]("est_b"), exactB),
      s"est_b ${out.getAs[Long]("est_b")} vs exact $exactB")
    assert(inBand(out.getAs[Long]("est_union"), exactU),
      s"est_union ${out.getAs[Long]("est_union")} vs exact $exactU")
    assert(out.getAs[Long]("n_common") <= 64)
    // the union of two sets is at least as large as either sketch est
    assert(out.getAs[Long]("n_union") >= out.getAs[Long]("n_a").min(64))
  }

  test("x6_col_stats / x6_histogram agree with direct aggregates") {
    val li = graft.Tables.lineitem(spark, sf)
    val nRows = li.count()
    val stats = graft.queries.Parity19.queries("x6_col_stats")(spark, sf)
      .collect()
    assert(stats.length == 4)
    stats.foreach { r =>
      assert(r.getAs[Long]("n_rows") == nRows)
      assert(r.getAs[Long]("ndv") + r.getAs[Long]("n_nulls") <= nRows)
      assert(r.getAs[Double]("min_v") <= r.getAs[Double]("max_v"))
    }
    val qRow = stats.find(_.getAs[String]("col_name") == "l_quantity").get
    val direct = li.agg(min(col("l_quantity")), max(col("l_quantity")),
      countDistinct(col("l_quantity"))).collect().head
    assert(qRow.getAs[Double]("min_v") == direct.getDouble(0))
    assert(qRow.getAs[Double]("max_v") == direct.getDouble(1))
    assert(qRow.getAs[Long]("ndv") == direct.getLong(2))

    val hist = graft.queries.Parity19.queries("x6_histogram")(spark, sf)
      .collect()
    assert(hist.map(_.getAs[Long]("cnt")).sum == nRows,
      "histogram buckets must partition the table")
    assert(hist.forall { r =>
      val b = r.getAs[Long]("bucket"); b >= 0 && b <= 7
    })
  }
}
