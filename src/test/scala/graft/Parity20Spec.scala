package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the round-10 batch 7 operators: CMS overestimate bound
  * vs the true join size, kNN-graph shape and monotonicity, URL
  * canonical-group accounting, and rebalancing-plan arithmetic. */
class Parity20Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("x6_cms_join_est: estimate bounds the exact join size from above") {
    val r = graft.queries.Parity20.queries("x6_cms_join_est")(spark, sf)
      .collect().head
    val exact = r.getAs[Long]("exact_join_size")
    val est = r.getAs[Long]("est_join_size")
    val direct = graft.Tables.customer(spark, sf)
      .join(graft.Tables.supplier(spark, sf),
        col("c_nationkey") === col("s_nationkey"))
      .count()
    assert(exact == direct, s"exact $exact != direct join count $direct")
    // CMS inner product only ever collides keys TOGETHER: est >= exact
    assert(est >= exact, s"CMS est $est below exact $exact")
    // width 64 over 25 nation keys: collisions are few; the bound is
    // loose but the estimate must stay within an order of magnitude
    assert(est <= exact * 10, s"est $est implausibly above exact $exact")
  }

  test("x3_knn_graph: contiguous ranks, monotone cosine, symmetric source") {
    val rows = graft.queries.Parity20.queries("x3_knn_graph")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val bySrc = rows.groupBy(_.getAs[Long]("vec_id"))
    bySrc.foreach { case (src, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rk"))
      assert(sorted.map(_.getAs[Long]("rk")).toSeq ==
        (1L to sorted.length).toSeq, s"ranks not contiguous for $src")
      val cosines = sorted.map(_.getAs[Double]("cosine_sim"))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b },
        s"cosine not monotone for $src")
      assert(rs.forall(_.getAs[Long]("neighbor_id") != src),
        "self-edge in kNN graph")
    }
    // every vector with >= 1 in-block peer appears as a source
    val n = graft.Tables.embeddings(spark, sf).count()
    assert(bySrc.size.toLong == n,
      s"${bySrc.size} sources for $n vectors (blocks all have peers)")
  }

  test("x2_url_dedup: canonical groups conserve documents and pick min") {
    val rows = graft.queries.Parity20.queries("x2_url_dedup")(spark, sf)
      .collect()
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_variants")).sum == nDocs,
      "canonical groups must partition the corpus")
    assert(rows.exists(_.getAs[Long]("n_variants") > 1),
      "synthesis must produce real variant groups")
    rows.foreach { r =>
      // keeper is in the group: keeper <= ids_sum bound check
      assert(r.getAs[Long]("keeper") * r.getAs[Long]("n_variants")
        <= r.getAs[Long]("ids_sum"), "keeper must be the group minimum")
    }
  }

  test("x7_class_balance: plan reaches the majority-class target exactly") {
    val rows = graft.queries.Parity20.queries("x7_class_balance")(spark, sf)
      .collect()
    val target = rows.map(_.getAs[Long]("total_after")).max
    rows.foreach { r =>
      val cnt = r.getAs[Long]("cnt")
      val rep = r.getAs[Long]("repeat_factor")
      val rem = r.getAs[Long]("remainder")
      assert(cnt * rep + rem == target,
        s"label ${r.getAs[Long]("label")}: $cnt*$rep+$rem != $target")
      assert(r.getAs[Long]("total_after") == target)
      if (rem == 0) assert(r.getAs[Long]("extra_ids_sum") == 0L)
    }
    // the majority class itself needs no oversampling
    assert(rows.exists(r => r.getAs[Long]("repeat_factor") == 1L &&
      r.getAs[Long]("remainder") == 0L))
  }
}
