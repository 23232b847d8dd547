package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for batch 7 (round 12): soft dedup weights, the IVF recall
  * operating curve.
  */
class Parity58Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("x2_soft_dedup: weights are exactly 1e6 DIV cluster size, " +
      "singletons keep full weight, clusters sum to ~1e6 each") {
    val rows = graft.queries.Parity58.queries("x2_soft_dedup")(spark, sf)
      .collect()
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      assert(r.getAs[Long]("w_micro") == 1000000L / r.getAs[Long]("csize"))
    }
    val byComp = rows.groupBy(_.getAs[Long]("comp"))
    byComp.foreach { case (comp, members) =>
      assert(members.length == members.head.getAs[Long]("csize"),
        s"csize mismatch for cluster $comp")
      val tot = members.map(_.getAs[Long]("w_micro")).sum
      // integer DIV loses < 1 micro per member
      assert(tot <= 1000000L && tot > 1000000L - members.length,
        s"cluster $comp total weight $tot")
    }
    // the corpus plants near-dups, so both regimes must be exercised
    assert(byComp.exists(_._2.length > 1), "no multi-doc cluster found")
    assert(byComp.exists(_._2.length == 1), "no singleton found")
  }

  test("x3_ann_recall_curve: monotone, exact at full probe, and the " +
      "measured points clear their floors with margin") {
    val curve = graft.queries.Parity58.recallCurve(spark, sf)
      .orderBy("n_probe").collect()
    assert(curve.map(_.getAs[Long]("n_probe")).toSeq ==
      graft.queries.Parity58.CurveNProbes.map(_.toLong))
    val recalls = curve.map(r =>
      r.getAs[Long]("n_probe") -> r.getAs[Long]("recall_milli")).toMap
    info(s"measured recall@5 by nProbe: $recalls")
    // monotone in nProbe (provable: superset candidates, shared
    // tie-break) and exhaustive at nProbe = nLists
    recalls.toSeq.sortBy(_._1).map(_._2).sliding(2).foreach {
      case Seq(a, b) => assert(a <= b, s"recall curve not monotone: $recalls")
      case _ =>
    }
    assert(recalls(16L) == 1000L, "probing all lists must be exact")
    graft.queries.Parity58.CurveFloors.foreach { case (np, f) =>
      assert(recalls(np.toLong) >= f,
        s"nProbe=$np recall ${recalls(np.toLong)} under floor $f")
    }
    // the curve must actually RISE (an IVF where nProbe does not
    // matter means broken list assignment)
    assert(recalls(16L) > recalls(1L), "flat curve: assignment broken")
  }
}
