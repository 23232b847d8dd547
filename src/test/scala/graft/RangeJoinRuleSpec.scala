package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RangeJoinRewriteRule: pure BETWEEN joins become binned equi-joins
  * under the extension session, with identical results. */
class RangeJoinRuleSpec extends AnyFunSuite {

  private def withExtSession[A](f: SparkSession => A): A = {
    val base = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder().master(base.sparkContext.master)
      .withExtensions(new GraftExtensions).getOrCreate()
    // test frames are tiny, so disable the small-side guard here; its
    // default behavior has its own test below
    s2.conf.set(plans.RangeJoinRewriteRule.SmallSideConf, "0")
    try f(s2)
    finally {
      s2.conf.unset(plans.RangeJoinRewriteRule.WidthConf)
      s2.conf.unset(plans.RangeJoinRewriteRule.SmallSideConf)
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  private def pts(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq((1L, 10L), (2L, 55L), (3L, 119L), (4L, -7L), (5L, 200L), (6L, 64L))
      .toDF("pid", "p")
  }
  private def ivs(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq((10L, 0L, 64L), (20L, 50L, 130L), (30L, -20L, -1L))
      .toDF("iid", "lo", "hi")
  }

  private def planOf(df: DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  test("BETWEEN join is rewritten to a binned equi-join, same rows") {
    withExtSession { s =>
      // queryExecution caches per DataFrame, so build one per conf state
      def q = pts(s).join(ivs(s),
        col("p") >= col("lo") && col("p") <= col("hi")).select("pid", "iid")
      s.conf.set(plans.RangeJoinRewriteRule.WidthConf, "0") // explicit off
      val naive = q.collect().toSet // nested loop reference
      val pNaive = planOf(q)
      assert(pNaive.contains("BroadcastNestedLoopJoin"), pNaive)

      s.conf.set(plans.RangeJoinRewriteRule.WidthConf, "32")
      val pNew = planOf(q)
      assert(!pNew.contains("BroadcastNestedLoopJoin"), pNew)
      assert(pNew.contains("Generate"), pNew)
      assert(q.collect().toSet == naive)
      assert(naive.size == 7) // (1,10)(2,10)(2,20)(3,20)(4,30)(6,10)(6,20)

      // auto mode (conf unset): width sampled from the interval spans,
      // same rewrite shape, same rows
      s.conf.unset(plans.RangeJoinRewriteRule.WidthConf)
      val pAuto = planOf(q)
      assert(!pAuto.contains("BroadcastNestedLoopJoin"), pAuto)
      assert(pAuto.contains("Generate"), pAuto)
      assert(q.collect().toSet == naive)
    }
  }

  test("strict/reversed bounds and the SQL BETWEEN path also rewrite") {
    withExtSession { s =>
      s.conf.set(plans.RangeJoinRewriteRule.WidthConf, "32")
      pts(s).createOrReplaceTempView("pts")
      ivs(s).createOrReplaceTempView("ivs")
      val sqlQ = s.sql(
        "SELECT pid, iid FROM pts JOIN ivs ON p BETWEEN lo AND hi")
      assert(!planOf(sqlQ).contains("BroadcastNestedLoopJoin"), planOf(sqlQ))

      // strict upper bound + bounds written operand-flipped
      val strict = pts(s).join(ivs(s),
        col("lo") <= col("p") && col("p") < col("hi")).select("pid", "iid")
      val pStrict = planOf(strict)
      assert(!pStrict.contains("BroadcastNestedLoopJoin"), pStrict)
      val expect = pts(s).collect().flatMap { pr =>
        ivs(s).collect().collect {
          case ir if ir.getLong(1) <= pr.getLong(1) &&
            pr.getLong(1) < ir.getLong(2) => (pr.getLong(0), ir.getLong(0))
        }
      }.toSet
      assert(strict.as[(Long, Long)](org.apache.spark.sql.Encoders
        .tuple(org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong))
        .collect().toSet == expect)
    }
  }

  test("joins that already have an equi key are left untouched") {
    withExtSession { s =>
      s.conf.set(plans.RangeJoinRewriteRule.WidthConf, "32")
      val q = pts(s).join(ivs(s),
        col("pid") === col("iid") &&
          col("p") >= col("lo") && col("p") <= col("hi"))
      val p = planOf(q)
      assert(!p.contains("Generate"), p)
    }
  }

  test("tiny interval side keeps the broadcast nested loop (j9 shape)") {
    withExtSession { s =>
      s.conf.set(plans.RangeJoinRewriteRule.WidthConf, "32")
      s.conf.set(plans.RangeJoinRewriteRule.SmallSideConf, "8192")
      // a literal band table is a one-pass broadcast loop; binning
      // would only add an explode + shuffle
      val q = pts(s).join(ivs(s),
        col("p") >= col("lo") && col("p") <= col("hi"))
      val p = planOf(q)
      assert(!p.contains("Generate"), p)
      assert(p.contains("BroadcastNestedLoopJoin"), p)
    }
  }

  test("j5_rule_rewrite harness query rewrites under the default guard") {
    withExtSession { s =>
      // driver conditions: default small-side guard, NO width conf —
      // auto sampling must both arm the rule and pick a usable width;
      // the interval aggregate's estimated size must clear the guard
      // or the gate would silently test BNLJ instead
      s.conf.set(plans.RangeJoinRewriteRule.SmallSideConf, "8192")
      val p = planOf(SparkEntry.queries("j5_rule_rewrite")(
        s, "/root/testdata/sf0.001"))
      assert(p.contains("Generate"), p)
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
    }
  }

  test("explicit zero/invalid width disables the rule") {
    withExtSession { s =>
      for (off <- Seq("0", "-5", "nope")) {
        s.conf.set(plans.RangeJoinRewriteRule.WidthConf, off)
        // fresh frame per conf state: queryExecution caches per DataFrame
        val q = pts(s).join(ivs(s),
          col("p") >= col("lo") && col("p") <= col("hi"))
        assert(planOf(q).contains("BroadcastNestedLoopJoin"),
          s"width=$off: ${planOf(q)}")
      }
    }
  }

  test("auto width lands near the median interval span") {
    withExtSession { s =>
      // spans here: iv (0,64)->65, (50,130)->81, (-20,-1)->20; median 65.
      // The rewrite with width 65 gives bins lo/65..hi/65 — just pin
      // that the auto plan is the binned shape AND produces exact rows
      // (the width value itself is internal; equivalence is the contract)
      val q = pts(s).join(ivs(s),
        col("p") >= col("lo") && col("p") <= col("hi")).select("pid", "iid")
      assert(planOf(q).contains("Generate"), planOf(q))
      assert(q.collect().length == 7)
    }
  }
}
