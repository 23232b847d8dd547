package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions: the `spark.sql.extensions` deployment path must
  * inject the planner strategy and the native-kernel SQL functions
  * into a session WITHOUT any imperative registration calls. */
class ExtensionsSpec extends AnyFunSuite {

  test("withExtensions injects strategy + SQL functions") {
    val base = TestSpark.spark // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder().master(base.sparkContext.master)
      .withExtensions(new GraftExtensions).getOrCreate()
    try {
      assert(s2 ne base, "expected a fresh session over the shared context")

      // injected planner strategy (no experimental.extraStrategies hook)
      assert(s2.sessionState.planner.strategies.contains(plans.TopKStrategy))
      assert(!s2.experimental.extraStrategies.contains(plans.TopKStrategy))

      // injected SQL functions resolve by name — no wrapper calls first
      val row = s2.sql(
        """SELECT graft_simhash_sig(array('a','b','a')) AS sig,
                  graft_shingle_set(array('a','b','c','b','c','d'), 3) AS sh,
                  graft_dot_longs(array(1L,2L,3L), array(4L,5L,6L)) AS dot,
                  graft_minhash_sig(array('x y z'), 4) AS mh""").head()
      assert(row.getLong(2) == 4 + 10 + 18)
      assert(row.getSeq[String](1) == Seq("a b c", "b c b", "c b c", "b c d"))
      assert(row.getSeq[Long](3).length == 4)

      // the Column wrappers self-register on the ACTIVE session — the
      // no-extensions fallback path. Run it on s2 (active): the temp
      // registration shadows the injected one with identical semantics.
      val viaWrapper = s2.range(1)
        .select(graft.functions.SimHashSig.simhash_sig(
          typedLit(Seq("a", "b", "a"))).as("sig")).head().getLong(0)
      assert(row.getLong(0) == viaWrapper)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
