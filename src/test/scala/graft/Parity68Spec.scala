package graft

import graft.queries.Parity68
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins s17_type_widening: naive parquet schema merge REFUSES the
  * int32/int64 generation conflict (the failure that motivates the
  * operator), while the reconciling reader widens losslessly. */
class Parity68Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def msgChain(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")

  test("mergeSchema read of conflicting generations FAILS; the " +
      "widening reader reconciles them losslessly") {
    val dir = s"${TestSpark.fixtures}/widen_${System.nanoTime()}"
    Parity68.stage(spark, sf, dir)
    // the refusal the operator exists for
    val ex = intercept[Exception] {
      spark.read.option("mergeSchema", "true")
        .parquet(s"$dir/gen1", s"$dir/gen2").collect()
    }
    assert(msgChain(ex).toLowerCase.matches(
      "(?s).*(failed to merge|incompatible|cannot merge).*"),
      s"expected a schema-merge refusal, got: ${msgChain(ex)}")
    // the reconciling reader: every row present, gen-1 values fit the
    // narrow type they came from, gen-2 values PROVE the widening was
    // necessary (beyond int range)
    val out = Parity68.widenedRead(spark, dir)
    assert(out.schema("acct").dataType ==
      org.apache.spark.sql.types.LongType)
    val stats = out.groupBy(col("gen"))
      .agg(count(lit(1)).as("n"), min(col("acct")).as("lo"),
        max(col("acct")).as("hi"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val (n1, lo1, hi1) = stats(1L)
    val (n2, lo2, _) = stats(2L)
    assert(n1 > 0 && n2 > 0)
    assert(lo1 >= Int.MinValue.toLong && hi1 <= Int.MaxValue.toLong,
      "gen-1 values must round-trip the narrow type unchanged")
    assert(lo2 > Int.MaxValue.toLong,
      "gen-2 values must be un-narrowable (the widening was necessary)")
  }
}
