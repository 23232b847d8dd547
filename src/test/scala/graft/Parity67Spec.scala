package graft

import graft.queries.Parity67
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins s16_schema_evolution: the merged read reconciles the two file
  * generations (added column NULL exactly on gen-1 rows), and the
  * data path through the merged schema keeps its scan properties —
  * the added column's filter still pushes down to parquet. */
class Parity67Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("merged read: added column is NULL exactly on gen-1 rows, " +
      "populated on gen-2; both generations' shared columns intact") {
    val dir = s"${TestSpark.fixtures}/evo_${System.nanoTime()}"
    val out = Parity67.evolvedRead(spark, sf, dir)
    val byGen = out.groupBy(col("gen"))
      .agg(count(lit(1)).as("n"),
        count(col("mktsegment")).as("n_seg"),
        count(col("name")).as("n_name"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    val (n1, seg1, name1) = byGen(1L)
    val (n2, seg2, name2) = byGen(2L)
    assert(n1 > 0 && n2 > 0)
    assert(seg1 == 0, "gen-1 rows must surface the added column as NULL")
    assert(seg2 == n2, "gen-2 rows must carry the added column")
    assert(name1 == n1 && name2 == n2, "shared columns intact")
  }

  test("the ADDED column's filter pushes down through the merged " +
      "schema (PushedFilters at the scan)") {
    val dir = s"${TestSpark.fixtures}/evo_${System.nanoTime()}"
    val p = Parity67.evolvedRead(spark, sf, dir)
      .filter(col("mktsegment") === "BUILDING")
      .queryExecution.explainString(FormattedMode)
    assert(p.matches("(?s).*PushedFilters: \\[[^\\]]*mktsegment[^\\]]*\\].*"),
      "added-column filter did not reach the parquet scan:\n" + p)
  }
}
