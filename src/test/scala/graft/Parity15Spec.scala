package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the second round-10 batch: the weighted-sample
  * bias direction, the snapshot-diff round-trip (apply diff to A ==
  * B), and compaction-plan conservation laws. */
class Parity15Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("x7_weighted_sample: long documents are over-represented") {
    val sample = SparkEntry.queries("x7_weighted_sample")(spark, sf)
    val sMean = sample.agg(avg(col("n_chars"))).head().getDouble(0)
    val cMean = Tables.documents(spark, sf)
      .agg(avg(col("n_chars"))).head().getDouble(0)
    // E-S with w = n_chars biases toward heavy docs; at 200-of-500
    // the sample mean must clearly exceed the corpus mean
    assert(sMean > cMean,
      s"weighted sample mean $sMean not above corpus mean $cMean")
  }

  test("x1_snapshot_diff: applying the diff to snapshot A yields B") {
    val diff = SparkEntry.queries("x1_snapshot_diff")(spark, sf)
    // rebuild both states the same way the query does
    def stateAt(cut: Option[Long]) = {
      val e = Tables.eventsNs(spark, sf).select(col("user_id"),
        col("event_id"), graft.ops.Sessionize.nsToUs(col("ts")).as("us"),
        col("event_type"), col("value"))
      val bounded = cut.map(c => e.filter(col("us") <= c)).getOrElse(e)
      bounded.withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
            .orderBy(col("us").desc, col("event_id").desc)))
        .filter(col("rn") === 1 && col("event_type") =!= "error")
        .select(col("user_id"), col("value"))
    }
    val a = stateAt(Some(1705363200000000L))
    val b = stateAt(None)
    // op partitioning invariants
    assert(diff.filter(col("op") === "I" && col("value_old").isNotNull).isEmpty)
    assert(diff.filter(col("op") === "D" && col("value_new").isNotNull).isEmpty)
    assert(diff.filter(col("op") === "U" &&
      (col("value_old").isNull || col("value_new").isNull)).isEmpty)
    // A + diff == B: delete D keys, upsert I/U keys with value_new
    val applied = a
      .join(diff.select(col("user_id"), col("op"), col("value_new")),
        Seq("user_id"), "left")
      .filter(col("op").isNull || col("op") === "U") // drop D; U overridden
      .select(col("user_id"),
        coalesce(col("value_new"), col("value")).as("value"))
      .unionByName(diff.filter(col("op") === "I")
        .select(col("user_id"), col("value_new").as("value")))
    assert(applied.exceptAll(b).isEmpty && b.exceptAll(applied).isEmpty)
  }

  test("x8_compaction_plan: conservation + deterministic file ranges") {
    val plan = SparkEntry.queries("x8_compaction_plan")(spark, sf)
    val docs = Tables.documents(spark, sf)
    // every doc assigned exactly once; bytes conserved
    assert(plan.agg(sum(col("n_docs"))).head().getLong(0) == docs.count())
    assert(plan.agg(sum(col("bytes"))).head().getLong(0) ==
      docs.agg(sum(col("n_chars"))).head().getLong(0))
    // per source, file ranges are ordered and non-overlapping
    val overlap = plan.alias("x").join(plan.alias("y"),
      col("x.source") === col("y.source") &&
        col("x.file_seq") < col("y.file_seq") &&
        col("x.last_doc") >= col("y.first_doc"))
    assert(overlap.isEmpty)
  }
}
