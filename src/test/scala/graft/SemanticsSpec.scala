package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops._

/** Typed row for the VecMeanAgg test (top-level so the implicit
  * product encoder can be derived — local case classes have no
  * TypeTag). */
case class EmbRow(vec_id: Long, embedding: Array[Float], label: Long)

/** Semantics pins: MinHash sketch union property, salted-join
  * equivalence, NOT IN null-awareness (SURVEY.md §7 hard part 2),
  * union-distinct set semantics. */
class SemanticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("MinHashUnionAgg: elementwise-min of signatures == signature of set union") {
    val k = 32
    val docs = Seq(
      (1L, 10L, "the quick brown fox jumps over the lazy dog today"),
      (2L, 10L, "a completely different second document about spark plans"),
      (3L, 20L, "another group with its own text payload here")
    ).toDF("doc_id", "grp", "text")
    val sigs = docs
      .withColumn("sh", TextOps.shingles(col("text")))
      .withColumn("sig",
        graft.functions.MinHashSig.minhash_sig(spark, col("sh"), k))
    // aggregate per group with the custom TypedImperativeAggregate
    val grouped = sigs.groupBy("grp")
      .agg(graft.functions.MinHashUnionAgg
        .minhash_union(spark, col("sig"), k).as("gsig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // MinHash property: the group signature equals the signature
    // computed directly on the union of the groups' shingle sets
    val shingleUnion = sigs.select(col("grp"), explode(col("sh")).as("s"))
      .groupBy("grp").agg(collect_set(col("s")).as("sh"))
      .withColumn("gsig2",
        graft.functions.MinHashSig.minhash_sig(spark, col("sh"), k))
      .collect().map(r => r.getAs[Long]("grp") -> r.getSeq[Long](2)).toMap
    assert(grouped.keySet == shingleUnion.keySet)
    grouped.foreach { case (g, sig) => assert(sig == shingleUnion(g), s"grp $g") }
  }

  test("AQE splits a skewed sort-merge join at runtime") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize")
      .map(k => k -> conf.getOption(k)).toMap
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "8KB")
    try {
      // 90% of left rows share key 1 -> one shuffle partition dwarfs
      // the median and AQE must split it (OptimizeSkewedJoin)
      val left = spark.range(200000)
        .select(when(col("id") % 10 < 9, 1L).otherwise(col("id")).as("k"),
          lpad(col("id").cast("string"), 64, "x").as("payload"))
      val right = spark.range(200000)
        .select(col("id").as("k2"), lit("r").as("side"))
      val joined = left.join(right, col("k") === col("k2"))
      // execute THIS dataset's queryExecution (count() would build its
      // own) so the adaptive final plan is inspectable
      assert(joined.collect().length == 200000)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), "AQE did not split the skewed join:\n" + p)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("saltedJoin == plain inner join on a skewed key") {
    val left = Seq.tabulate(1000)(i =>
      (if (i % 10 == 0) 1L else i.toLong, s"v$i"))
      .toDF("k", "payload") // key 1 is hot
    val right = Seq((1L, "hot"), (5L, "cold"), (77L, "other"))
      .toDF("k", "side")
    val plain = left.join(right, Seq("k"), "inner")
      .select("k", "payload", "side")
    val salted = Skew.saltedJoin(left, right, "k", salt = 8)
      .select("k", "payload", "side")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("NOT IN is null-aware; left_anti is not (pin the divergence)") {
    Seq(Some(1L), Some(2L), Some(3L)).toDF("k").createOrReplaceTempView("t_l")
    Seq(Some(1L), None).toDF("k").createOrReplaceTempView("t_r_null")
    Seq(Some(1L)).toDF("k").createOrReplaceTempView("t_r_clean")
    // NOT IN against a subquery containing NULL selects nothing (SQL
    // three-valued logic)…
    assert(spark.sql(
      "SELECT * FROM t_l WHERE k NOT IN (SELECT k FROM t_r_null)").count() == 0)
    // …while left_anti treats NULL as non-matching.
    val anti = spark.table("t_l")
      .join(spark.table("t_r_null"), Seq("k"), "left_anti")
    assert(anti.count() == 2)
    // With non-null keys (our md5 content keys) the two agree — the
    // precondition SURVEY.md §7 relies on.
    assert(spark.sql(
      "SELECT * FROM t_l WHERE k NOT IN (SELECT k FROM t_r_clean)").count() == 2)
    val anti2 = spark.table("t_l")
      .join(spark.table("t_r_clean"), Seq("k"), "left_anti")
    assert(anti2.count() == 2)
  }

  test("asofBackward: latest right row at-or-before left time, per key") {
    val left = Seq(
      (1L, 100L, 5L),   // event at t=5
      (2L, 100L, 10L),  // exactly at right t=10 -> takes v10
      (3L, 100L, 11L),
      (4L, 200L, 7L),   // key with no right rows -> null
      (5L, 100L, 1L)    // before first right row -> null
    ).toDF("event_id", "k", "t")
    val right = Seq(
      (100L, 3L, "v3"), (100L, 10L, "v10"), (100L, 20L, "v20")
    ).toDF("k", "rt", "v")
    val got = AsofJoin.asofBackward(left, right, "k", "t", "rt", Seq("v"))
      .collect().map(r => r.getLong(0) -> Option(r.getAs[String]("v"))).toMap
    assert(got == Map(
      1L -> Some("v3"), 2L -> Some("v10"), 3L -> Some("v10"),
      4L -> None, 5L -> None))
  }

  test("observeNulls is a free side-output: metrics appear after one action") {
    val df = Seq((1L, "a"), (2L, null), (3L, "c")).toDF("id", "v")
    val (observed, get) = graft.nhl.Quality.observeNulls(df, Seq("v"))
    observed.count()
    assert(get() == Map("v" -> 1L))
  }

  test("typed VecMeanAgg == DataFrame x3_centroids, and is partition-independent") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    def typedMeans(parts: Int): Map[(Long, Int), Double] =
      Tables.embeddings(spark, sf).repartition(parts)
        .selectExpr("vec_id", "embedding", "CAST(label AS BIGINT) AS label")
        .as[EmbRow]
        .groupByKey(_.label).mapValues(_.embedding)
        .agg(graft.functions.VecMeanAgg.toColumn.name("mean"))
        .collect()
        .flatMap { case (label, mean) =>
          mean.zipWithIndex.map { case (v, i) => (label, i + 1) -> v } }
        .toMap
    val t3 = typedMeans(3)
    assert(typedMeans(7) == t3, "partition-count dependent result")
    val df = graft.queries.Parity5.queries("x3_centroids")(spark, sf)
      .collect()
      .map(r => (r.getAs[Number]("label").longValue(), r.getInt(1)) ->
        r.getDouble(2)).toMap
    assert(df.keySet == t3.keySet)
    df.foreach { case (k, v) =>
      assert(v == t3(k), s"mismatch at $k: df=$v typed=${t3(k)}") }
  }

  test("Exact.sumD/avgD are partition-count independent") {
    val xs = (1 to 1000).map(i => i / 100.0)
    val a = xs.toDF("x").repartition(1)
      .agg(graft.queries.Exact.sumD(col("x"))).head().getDouble(0)
    val b = xs.toDF("x").repartition(17)
      .agg(graft.queries.Exact.sumD(col("x"))).head().getDouble(0)
    assert(a == b) // bitwise equality, not approx
  }

  test("union is UNION ALL; distinct() restores set semantics (A2)") {
    val a = Seq(1, 2, 3).toDF("x")
    val dup = a.union(a)
    assert(dup.count() == 6)
    assert(dup.distinct().count() == 3)
  }
}
