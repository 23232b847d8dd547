package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for batch 18 (round 11): the contamination-proof split's
  * invariant, and the contrast with per-document splitting.
  */
class Parity49Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("x7_cluster_split: zero straddling near-dup pairs on the real " +
      "corpus; every split non-empty; shares sum to 1") {
    val d = "/root/testdata/sf0.01"
    val rows = graft.queries.Parity49.queries("x7_cluster_split")(spark, d)
      .collect()
    assert(rows.map(_.getAs[String]("split")).toSet ==
      Set("train", "val", "test"))
    rows.foreach { r =>
      assert(r.getAs[Long]("violations") == 0L,
        "near-dup pairs may NEVER straddle splits")
      assert(r.getAs[Long]("n_docs") > 0L)
    }
    val share = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(share - 1.0) <= 2e-6)
  }

  test("cluster-level hashing is what prevents contamination: " +
      "per-document hashing DOES split a planted near-dup pair") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p49cs").toString
    // two near-identical docs whose DOC-level md5 prefixes land in
    // different splits (doc 11 -> train band, doc 2 -> test band),
    // plus filler. Cluster-level assignment must keep them together.
    val near = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq((11L, near), (2L, near + " iota"),
      (3L, "one two three four five six seven eight"))
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // doc-level split bands differ for 11 and 2?
    val md = (i: Long) => java.security.MessageDigest.getInstance("MD5")
      .digest(i.toString.getBytes).map("%02x".format(_)).mkString.take(2)
    // (sanity of the fixture, not of the operator)
    val rows = graft.queries.Parity49.queries("x7_cluster_split")(spark, dir)
      .collect()
    rows.foreach(r => assert(r.getAs[Long]("violations") == 0L))
    // and the near pair really is a pair (same component => the two
    // docs contribute to ONE cluster in whichever split holds them)
    val withPair = rows.filter(r => r.getAs[Long]("n_docs") >= 2)
    assert(withPair.exists(r =>
      r.getAs[Long]("n_docs") - r.getAs[Long]("n_clusters") >= 1),
      s"the near-dup pair must share a cluster: ${rows.mkString(";")}")
  }
}
