package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for BPE merge training (leftmost-first semantics on a planted
  * self-pair corpus + conservation on the real corpus) and the Welch
  * t-test (agreement with a plain double recomputation, dof bounds). */
class Parity21Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("x4_bpe_train: leftmost-first merge on a planted self-pair corpus") {
    import spark.implicits._
    // "a a a a b" — pair (a,a) has count 3; greedy leftmost merges
    // positions (1,2) and (3,4): 5 tokens -> 3. A naive merge-all
    // would merge overlapping occurrences and break the count.
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    Seq((1L, "a a a a b", "en", "src0", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.Parity21.queries("x4_bpe_train")(spark, dir)
      .collect()
    val r1 = out.find(_.getAs[Long]("merge_round") == 1L).get
    assert(r1.getAs[String]("w1") == "a" && r1.getAs[String]("w2") == "a")
    assert(r1.getAs[Long]("pair_count") == 3L)
    assert(r1.getAs[Long]("tokens_after") == 3L,
      s"leftmost-first must merge exactly 2 of the 3 overlapping pairs: $r1")
  }

  test("x4_bpe_train: corpus merges conserve tokens and shrink the stream") {
    val out = graft.queries.Parity21.queries("x4_bpe_train")(spark, sf)
      .collect().sortBy(_.getAs[Long]("merge_round"))
    assert(out.length == 5)
    val after = out.map(_.getAs[Long]("tokens_after"))
    val counts = out.map(_.getAs[Long]("pair_count"))
    after.zip(after.tail).foreach { case (prev, next) =>
      assert(next < prev, "each merge round must shrink the stream")
    }
    // each round removes one token per kept merge; kept <= pair_count
    out.indices.tail.foreach { i =>
      val removed = after(i - 1) - after(i)
      assert(removed >= 1 && removed <= counts(i),
        s"round ${i + 1} removed $removed vs pair_count ${counts(i)}")
    }
  }

  test("x6_ab_welch: matches a double recomputation; dof in Welch bounds") {
    val r = graft.queries.Parity21.queries("x6_ab_welch")(spark, sf)
      .collect().head
    val ev = graft.Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).map { case (k, rows) =>
        k -> rows.map(_.getDouble(1))
      }
    val (ca, cb) = (ev("click"), ev("view"))
    def stats(v: Array[Double]): (Long, Double, Double) = {
      val n = v.length
      val m = v.sum / n
      (n.toLong, m, v.map(x => (x - m) * (x - m)).sum / (n - 1))
    }
    val (na, ma, va) = stats(ca); val (nb, mb, vb) = stats(cb)
    assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb)
    assert(math.abs(r.getAs[Double]("mean_a") - ma) < 1e-6)
    assert(math.abs(r.getAs[Double]("var_a") - va) < 1e-4)
    val se = math.sqrt(va / na + vb / nb)
    assert(math.abs(r.getAs[Double]("t_stat") - (ma - mb) / se) < 1e-6)
    val dof = r.getAs[Double]("welch_dof")
    assert(dof >= math.min(na, nb) - 1 && dof <= na + nb - 2,
      s"Welch dof $dof outside [min(n)-1, n_a+n_b-2]")
  }
}
