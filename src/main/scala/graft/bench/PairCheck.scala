package graft.bench

import graft.{GraftSession, Tables}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextOps}

/** Scratch tool: does the PRODUCTION xxhash near-dup pipeline emit
  * exactly the brute-force exact-similarity set on the test data?
  * If yes (deterministically — xxhash is), the rows-only queries
  * x2_minhash_lsh / x2_simhash can carry a full DuckDB oracle.
  */
object PairCheck {

  private def exactPairs(spark: SparkSession, docs: DataFrame,
      tau: Double): DataFrame = {
    val sets = docs
      .select(col("doc_id").as("id"),
        array_distinct(TextOps.shingles(col("text"))).as("sh"))
      .filter(size(col("sh")) > 0)
    sets.select(col("id").as("id_a"), col("sh").as("sh_a"))
      .crossJoin(sets.select(col("id").as("id_b"), col("sh").as("sh_b")))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        TextOps.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= tau)
  }

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "pair-check")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val docs = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
      val exact = exactPairs(spark, docs, 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val exactSet = exact.map(t => (t._1, t._2)).toSet
      val mh = pairSet(Dedup.minhashNearDupPairs(docs, tau = 0.5))
      val sh = pairSet(Dedup.simhashNearDupPairs(docs, maxHamming = 3))
      println(s"== $sf: exact(J>=0.5)=${exactSet.size} mh=${mh.size} sh=${sh.size}")
      println(s"   mh == exact: ${mh == exactSet}; mh missing=${(exactSet -- mh).size} extra=${(mh -- exactSet).size}")
      // at which tau does each blocking have recall EXACTLY 1?
      for (t <- Seq(0.5, 0.6, 0.7, 0.8, 0.9)) {
        val ex = exact.filter(_._3 >= t).map(p => (p._1, p._2)).toSet
        println(f"   tau=$t%.1f exact=${ex.size}%4d  mhMiss=${(ex -- mh).size}%3d shMiss=${(ex -- sh).size}%3d")
      }
      // exact-J distribution of sh-emitted pairs (pairs below any tau
      // would force the verify threshold down)
      val shJ = exact.filter(p => sh.contains((p._1, p._2))).map(_._3)
      println(s"   sh∩exact(0.5): n=${shJ.size} minJ=${if (shJ.isEmpty) -1 else shJ.min}; sh-outside-exact=${(sh -- exactSet).size}")
      val margJ = exact.filter(t => t._3 < 0.7).sortBy(_._3)
      println(s"   exact pairs with J in [0.5,0.7): ${margJ.size} " +
        margJ.take(12).map(t => f"${t._3}%.3f").mkString(","))
    }
    spark.stop()
  }
}
