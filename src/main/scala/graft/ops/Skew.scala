package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SURVEY.md §4, 100 TB posture).
  *
  * AQE's skew-join splitting (enabled in GraftSession) covers most
  * cases at runtime; explicit salting remains the tool when one join
  * key dominates so heavily that even split partitions hot-spot, or
  * when AQE is unavailable (streaming joins).
  *
  * `saltedJoin` replicates the (small) right side `salt` times and
  * scatters the left side across the replicas, so a single hot key
  * spreads over `salt` tasks. Inner equi-join semantics preserved
  * exactly — every left row meets exactly one replica of each
  * matching right row.
  */
object Skew {

  /** Deterministic salt in [0, salt) per left row: hash of the whole
    * row spreads even a constant-key input. */
  private def saltCol(df: DataFrame, salt: Int): Column =
    pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(salt))

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salt: Int = 8): DataFrame = {
    val saltedLeft = left.withColumn("_salt", saltCol(left, salt))
    val replicatedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1)).cast("array<bigint>")))
    saltedLeft.join(replicatedRight, Seq(key, "_salt"), "inner")
      .drop("_salt")
  }
}
