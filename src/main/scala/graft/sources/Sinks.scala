package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Write-side layout helpers (SURVEY.md §2 row S5: the reference's
  * `csv/<entity>/`, `json/<entity>/` S3 prefixes become table
  * partition layout).
  *
  * Partitioned parquet gives file-index partition pruning on read:
  * a filter on the partition column never touches other directories.
  * Bucketing co-locates join keys so repeated equi-joins on the
  * bucket column shuffle neither side (requires saveAsTable — a
  * metastore-backed table).
  */
object Sinks {

  /** Hive-style partitioned parquet: one directory per value of each
    * partition column. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed + sorted managed table (shuffle-free equi-joins between
    * tables bucketed the same way on the same key). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table) // managed under spark.sql.warehouse.dir
}
