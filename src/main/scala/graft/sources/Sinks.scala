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

  /** Z-ordered parquet: range-partition + sort by the 2-D Morton key
    * so every output file covers a tight rectangle in (colA, colB)
    * space — parquet row-group min-max stats (and file-stats indexes
    * in Delta/Iceberg-style formats) then prune scans filtered on
    * EITHER column, where a lexicographic (colA, colB) sort only helps
    * colA. `nFiles` sizes the range partitioning: pick
    * total-bytes / target-file-bytes at scale. */
  def writeZOrdered(df: DataFrame, path: String, colA: String,
      colB: String, nFiles: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    writeCurveOrdered(df, path, colA, colB, nFiles, mode,
      graft.functions.ZOrder2.zorder2)

  /** Hilbert-ordered parquet: same grid-normalize + range-partition +
    * sort layout as [[writeZOrdered]], keyed by the Hilbert index
    * instead of the Morton key. The Hilbert curve walk never jumps
    * (consecutive indices are grid neighbors — HilbertSpec pins it),
    * so consecutive FILES are edge-adjacent regions: range scans over
    * the clustering key touch contiguous file runs, and worst-case
    * file extents at un-aligned cuts are tighter than Morton's
    * quadrant jumps. Preferred for range-heavy filters on both keys;
    * Morton remains marginally cheaper to compute (no rotation state). */
  def writeHilbertOrdered(df: DataFrame, path: String, colA: String,
      colB: String, nFiles: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    writeCurveOrdered(df, path, colA, colB, nFiles, mode,
      graft.functions.Hilbert2.hilbert2)

  private def writeCurveOrdered(df: DataFrame, path: String, colA: String,
      colB: String, nFiles: Int, mode: SaveMode,
      curve: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
        org.apache.spark.sql.Column): Unit = {
    import org.apache.spark.sql.functions.{col, greatest, lit, max, min}
    import org.apache.spark.sql.types.{DoubleType, LongType}
    // Interleaving RAW values degenerates when the dims differ in
    // magnitude (a 2000-range key's high bits dominate a 100-range
    // key entirely), so normalize both onto a common 16-bit grid
    // first — one tiny min/max aggregate, the same move as the
    // range-id normalization in production OPTIMIZE ZORDER
    // implementations. Linear scaling assumes roughly uniform keys;
    // for heavy skew substitute a rank (ntile) per column.
    val r = df.agg(
      min(col(colA).cast(LongType)), max(col(colA).cast(LongType)),
      min(col(colB).cast(LongType)), max(col(colB).cast(LongType))).head()
    // Degenerate key stats: honor the nFiles layout contract even
    // when Z-ordering is impossible — empty/all-null-both-keys input
    // writes nFiles plain files; one all-null key falls back to 1-D
    // range clustering on the other (still prunes on that column).
    if (r.isNullAt(0) && r.isNullAt(2)) {
      df.repartition(nFiles).write.mode(mode).parquet(path)
      return
    }
    if (r.isNullAt(0) || r.isNullAt(2)) {
      val c = if (r.isNullAt(0)) colB else colA
      df.repartitionByRange(nFiles, col(c))
        .sortWithinPartitions(col(c))
        .write.mode(mode).parquet(path)
      return
    }
    // Scale in DOUBLE: (v - lo) * 65535 in long arithmetic overflows
    // once the key range exceeds ~2^47 (an ArithmeticException under
    // ANSI mode). The double path is exact enough for a 16-bit grid.
    def grid(c: String, lo: Long, hi: Long) =
      ((col(c).cast(LongType) - lit(lo)).cast(DoubleType) * lit(65535.0) /
        greatest(lit(hi - lo), lit(1L)).cast(DoubleType)).cast(LongType)
    val z = curve(
      grid(colA, r.getLong(0), r.getLong(1)),
      grid(colB, r.getLong(2), r.getLong(3)))
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(mode).parquet(path)
  }

  /** Small-file compaction (the OPTIMIZE/rewrite half of a table
    * maintenance job): rewrite a fragmented parquet directory into
    * files sized near `targetBytes`. Streaming sinks, incremental
    * loads, and fine-grained partitioned writes all accumulate small
    * files; at 100 TB each scan task then pays open/footer overhead
    * per tiny file and the driver pays listing — the classic lakehouse
    * tax. File count = ceil(on-disk bytes / targetBytes), measured
    * from the source listing (not row estimates), so the rewrite is
    * one job whose output partitioning IS the desired layout.
    *
    * Writes to `destPath` — pair with an atomic directory swap in the
    * table format / metastore (a plain FS rename is not transactional,
    * so the swap is deliberately left to the catalog layer). On a
    * Hive-partitioned source the partition columns are read back as
    * data columns and the dest is written FLAT — compact each
    * partition directory separately to preserve the layout. */
  def compact(spark: SparkSession, srcPath: String, destPath: String,
      targetBytes: Long = 128L << 20): Long = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val src = new org.apache.hadoop.fs.Path(srcPath)
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // sum DATA files only: _SUCCESS, .crc and other hidden markers
    // would otherwise pad the byte total and drift the planned file
    // count off the data-bytes target
    def dataBytes(p: org.apache.hadoop.fs.Path): Long =
      fs.listStatus(p).iterator.map { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) 0L
        else if (st.isDirectory) dataBytes(st.getPath)
        else st.getLen
      }.sum
    val bytes = if (fs.exists(src)) dataBytes(src) else 0L
    // an empty/markers-only directory has nothing to rewrite (and
    // spark.read.parquet on it cannot infer a schema) — report 0
    // planned files and leave dest untouched instead of throwing
    // mid-maintenance-job
    if (bytes == 0) return 0L
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(srcPath)
      .repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(destPath)
    nFiles.toLong
  }
}
