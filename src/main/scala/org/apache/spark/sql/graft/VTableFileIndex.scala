package org.apache.spark.sql.graft

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex,
  HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** A Delta-style [[FileIndex]] over the versioned table's live file
  * groups — the binding every SURVEY "the group skipping a DSv2
  * filter-pushdown binding would do" note referred to, now actual
  * code: the table exposes itself as a STANDARD parquet relation, and
  * Catalyst's own planning drives the group skipping. `listFiles`
  * receives the query's data filters, extracts conservative [lo, hi]
  * bounds on the key column (=, <, <=, >, >=, BETWEEN and their
  * conjunctions, either operand order), and returns only the files of
  * groups whose log-recorded [min,max] key stats can match — file
  * pruning BEFORE any footer is opened, visible as `numFiles` in the
  * scan's metrics. Everything downstream is the stock parquet scan:
  * row-group pushdown, column pruning, vectorized read, whole-stage
  * codegen — nothing re-implemented.
  *
  * Scale posture: this is the shape that makes point/range lookups on
  * a 100 TB key-clustered table O(overlapping groups) THROUGH the
  * normal DataFrame API (`readIndexed(...).filter($"k" between ...)`)
  * instead of a side API ([[graft.sources.VersionedTable.readRange]]
  * remains for callers that want the opened-group count back).
  * Filters it cannot convert are simply not used for pruning — the
  * scan stays correct, just unpruned (the standard FileIndex
  * contract). Listing is resolved ONCE at construction (a snapshot,
  * like Delta's TahoeLogFileIndex); `refresh` is a no-op because the
  * groups of a pinned version are immutable.
  */
final class VTableFileIndex(
    spark: SparkSession,
    tablePath: String,
    keyCol: String,
    groups: Seq[(String, Option[Long], Option[Long])])
  extends FileIndex {

  private val hadoopFs =
    new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (stats, part files) per live group — one directory listing per
    * group at construction, hidden/metadata files excluded. */
  private val perGroup: Seq[((Option[Long], Option[Long]), Seq[FileStatus])] =
    groups.map { case (dir, lo, hi) =>
      val files = hadoopFs.listStatus(new Path(dir)).toSeq
        .filter(f => f.isFile && {
          val n = f.getPath.getName
          !n.startsWith("_") && !n.startsWith(".")
        })
      ((lo, hi), files)
    }

  override def rootPaths: Seq[Path] = Seq(new Path(tablePath))

  override def partitionSchema: StructType = new StructType()

  override def sizeInBytes: Long =
    perGroup.flatMap(_._2).map(_.getLen).sum

  override def inputFiles: Array[String] =
    perGroup.flatMap(_._2).map(_.getPath.toString).toArray

  override def refresh(): Unit = ()

  /** Conservative [lo, hi] bounds implied by the filter conjuncts on
    * the key column; None = unbounded on that side. Unconvertible
    * shapes contribute no bound (never wrong, only unpruned). */
  private def bounds(filters: Seq[Expression])
      : (Option[Long], Option[Long]) = {
    var lo = Option.empty[Long]
    var hi = Option.empty[Long]
    def tightenLo(v: Long): Unit = lo = Some(lo.fold(v)(math.max(_, v)))
    def tightenHi(v: Long): Unit = hi = Some(hi.fold(v)(math.min(_, v)))
    def longOf(l: Literal): Option[Long] = l.value match {
      case i: java.lang.Integer => Some(i.longValue())
      case i: java.lang.Long => Some(i.longValue())
      case i: java.lang.Short => Some(i.longValue())
      case i: java.lang.Byte => Some(i.longValue())
      case _ => None // non-integral literals: no pruning bound
    }
    def isKey(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name == keyCol
      case c: Cast => isKey(c.child)
      case _ => false
    }
    def walk(e: Expression): Unit = e match {
      case And(a, b) => walk(a); walk(b)
      case EqualTo(k, l: Literal) if isKey(k) =>
        longOf(l).foreach { v => tightenLo(v); tightenHi(v) }
      case EqualTo(l: Literal, k) if isKey(k) =>
        longOf(l).foreach { v => tightenLo(v); tightenHi(v) }
      case GreaterThan(k, l: Literal) if isKey(k) =>
        longOf(l).foreach(v => tightenLo(v + 1))
      case GreaterThanOrEqual(k, l: Literal) if isKey(k) =>
        longOf(l).foreach(tightenLo)
      case LessThan(k, l: Literal) if isKey(k) =>
        longOf(l).foreach(v => tightenHi(v - 1))
      case LessThanOrEqual(k, l: Literal) if isKey(k) =>
        longOf(l).foreach(tightenHi)
      case GreaterThan(l: Literal, k) if isKey(k) => // v > key == key < v
        longOf(l).foreach(v => tightenHi(v - 1))
      case GreaterThanOrEqual(l: Literal, k) if isKey(k) =>
        longOf(l).foreach(tightenHi)
      case LessThan(l: Literal, k) if isKey(k) =>
        longOf(l).foreach(v => tightenLo(v + 1))
      case LessThanOrEqual(l: Literal, k) if isKey(k) =>
        longOf(l).foreach(tightenLo)
      case _ => () // OR / IN / UDF / other columns: no bound
    }
    filters.foreach(walk)
    (lo, hi)
  }

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val (qLo, qHi) = bounds(dataFilters)
    val kept = perGroup.filter { case ((gLo, gHi), _) =>
      // a group without stats is conservatively kept; a query bound
      // absent on one side is unbounded there
      val loOk = (qHi, gLo) match {
        case (Some(h), Some(l)) => l <= h
        case _ => true
      }
      val hiOk = (qLo, gHi) match {
        case (Some(l), Some(h)) => l <= h
        case _ => true
      }
      loOk && hiOk
    }
    Seq(PartitionDirectory(InternalRow.empty,
      kept.flatMap(_._2).toArray[FileStatus]))
  }
}

object VTableFileIndex {
  /** Build the relation-integrated frame over resolved live groups:
    * a [[HadoopFsRelation]] on this index with the STOCK parquet
    * format — Catalyst plans it like any parquet table, and the
    * index's `listFiles` prunes groups from the key-column filters. */
  def frame(spark: SparkSession, tablePath: String, keyCol: String,
      groups: Seq[(String, Option[Long], Option[Long])],
      dataSchema: StructType): DataFrame = {
    val rel = HadoopFsRelation(
      new VTableFileIndex(spark, tablePath, keyCol, groups),
      partitionSchema = new StructType(),
      dataSchema = dataSchema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat(),
      options = Map.empty)(spark)
    Bridge.ofRows(spark, LogicalRelation(rel, isStreaming = false))
  }
}
