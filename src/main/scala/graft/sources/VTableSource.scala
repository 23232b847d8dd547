package graft.sources

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister,
  RelationProvider}

/** Standard reader-API binding for the versioned table:
  * {{{
  *   spark.read.format("graft-vtable")
  *     .option("keyCol", "k")          // stats column for pruning
  *     .option("versionAsOf", "7")     // optional time travel
  *     .load(tablePath)
  * }}}
  * resolves the snapshot's live groups and returns the SAME
  * [[org.apache.spark.sql.graft.VTableFileIndex]]-backed parquet
  * relation as [[VersionedTable.readIndexed]] — Catalyst's filter
  * pushdown prunes file groups by the log's key stats, and the scan
  * is the stock vectorized parquet read. Registered through
  * `DataSourceRegister` (META-INF/services), so the short name works
  * in `spark.read.format(...)` and `CREATE TABLE ... USING
  * graft-vtable` alike.
  *
  * Same faithfulness gate as readIndexed: snapshots carrying deletion
  * vectors, column mapping, or mixed per-group schemas cannot be
  * represented as a flat file relation — those REFUSE with the API to
  * use instead ([[VersionedTable.read]], the reconciling path), never
  * silently mis-reading. */
class VTableSource extends RelationProvider with DataSourceRegister {

  override def shortName(): String = "graft-vtable"

  override def createRelation(ctx: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-vtable: a table path is required — .load(<path>)"))
    val keyCol = parameters.getOrElse("keyCol", "k")
    val asOf = parameters.get("versionAsOf").map(_.toLong)
    val spark = ctx.sparkSession
    val df = VersionedTable.readIndexed(spark, path, keyCol, asOf)
      .getOrElse(throw new IllegalArgumentException(
        s"graft-vtable: snapshot at $path" +
          asOf.fold("")(v => s" v$v") +
          " is empty or not flat-relation-representable (deletion " +
          "vectors / column mapping / mixed schemas) — use " +
          "VersionedTable.read, the reconciling path"))
    // the frame readIndexed builds IS a LogicalRelation over the
    // HadoopFsRelation — unwrap it for the V1 contract
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation
      case other => throw new IllegalStateException(
        s"unexpected plan shape from readIndexed: ${other.nodeName}")
    }
  }
}
