package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness testdata tables (TESTDATA.md).
  *
  * Plain `spark.read.parquet` — schema comes from parquet footers
  * (deterministic), column pruning and predicate pushdown reach the
  * scan for free. At 100 TB these would be partitioned/bucketed table
  * paths; the loader signature stays the same.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Footer-derived schema per table path, resolved once per JVM.
    * Each bare `spark.read.parquet(path)` infers schema by reading
    * parquet footers again; across a 114-query benchmark run that is
    * pure repeated driver I/O. Passing the cached StructType skips
    * inference (the testdata is immutable for a run). The nanosAsLong
    * conf participates in inference, so it keys the cache too. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), org.apache.spark.sql.types.StructType]()

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val nanos = spark.conf.getOption(
      "spark.sql.legacy.parquet.nanosAsLong").getOrElse("false")
    val schema = schemaCache.computeIfAbsent((path, nanos),
      _ => spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = t(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** events with `ts` normalized to epoch-NANOSECOND BIGINT, whatever
    * the parquet physically stores. The testdata has shipped two
    * representations across harness runs:
    *   - INT64 timestamp[ns] — Spark 4 refuses it unless
    *     `spark.sql.legacy.parquet.nanosAsLong=true`, which reads it as
    *     LongType nanos (the conf participates in schema inference, so
    *     it must be set BEFORE the read);
    *   - timestamp[us] — reads as Timestamp(NTZ)Type; convert with
    *     unix_micros × 1000 (exact: micros fit 2^63/1000).
    * Downstream event-time math is integer arithmetic on the nano
    * value either way — exact, timezone-free, and bit-identical to the
    * DuckDB oracle's `epoch_us(ts)` (which also accepts both). */
  def eventsNs(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    withTsNs(events(s, d))
  }

  /** Normalize a `ts` column to epoch-nanos BIGINT in place. Pure
    * column rewrite — works on batch AND streaming frames (the
    * StreamingSpec readStream paths hit the same representation
    * drift). */
  def withTsNs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampType =>
        df.withColumn("ts", unix_micros(col("ts")) * 1000L)
      case TimestampNTZType =>
        // session TZ is pinned UTC everywhere (GraftSession/Bench/Verify),
        // so NTZ -> TZ cast is the identity on the micros value
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case other =>
        throw new IllegalStateException(s"events.ts: unsupported type $other")
    }
  }
}
