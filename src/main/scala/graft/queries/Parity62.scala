package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, StructField, StructType}

/** Round-13 batch 1: oracle rows for the load-path/sink operators that
  * were previously verified by ScalaTest specs only (round-12 verdict
  * item 1 — SURVEY.md §2 rows S3, S4, S5, S6, S7, S9, S11, P8). Each
  * row replays the stateful load INSIDE the query, the same move as
  * `x1_versioned_merge` / `s12_orc_roundtrip`: write to a per-sf
  * scratch directory, drive the operator through its real multi-step
  * protocol, and return a frame whose values a stateless DuckDB query
  * over the source parquet must reproduce bit-for-bit.
  *
  *  - `s3_csv_roundtrip` / `s4_json_roundtrip`: the reference lands
  *    CSV and JSON files in S3 before loading (hockeyreference_dag
  *    .py:44,48; nhl_api_dag.py:100-101). Write a typed slice through
  *    the text format and read it BACK with an explicit schema —
  *    doubles must survive shortest-round-trip printing, dates the
  *    ISO format.
  *  - `s5_partition_prune`: Sinks.writePartitioned layout (the S3
  *    `csv/<entity>/` prefix scheme as Hive partitioning) + a
  *    partition-filtered read-back; `n_part_dirs` pins the on-disk
  *    directory set (one per segment) so layout drift hash-fails.
  *    PlanShapeSpec pins PartitionFilters non-empty on this scan.
  *  - `s6_pattern_scan`: COPY INTO `PATTERN '.*json.*'`
  *    (copy_into_nhl_api_schedules.sql:14) — the stage holds BOTH
  *    json data files and csv decoys; only the glob-matched files
  *    may contribute rows.
  *  - `s7_copy_ledger`: the reference's whole identity — idempotent
  *    file-batch COPY INTO (copy_into_*.sql + Snowflake load
  *    history; dags/nhl_api_dag.py:245-292). Three ledgered loads:
  *    files {f0,f1}, the SAME batch replayed (must append 0), then
  *    {f1,f2} (must append only f2). Final table + all three
  *    append counts are hash-checked.
  *  - `s9_file_sensor`: file-arrival detection — snapshot the stage
  *    listing, land a second wave, and report only the newly-arrived
  *    files' rows (the batch form of the Airflow sensor the streaming
  *    source subsumes; StreamingSpec covers the continuous form).
  *  - `s11_incremental_sink`: dbt incremental delete+insert
  *    (games.sql:1-13) — batch 2 UPDATES overlapping keys (price
  *    doubled), so the read-back proves delete-then-insert rather
  *    than append-if-absent.
  *  - `s15_dpp_join`: DYNAMIC partition pruning — the partition
  *    filter arrives through a join against a filtered dimension
  *    rather than a literal, and the fact scan must still skip the
  *    unjoined partition directories at runtime (the 100 TB star-join
  *    shape; PlanShapeSpec pins the dynamicpruning expression).
  *  - `s14_csv_quarantine`: malformed-row quarantine (the engine's
  *    `ON_ERROR = CONTINUE` + rejected-records table; the reference
  *    inherits Snowflake's abort-on-error default, which a 100 TB
  *    load cannot afford) — a planted-bad-lines stage loads its good
  *    rows and audits the quarantined count.
  *  - `p8_payload_guard`: the empty-payload guard (nhl_api_dag
  *    .py:97-98 `if not response[...]: skip`) — per-nation payload
  *    batches where empty AND null payloads must both be skipped
  *    entirely, only non-empty batches load.
  *
  * Scale posture: the ledger/key anti-joins broadcast the small side
  * (file list / batch keys) so the big side never shuffles; the
  * partitioned write is the standard Hive-layout sink whose read-side
  * pruning is free; pattern scan and sensor are file-listing
  * operations (driver metadata, object-store amortized via prefixes).
  * Scratch I/O goes through the Hadoop FileSystem API with
  * scheme-qualified paths, so the same code runs against HDFS/s3a.
  */
object Parity62 {
  type Q = (SparkSession, String) => DataFrame

  /** Per-sf scratch dir (deterministic; cleaned/overwritten each run). */
  private def scratch(tag: String, d: String): String =
    Scratch.dir("load", tag, d)

  private def fs(s: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)

  private def clean(s: SparkSession, path: String): Unit =
    Scratch.clean(s, path)

  /** Names of the DATA files currently staged (markers skipped). */
  private def dataFiles(s: SparkSession, path: String): Seq[String] =
    fs(s, path).listStatus(new org.apache.hadoop.fs.Path(path))
      .iterator.map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith("."))
      .toSeq

  val queries: Map[String, Q] = Map(
    // ---- S3: CSV file sink round trip ------------------------------
    "s3_csv_roundtrip" -> { (s, d) =>
      val slice = orders(s, d).filter(col("o_orderkey") % 500 === 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"),
          col("o_orderdate").cast("date").as("o_orderdate"),
          col("o_orderpriority"))
      val path = scratch("csv", d)
      slice.write.mode("overwrite").option("header", true).csv(path)
      s.read.schema(StructType(Seq(
          StructField("o_orderkey", LongType),
          StructField("o_custkey", LongType),
          StructField("o_orderstatus", StringType),
          StructField("o_totalprice", DoubleType),
          StructField("o_orderdate", org.apache.spark.sql.types.DateType),
          StructField("o_orderpriority", StringType))))
        .option("header", true).csv(path)
        .orderBy(col("o_orderkey"))
    },

    // ---- S4: JSON file sink round trip -----------------------------
    "s4_json_roundtrip" -> { (s, d) =>
      val slice = part(s, d).filter(col("p_partkey") % 100 === 0)
        .select(col("p_partkey"), col("p_name"), col("p_size"),
          col("p_retailprice"))
      val path = scratch("json", d)
      slice.write.mode("overwrite").json(path)
      s.read.schema(StructType(Seq(
          StructField("p_partkey", LongType),
          StructField("p_name", StringType),
          StructField("p_size", IntegerType),
          StructField("p_retailprice", DoubleType))))
        .json(path)
        .orderBy(col("p_partkey"))
    },

    // ---- S5: partitioned layout + partition-pruned read-back -------
    "s5_partition_prune" -> { (s, d) =>
      val path = scratch("partseg", d)
      graft.sources.Sinks.writePartitioned(
        customer(s, d), path, Seq("c_mktsegment"))
      // one directory per segment on disk — pin the layout itself
      val nDirs = dataFiles(s, path)
        .count(_.startsWith("c_mktsegment=")).toLong
      s.read.parquet(path)
        .filter(col("c_mktsegment") === "BUILDING") // prunes to 1 dir
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("c_custkey")).as("min_key"),
          max(col("c_custkey")).as("max_key"))
        .withColumn("n_part_dirs", lit(nDirs))
        .orderBy(col("c_mktsegment"))
    },

    // ---- S6: stage scan with filename pattern ----------------------
    "s6_pattern_scan" -> { (s, d) =>
      val path = scratch("stage", d)
      clean(s, path)
      nation(s, d).write.mode("overwrite").json(path)
      // csv DECOYS land in the same stage — the pattern must skip them
      region(s, d).write.mode("append").csv(path)
      s.read.schema(StructType(Seq(
          StructField("n_nationkey", IntegerType),
          StructField("n_name", StringType),
          StructField("n_regionkey", IntegerType))))
        .option("pathGlobFilter", "*.json")
        .json(path)
        .orderBy(col("n_nationkey"))
    },

    // ---- S7: COPY INTO once-per-file ledger ------------------------
    "s7_copy_ledger" -> { (s, d) =>
      val target = scratch("ledger", d)
      clean(s, target)
      val src = orders(s, d).filter(col("o_orderkey") % 200 === 0)
        .select(col("o_orderkey"),
          concat(lit("f"), (expr("o_orderkey DIV 200") % 3)
            .cast(StringType)).as("source_file"),
          col("o_totalprice"))
      val batchA = src.filter(col("source_file").isin("f0", "f1"))
      val batchB = src.filter(col("source_file").isin("f1", "f2"))
      val n1 = graft.nhl.Ledger.copyInto(s, batchA, target)
      val n2 = graft.nhl.Ledger.copyInto(s, batchA, target) // replay: 0
      val n3 = graft.nhl.Ledger.copyInto(s, batchB, target) // f2 only
      graft.nhl.Ledger.readTarget(s, target).get
        .groupBy(col("source_file"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
        .withColumn("n_first", lit(n1))
        .withColumn("n_replay", lit(n2))
        .withColumn("n_second", lit(n3))
        .orderBy(col("source_file"))
    },

    // ---- S9: file-arrival sensor (batch form) ----------------------
    "s9_file_sensor" -> { (s, d) =>
      import s.implicits._
      val path = scratch("sensor", d)
      clean(s, path)
      customer(s, d).filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey"), col("c_mktsegment"))
        .write.mode("overwrite").json(path)
      // sensor snapshot: the stage listing at last poll
      val seen = dataFiles(s, path).toDF("file_name")
      // wave 2 arrives (1 file — deterministic new-file count)
      customer(s, d).filter(col("c_custkey") % 10 === 5)
        .select(col("c_custkey"), col("c_mktsegment"))
        .repartition(1).write.mode("append").json(path)
      val now = s.read.schema(StructType(Seq(
          StructField("c_custkey", LongType),
          StructField("c_mktsegment", StringType))))
        .json(path)
        .select(col("*"), col("_metadata.file_name").as("file_name"))
      // one scan: both the per-segment stats and the new-file count
      // feed off a single materialized pass over the anti-join (the
      // lazy twin would re-list + re-parse the stage per consumer)
      val fresh = now.join(broadcast(seen), Seq("file_name"), "left_anti")
        .localCheckpoint(true)
      fresh.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_rows"), min(col("c_custkey")).as("min_key"))
        .crossJoin(broadcast(
          fresh.agg(countDistinct(col("file_name")).as("n_new_files"))))
        .orderBy(col("c_mktsegment"))
    },

    // ---- S11: incremental delete+insert sink -----------------------
    "s11_incremental_sink" -> { (s, d) =>
      val target = scratch("deleteinsert", d)
      clean(s, target)
      val batch1 = orders(s, d).filter(col("o_orderkey") % 400 === 0)
        .select(col("o_orderkey"), col("o_totalprice").as("price"),
          lit(1L).as("batch_id"))
      val batch2 = orders(s, d).filter(col("o_orderkey") % 800 === 0)
        .select(col("o_orderkey"),
          (col("o_totalprice") * 2).as("price"), // updated values
          lit(2L).as("batch_id"))
      graft.nhl.Ledger.deleteInsert(s, batch1, target, "o_orderkey")
      graft.nhl.Ledger.deleteInsert(s, batch2, target, "o_orderkey")
      graft.nhl.Ledger.readTarget(s, target).get
        .orderBy(col("o_orderkey"))
        .select(col("o_orderkey"), col("price"), col("batch_id"))
    },

    // ---- S15: DYNAMIC partition pruning through a join -------------
    // s5 pins STATIC pruning (a literal partition filter); at 100 TB
    // the partition filter usually arrives through a JOIN — the fact
    // is partitioned on a key the query only constrains via a filtered
    // dimension. Spark's dynamic partition pruning plants a subquery
    // filter on the fact scan at runtime, so only the joined
    // partitions' directories are read. PlanShapeSpec pins the
    // dynamicpruning expression in the scan; this row hash-checks the
    // join result through the partitioned layout.
    "s15_dpp_join" -> { (s, d) =>
      val path = scratch("dppfact", d)
      graft.sources.Sinks.writePartitioned(
        orders(s, d).select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice"), col("o_orderpriority")),
        path, Seq("o_orderpriority"))
      val fact = s.read.parquet(path)
      // dimension side: priorities 1-URGENT / 2-HIGH only — the fact
      // partitions for 3/4/5 must never be read (DPP, not a literal)
      val dim = orders(s, d).select(col("o_orderpriority")).distinct()
        .filter(col("o_orderpriority") < "3")
      fact.join(dim, Seq("o_orderpriority"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy(col("o_orderpriority"))
    },

    // ---- S14: malformed-row quarantine (ON_ERROR = CONTINUE) -------
    // The engine-side equivalent of COPY INTO with a rejected-records
    // table (Ingest.withCsvQuarantine): land a stage whose every 5th
    // nation line carries an unparseable regionkey, load PERMISSIVE,
    // and emit the GOOD typed rows plus the quarantined-line count —
    // at 100 TB one bad row must neither kill the load nor vanish
    // without audit.
    "s14_csv_quarantine" -> { (s, d) =>
      val path = scratch("quar", d)
      clean(s, path)
      nation(s, d).select(concat_ws(",",
          col("n_nationkey"), col("n_name"),
          when(col("n_nationkey") % 5 === 0, lit("not-a-number"))
            .otherwise(col("n_regionkey").cast(StringType))).as("value"))
        .write.mode("overwrite").text(path)
      val schema = StructType(Seq(
        StructField("n_nationkey", IntegerType),
        StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType)))
      graft.nhl.Ingest.withCsvQuarantine(s, path, schema) { (good, bad) =>
        // both halves consumed INSIDE the bracket (the parse cache is
        // unpersisted on exit): good rows + the quarantine audit count
        val out = good
          .crossJoin(broadcast(bad.agg(count(lit(1)).as("n_quarantined"))))
          .orderBy(col("n_nationkey"))
        // materialize before the cache is released
        out.localCheckpoint(true)
      }
    },

    // ---- P8: payload-presence guard --------------------------------
    "p8_payload_guard" -> { (s, d) =>
      // per-nation payload batches; most nations' payloads come back
      // EMPTY (no deep-debt customers) or never come back (no join
      // row -> null) — the guard must skip both shapes entirely
      val payloads = nation(s, d)
        .join(customer(s, d).filter(col("c_acctbal") < -900)
            .select(col("c_nationkey"), col("c_custkey")),
          col("c_nationkey") === col("n_nationkey"), "left")
        .groupBy(col("n_nationkey"), col("n_name"))
        .agg(sort_array(collect_list(col("c_custkey"))).as("payload"))
      payloads
        .filter(coalesce(size(col("payload")), lit(0)) > 0) // the guard
        .select(col("n_nationkey"), col("n_name"),
          size(col("payload")).cast(LongType).as("n_payload"),
          element_at(col("payload"), 1).as("min_key"))
        .orderBy(col("n_nationkey"))
    })

  val oracles: Map[String, String] = Map(
    "s3_csv_roundtrip" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
         FROM orders WHERE o_orderkey % 500 = 0
         ORDER BY o_orderkey""",
    "s4_json_roundtrip" ->
      """SELECT p_partkey, p_name, p_size, p_retailprice
         FROM part WHERE p_partkey % 100 = 0
         ORDER BY p_partkey""",
    "s5_partition_prune" ->
      """SELECT c_mktsegment, count(*) AS n_rows,
           min(c_custkey) AS min_key, max(c_custkey) AS max_key,
           (SELECT count(DISTINCT c_mktsegment) FROM customer)
             AS n_part_dirs
         FROM customer WHERE c_mktsegment = 'BUILDING'
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "s6_pattern_scan" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
         ORDER BY n_nationkey""",
    "s7_copy_ledger" ->
      """WITH src AS (
           SELECT o_orderkey,
             'f' || CAST((o_orderkey // 200) % 3 AS VARCHAR)
               AS source_file
           FROM orders WHERE o_orderkey % 200 = 0)
         SELECT source_file, count(*) AS n_rows,
           min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
           (SELECT count(*) FROM src WHERE source_file IN ('f0','f1'))
             AS n_first,
           CAST(0 AS BIGINT) AS n_replay,
           (SELECT count(*) FROM src WHERE source_file = 'f2')
             AS n_second
         FROM src GROUP BY source_file ORDER BY source_file""",
    "s9_file_sensor" ->
      """SELECT c_mktsegment, count(*) AS n_rows,
           min(c_custkey) AS min_key, CAST(1 AS BIGINT) AS n_new_files
         FROM customer WHERE c_custkey % 10 = 5
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "s11_incremental_sink" ->
      """SELECT o_orderkey,
           CASE WHEN o_orderkey % 800 = 0 THEN o_totalprice * 2
                ELSE o_totalprice END AS price,
           CASE WHEN o_orderkey % 800 = 0 THEN CAST(2 AS BIGINT)
                ELSE CAST(1 AS BIGINT) END AS batch_id
         FROM orders WHERE o_orderkey % 400 = 0
         ORDER BY o_orderkey""",
    "s15_dpp_join" ->
      """SELECT o_orderpriority, count(*) AS n_rows,
           min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
         FROM orders WHERE o_orderpriority < '3'
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "s14_csv_quarantine" ->
      """SELECT n_nationkey, n_name, n_regionkey,
           (SELECT count(*) FROM nation WHERE n_nationkey % 5 = 0)
             AS n_quarantined
         FROM nation WHERE n_nationkey % 5 <> 0
         ORDER BY n_nationkey""",
    "p8_payload_guard" ->
      """SELECT n_nationkey, n_name, count(*) AS n_payload,
           min(c_custkey) AS min_key
         FROM nation JOIN customer ON c_nationkey = n_nationkey
         WHERE c_acctbal < -900
         GROUP BY n_nationkey, n_name ORDER BY n_nationkey"""
  )
}
