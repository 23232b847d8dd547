package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Round-12 batch 9: storage-format breadth — the two ingestion paths
  * the parquet-only surface did not yet pin.
  *
  *  - `s12_orc_roundtrip`: ORC write → read round trip over the mixed
  *    physical types that actually bite in format conversions
  *    (DOUBLE, TIMESTAMP, VARCHAR, INT/BIGINT). The query writes a
  *    lineitem slice to ORC (Spark's built-in datasource — columnar,
  *    predicate-pushdown-capable, the other lake format next to
  *    parquet) and returns what it reads BACK; the oracle is the same
  *    slice straight from parquet, so any value drift through the ORC
  *    writer/reader (decimal rescale, date epoch, string truncation)
  *    hash-fails the row (doubles must survive bit-for-bit,
  *    timestamps to the micro).
  *
  *  - `s13_binary_ingest`: the production multimodal INGEST path. The
  *    other mm_* rows synthesize payload columns in-flight; real
  *    pipelines land media as FILES and read them with Spark's
  *    `binaryFile` source (content + path + length per file). This row
  *    writes the synthetic WAV corpus as files (one .wav per media id,
  *    written from the executors through the Hadoop FileSystem API
  *    against a SCHEME-QUALIFIED stage path — so the write lands on
  *    the shared store the path names, not executor-local disk, and
  *    the claim holds beyond local mode), reads it back via binaryFile,
  *    parses the media id out of the file PATH, RIFF-decodes the
  *    content, and emits the exact audio stats — the same stats (and
  *    the same DuckDB oracle shape) as `mm_audio`, so the equality
  *    proves file write → binaryFile scan → WAV parse end to end.
  *
  * Scale posture: the ORC write/read is the plain columnar path
  * (pushdown + pruning verified by the standard datasource); the
  * binaryFile scan parallelizes per file with
  * `spark.sql.files.maxPartitionBytes` batching — the decode stays in
  * mapPartitions exactly like the payload-column path, so the only
  * new cost is the file-listing, which object stores amortize via
  * partitioned prefixes.
  */
object Parity60 {
  type Q = (SparkSession, String) => DataFrame

  /** Per-sf scratch dir (deterministic; overwritten each run). */
  private def scratch(tag: String, d: String): String =
    Scratch.dir("fmt", tag, d)

  val queries: Map[String, Q] = Map(
    // ---- ORC round trip --------------------------------------------
    "s12_orc_roundtrip" -> { (s, d) =>
      val slice = lineitem(s, d)
        .filter(col("l_orderkey") % 1000 === 0)
        .select(col("l_orderkey"), col("l_linenumber").cast(LongType)
            .as("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"),
          col("l_returnflag"), col("l_shipdate"))
      val path = scratch("orc", d)
      slice.write.mode("overwrite").orc(path)
      s.read.orc(path)
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // ---- binaryFile media ingest -----------------------------------
    "s13_binary_ingest" -> { (s, d) =>
      import s.implicits._
      val root = new org.apache.hadoop.fs.Path(scratch("wav", d))
      val fsys = root.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fsys.exists(root)) fsys.delete(root, true) // recursive
      fsys.mkdirs(root)
      // SCHEME-QUALIFIED stage path: executors resolve the FileSystem
      // from the URI itself, so the same code lands files on whatever
      // shared store the path names (file:// here; hdfs:///s3a:// on a
      // cluster — executor-local java.io writes would be invisible to
      // the scan there)
      val stage = fsys.makeQualified(root).toString
      // land the corpus as real .wav FILES, written from executors
      // through the Hadoop FS API
      documents(s, d).filter(col("doc_id") < 200)
        .select(col("doc_id").cast(LongType)).as[Long]
        .foreachPartition { (it: Iterator[Long]) =>
          // default Hadoop conf on the executor: scheme handlers for
          // the shared store come from core-site.xml there
          val conf = new org.apache.hadoop.conf.Configuration()
          val dirP = new org.apache.hadoop.fs.Path(stage)
          // a PRIVATE FileSystem instance (newInstance, not the
          // process-wide get() cache): the checksum toggle below must
          // not leak into Spark's committers / every other query's
          // file:// I/O in this JVM
          val efs = org.apache.hadoop.fs.FileSystem
            .newInstance(dirP.toUri, conf)
          try {
            // media payloads need no client-side .crc sidecars (the
            // checksummed local connector otherwise doubles every
            // write — measured 10x on the 200-file fixture; remote
            // stores do their own integrity)
            efs.setWriteChecksum(false)
            it.foreach { id =>
              val n = graft.ops.Multimodal.synthAudioLen(id)
              val samples = Array.tabulate(n)(i =>
                graft.ops.Multimodal.synthSample(id, i))
              val out = efs.create(
                new org.apache.hadoop.fs.Path(dirP, f"media_$id%06d.wav"),
                true)
              try out.write(graft.ops.Multimodal.encodeWavPcm16(samples))
              finally out.close()
            }
          } finally efs.close()
        }
      // the production ingest: binaryFile scan -> id from path ->
      // RIFF decode -> exact stats (mm_audio's contract)
      val media = s.read.format("binaryFile")
        .option("pathGlobFilter", "*.wav").load(stage)
        .select(
          regexp_extract(col("path"), "media_(\\d+)\\.wav$", 1)
            .cast(LongType).as("media_id"),
          col("content").as("payload"))
      graft.ops.Multimodal.decodeAudioStats(s, media).toDF()
        .orderBy(col("media_id"))
    })

  val oracles: Map[String, String] = Map(
    "s12_orc_roundtrip" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           l_quantity, l_extendedprice, l_returnflag, l_shipdate
         FROM lineitem WHERE l_orderkey % 1000 = 0
         ORDER BY l_orderkey, l_linenumber""",
    "s13_binary_ingest" ->
      """WITH d AS (SELECT doc_id,
             CAST(64 + doc_id % 64 AS BIGINT) AS n FROM documents
           WHERE doc_id < 200),
         i AS (SELECT CAST(unnest(generate_series(0, 127)) AS BIGINT)
             AS i),
         sm AS (SELECT d.doc_id, d.n, i.i,
             (d.doc_id * 31 + i.i * 17) % 2048 - 1024 AS v
           FROM d CROSS JOIN i WHERE i.i < d.n),
         zc AS (SELECT doc_id, i, v,
             lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
           FROM sm)
         SELECT doc_id AS media_id, n AS n_samples,
           CAST(n * 1000 // 8000 AS BIGINT) AS duration_ms,
           CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
           CAST(sum(v * v) AS BIGINT) AS energy,
           CAST(sum(CASE WHEN pv IS NOT NULL
             AND ((pv < 0) <> (v < 0)) THEN 1 ELSE 0 END) AS BIGINT)
             AS zero_cross
         FROM zc JOIN d USING (doc_id)
         GROUP BY doc_id, n ORDER BY media_id"""
  )
}
