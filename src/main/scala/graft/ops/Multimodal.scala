package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2.8 north-star): treat
  * image/audio/video payloads as opaque `binary` columns + typed
  * metadata, with decode/feature-extraction as per-partition batch
  * functions.
  *
  * The decode step is STUBBED (this container has no image/audio
  * codecs): `decodeStub` produces a deterministic fake feature vector
  * from the bytes. Everything around it — schema, batching,
  * partitioning, the mapPartitions seam where a JNI/codec library
  * would plug in — is real and tested. On a cluster the partition
  * iterator amortizes per-batch model/codec setup exactly like a
  * Pandas UDF's Arrow batches do in PySpark.
  */
object Multimodal {

  /** Canonical media-row schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType),      // image | audio | video
    StructField("mime", StringType),
    StructField("payload", BinaryType),
    StructField("width", IntegerType),        // image/video
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))    // audio/video

  final case class MediaRow(media_id: Long, modality: String, mime: String,
      payload: Array[Byte], width: Option[Int], height: Option[Int],
      duration_ms: Option[Long])

  final case class MediaFeatures(media_id: Long, modality: String,
      n_bytes: Int, feature: Array[Float])

  /** Wrap any table as media rows by treating a string column as the
    * opaque payload (test/demo harness: documents.text -> bytes). */
  def fromText(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      lit("image").as("modality"),
      lit("application/octet-stream").as("mime"),
      col(textCol).cast(BinaryType).as("payload"),
      lit(null).cast(IntegerType).as("width"),
      lit(null).cast(IntegerType).as("height"),
      lit(null).cast(LongType).as("duration_ms"))

  /** STUB decode: a real implementation would decode the payload with
    * an image/audio codec here; the container has none, so this
    * derives a deterministic 8-dim pseudo-feature from byte content.
    * The seam (per-partition iterator, batch-amortized setup) is the
    * production shape. */
  def decodeStub(bytes: Array[Byte], dim: Int = 8): Array[Float] = {
    // ??? <- real codec goes here (e.g. JPEG decode + pooled embedding)
    val out = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      out(i % dim) = out(i % dim) + (bytes(i) & 0xFF) / 255.0f
      i += 1
    }
    out
  }

  /** Per-partition feature extraction over the opaque payloads.
    * mapPartitions (not per-row UDF) so codec/model initialization is
    * amortized per partition — the Scala analog of mapInPandas. */
  def extractFeatures(spark: SparkSession, media: DataFrame,
      dim: Int = 8): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("modality"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup happens once, here (codec handles etc.)
        it.map { case (id, modality, payload) =>
          MediaFeatures(id, modality, payload.length,
            decodeStub(payload, dim))
        }
      }
  }

  /** Resize stub: deterministic downsample of the opaque payload by
    * `factor` (every factor-th byte), with metadata kept consistent —
    * the plumbing a real image resize (decode → scale → re-encode)
    * plugs into at the same mapPartitions seam. */
  def resizeStub(spark: SparkSession, media: DataFrame,
      factor: Int = 4): DataFrame = {
    import spark.implicits._
    require(factor >= 1)
    media.select(col("media_id"), col("modality"), col("mime"),
      col("payload"), col("width"), col("height"))
      .as[(Long, String, String, Array[Byte], Option[Int], Option[Int])]
      .mapPartitions { it =>
        // per-partition setup (real codec/scaler handle) goes here
        it.map { case (id, modality, mime, payload, w, h) =>
          val sampled = payload.grouped(factor).map(_.head).toArray
          (id, modality, mime, sampled, w.map(_ / factor), h.map(_ / factor))
        }
      }
      .toDF("media_id", "modality", "mime", "payload", "width", "height")
  }

  /** Resize/frame-sample stub with the same per-partition seam:
    * emits fixed-stride byte samples as "frames". */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      stride: Int = 64): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        payload.grouped(stride).zipWithIndex.map {
          case (frame, idx) => (id, idx, frame.length)
        }
      }
      .toDF("media_id", "frame_idx", "frame_bytes")
  }
}
