package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (mandated extension, builder prompt): treat
  * image/audio/video payloads as opaque `binary` columns with typed metadata,
  * and run decode / feature-extract / resize / frame-sample as partition-wise
  * batch transforms.
  *
  * The actual media decode is STUBBED (no image/audio libraries in this
  * container — see [[StubCodec]], a deterministic fake); everything
  * Spark-side is real and tested: the schema contract, the
  * `mapPartitions`-based batched execution (the Scala-native twin of a
  * Pandas-UDF-over-mapInPandas pipeline: one codec instantiation per
  * partition, rows streamed through it lazily), and the partitioning posture
  * (media blobs are large — repartition by byte budget before decode so a
  * 100 TB corpus doesn't OOM executors on skewed partitions).
  */
object Multimodal {

  /** Typed media row: payload + metadata, the at-rest schema contract. */
  final case class MediaRow(
      media_id: Long,
      modality: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      mime: String,
      width: Int, // images/video; -1 otherwise
      height: Int,
      sample_rate: Int, // audio; -1 otherwise
      n_frames: Int) // video; -1 otherwise

  final case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Long,
      feature: Array[Float])

  /** Pluggable decoder. Real deployments bind JNI/FFmpeg/ImageIO here; the
    * container has none of those, so the default is [[StubCodec]].
    */
  trait Codec extends Serializable {
    def decodeToFeature(payload: Array[Byte], dim: Int): Array[Float]
  }

  /** Deterministic fake decode: hashes the payload into a fixed-dim
    * pseudo-feature. Stands in for a real embedding model so the pipeline
    * shape (schema, batching, partitioning) is exercised end-to-end.
    */
  object StubCodec extends Codec {
    def decodeToFeature(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
      i = 0
      while (i < dim) {
        h ^= h << 13; h ^= h >>> 7; h ^= h << 17 // xorshift64
        out(i) = (h & 0xffff).toFloat / 65535f
        i += 1
      }
      out
    }
  }

  /** Synthesize a deterministic media table from `documents` (the container
    * ships no media fixtures): payload = utf-8 bytes of the text. Gives the
    * decode pipeline real bytes with reproducible content.
    */
  def syntheticMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("application/octet-stream").as("mime"),
      lit(64).as("width"), lit(64).as("height"),
      lit(16000).as("sample_rate"), lit(30).as("n_frames"))
      .as[MediaRow]
  }

  /** Batched decode → feature extraction. `mapPartitions` so codec setup
    * happens once per partition (the moral equivalent of a Pandas UDF batch);
    * `targetPartitions` caps per-task byte volume for large blobs.
    */
  def extractFeatures(
      media: Dataset[MediaRow],
      codec: Codec = StubCodec,
      dim: Int = 16,
      targetPartitions: Int = 0): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    val sized = if (targetPartitions > 0) media.repartition(targetPartitions) else media
    sized.mapPartitions { rows =>
      rows.map { r =>
        MediaFeatures(r.media_id, r.modality, r.payload.length.toLong,
          codec.decodeToFeature(r.payload, dim))
      }
    }
  }

  /** Frame-sample stub for video rows: every k-th frame index within
    * n_frames — the index arithmetic is real, the frame fetch is the codec's
    * job. Demonstrates explode-style fan-out with bounded row width.
    */
  def sampleFrames(media: Dataset[MediaRow], everyK: Int = 10): DataFrame =
    media.toDF()
      // n_frames <= 0 (empty clip, or the schema's -1 "unknown" marker)
      // must yield zero frames, not a sequence() bounds error
      .where(col("modality") === "video" && col("n_frames") > 0)
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyK))).as("frame_idx"))
}
