package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (mandated extension, builder prompt): treat
  * image/audio/video payloads as opaque `binary` columns with typed metadata,
  * and run decode / feature-extract / resize / frame-sample as partition-wise
  * batch transforms.
  *
  * Decode status by modality: IMAGES are REAL ([[ImageIoCodec]] — the JDK's
  * own `javax.imageio` decodes PNG/JPEG/BMP/GIF, no external library
  * needed); WAV/AIFF AUDIO is REAL ([[WavCodec]] on `javax.sound.sampled`,
  * also JDK-built-in); VIDEO is REAL for MJPEG-in-AVI and animated GIF
  * ([[VideoCodecs.AviVideoCodec]] — a RIFF walker plus the JDK JPEG/GIF
  * readers); inter-frame codecs (H.264/VP9) still need FFmpeg-class
  * libraries the container lacks and fall back to [[StubCodec]].
  * Everything Spark-side is shared and tested either way: the schema
  * contract, the `mapPartitions`-based batched execution (the Scala-native
  * twin of a Pandas-UDF-over-mapInPandas pipeline: one codec instantiation
  * per partition, rows streamed through it lazily), and the partitioning
  * posture (media blobs are large — repartition by byte budget before
  * decode so a 100 TB corpus doesn't OOM executors on skewed partitions).
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

  /** Pluggable decoder. [[ImageIoCodec]] and [[WavCodec]] are real JDK-only
    * implementations; bind JNI/FFmpeg here for video. [[StubCodec]] remains
    * the default so feature extraction stays total on any byte soup.
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

  /** REAL image decode on the JDK's built-in `javax.imageio` — PNG / JPEG /
    * BMP / GIF / WBMP readers ship inside every Java 17 runtime, so "no
    * media libraries in the container" does not block images. The feature
    * is a g×g mean-luminance grid (g = ⌊√dim⌋): bilinear downscale via
    * Java2D (raster-only — headless-safe, no display needed), Rec.601 luma
    * per cell, row-major, zero-padded to `dim`. This is the classic tiny
    * perceptual descriptor family (the same grid that feeds pHash's DCT).
    *
    * Payloads ImageIO cannot parse fall back to [[StubCodec]] so mixed or
    * corrupt corpora degrade deterministically instead of failing tasks;
    * use [[imageMeta]] upstream to count/route undecodable rows when that
    * matters.
    */
  object ImageIoCodec extends Codec {
    def decodeToFeature(payload: Array[Byte], dim: Int): Array[Float] = {
      val img = decode(payload)
      if (img == null) StubCodec.decodeToFeature(payload, dim)
      else featureOf(img, dim)
    }

    /** The luminance-grid descriptor of an already-decoded image — shared
      * with the video codec ([[VideoCodecs.AviVideoCodec]] averages it over
      * sampled frames without re-encoding them).
      */
    private[ext] def featureOf(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
      val g = math.max(1, math.sqrt(dim.toDouble).toInt)
      val small = scaled(img, g, g)
      val out = new Array[Float](dim)
      var y = 0
      while (y < g) {
        var x = 0
        while (x < g) {
          val rgb = small.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          out(y * g + x) = lum / 255f
          x += 1
        }
        y += 1
      }
      out
    }

    private[ext] def decode(payload: Array[Byte]): java.awt.image.BufferedImage =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }

    private[ext] def scaled(img: java.awt.image.BufferedImage,
        w: Int, h: Int): java.awt.image.BufferedImage = {
      import java.awt.RenderingHints
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g2 = out.createGraphics()
      g2.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
        RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g2.drawImage(img, 0, 0, w, h, null)
      g2.dispose()
      out
    }
  }

  /** Image metadata probe without a full pixel decode: (width, height,
    * format) from the ImageIO header readers, None for unparseable bytes.
    * This is how [[MediaRow]]'s width/height columns get REAL values.
    */
  def imageMeta(payload: Array[Byte]): Option[(Int, Int, String)] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try { r.setInput(iis); Some((r.getWidth(0), r.getHeight(0), r.getFormatName)) }
        finally r.dispose()
      }
    } catch { case _: Exception => None } finally iis.close()
  }

  /** Real resize: decode → bilinear scale → re-encode as PNG bytes.
    * None for unparseable payloads. The per-row body of a batched
    * thumbnail/normalization pass ([[extractFeatures]]-style mapPartitions).
    */
  def resizeImage(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    val img = ImageIoCodec.decode(payload)
    if (img == null) None
    else {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(ImageIoCodec.scaled(img, w, h), "png", bos)
      Some(bos.toByteArray)
    }
  }

  /** REAL audio decode for WAV/AIFF/AU via the JDK's built-in
    * `javax.sound.sampled` (no external audio library): the feature is RMS
    * energy per window over `dim` equal windows of the 16-bit PCM stream,
    * normalized to [0, 1]. Unparseable payloads fall back to [[StubCodec]].
    */
  object WavCodec extends Codec {
    def decodeToFeature(payload: Array[Byte], dim: Int): Array[Float] = {
      val samples = pcmSamples(payload)
      if (samples == null || samples.isEmpty) StubCodec.decodeToFeature(payload, dim)
      else {
        val out = new Array[Float](dim)
        val win = math.max(1, samples.length / dim)
        var w = 0
        while (w < dim) {
          val from = w * win
          val until = math.min(samples.length, from + win)
          if (from < samples.length) {
            var acc = 0.0; var i = from
            while (i < until) { val s = samples(i) / 32768.0; acc += s * s; i += 1 }
            out(w) = math.sqrt(acc / (until - from)).toFloat
          }
          w += 1
        }
        out
      }
    }

    private[ext] def pcmSamples(payload: Array[Byte]): Array[Short] =
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val fmt = ais.getFormat
          if (fmt.getSampleSizeInBits != 16) null
          else {
            val bytes = ais.readAllBytes()
            val n = bytes.length / 2
            val out = new Array[Short](n)
            val big = fmt.isBigEndian
            var i = 0
            while (i < n) {
              val (b0, b1) = (bytes(2 * i) & 0xff, bytes(2 * i + 1) & 0xff)
              out(i) = (if (big) (b0 << 8) | b1 else (b1 << 8) | b0).toShort
              i += 1
            }
            out
          }
        } finally ais.close()
      } catch { case _: Exception => null }
  }

  /** Audio metadata probe: (sample rate Hz, n PCM frames), None when the
    * JDK cannot parse the container format.
    */
  def audioMeta(payload: Array[Byte]): Option[(Int, Long)] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try Some((ais.getFormat.getSampleRate.toInt, ais.getFrameLength))
      finally ais.close()
    } catch { case _: Exception => None }

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
