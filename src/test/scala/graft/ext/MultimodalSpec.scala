package graft.ext

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val docs = {
    import spark.implicits._
    Seq((0L, "some image bytes", "en", "s", 16L),
      (1L, "some audio bytes", "en", "s", 16L),
      (2L, "some video bytes", "en", "s", 16L),
      (5L, "other video bytes", "en", "s", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("syntheticMedia assigns modalities round-robin and carries payload bytes") {
    val media = Multimodal.syntheticMedia(spark, docs)
    val rows = media.collect().map(r => r.media_id -> r).toMap
    assert(rows(0L).modality == "image")
    assert(rows(1L).modality == "audio")
    assert(rows(2L).modality == "video")
    assert(new String(rows(0L).payload, "UTF-8") == "some image bytes")
  }

  test("extractFeatures is deterministic per payload and batch-shaped") {
    val media = Multimodal.syntheticMedia(spark, docs)
    val f1 = Multimodal.extractFeatures(media, dim = 8, targetPartitions = 2)
      .collect().map(r => r.media_id -> r.feature.toSeq).toMap
    val f2 = Multimodal.extractFeatures(media, dim = 8)
      .collect().map(r => r.media_id -> r.feature.toSeq).toMap
    assert(f1 == f2) // partitioning must not change results
    assert(f1(0L).length == 8)
    assert(f1(0L) != f1(1L)) // different payloads -> different features
    val nb = Multimodal.extractFeatures(media, dim = 8).collect()
      .find(_.media_id == 0L).get.n_bytes
    assert(nb == "some image bytes".length.toLong)
  }

  test("sampleFrames explodes every k-th frame index for video rows only") {
    val media = Multimodal.syntheticMedia(spark, docs)
    val frames = Multimodal.sampleFrames(media, everyK = 10)
    val byId = frames.groupBy("media_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // n_frames=30 -> indices 0,10,20
    assert(byId == Map(2L -> 3L, 5L -> 3L))
  }

  test("sampleFrames yields zero frames (not an error) for empty/unknown clips") {
    import spark.implicits._
    val broken = Seq(
      Multimodal.MediaRow(9L, "video", Array[Byte](1), "m", -1, -1, -1, 0),
      Multimodal.MediaRow(10L, "video", Array[Byte](1), "m", -1, -1, -1, -1))
      .toDS()
    assert(Multimodal.sampleFrames(broken, everyK = 10).count() == 0)
  }

  // ---- real JDK codecs ----

  private def pngBytes(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def wavBytes(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("ImageIoCodec decodes real PNGs: luminance grid tracks image content") {
    val dark = pngBytes(32, 32)((_, _) => 0x101010)
    val bright = pngBytes(32, 32)((_, _) => 0xf0f0f0)
    // left half black, right half white -> grid cells split by column
    val split = pngBytes(32, 32)((x, _) => if (x < 16) 0x000000 else 0xffffff)
    val fDark = Multimodal.ImageIoCodec.decodeToFeature(dark, 16)
    val fBright = Multimodal.ImageIoCodec.decodeToFeature(bright, 16)
    val fSplit = Multimodal.ImageIoCodec.decodeToFeature(split, 16)
    assert(fDark.length == 16 && fBright.length == 16)
    assert(fDark.forall(v => v >= 0f && v < 0.2f), fDark.toSeq)
    assert(fBright.forall(_ > 0.8f), fBright.toSeq)
    // 4x4 grid, row-major: columns 0-1 dark, 2-3 bright on every row
    assert(fSplit.grouped(4).forall(row => row(0) < 0.3f && row(3) > 0.7f), fSplit.toSeq)
    // corrupt payload degrades to the stub, not an exception
    assert(Multimodal.ImageIoCodec.decodeToFeature(Array[Byte](1, 2, 3), 16).length == 16)
  }

  test("imageMeta and resizeImage are real round-trips through javax.imageio") {
    val png = pngBytes(40, 24)((x, y) => (x * 6) << 16 | (y * 10) << 8)
    assert(Multimodal.imageMeta(png) == Some((40, 24, "png")))
    val resized = Multimodal.resizeImage(png, 10, 6).get
    assert(Multimodal.imageMeta(resized) == Some((10, 6, "png")))
    assert(Multimodal.imageMeta("not an image".getBytes) == None)
    assert(Multimodal.resizeImage("not an image".getBytes, 4, 4) == None)
  }

  test("WavCodec decodes real WAV: RMS energy separates loud and quiet windows") {
    // first half silence, second half a loud square wave
    val n = 8000
    val samples = Array.tabulate[Short](n)(i =>
      if (i < n / 2) 0 else if ((i / 8) % 2 == 0) 20000 else -20000)
    val wav = wavBytes(16000, samples)
    assert(Multimodal.audioMeta(wav) == Some((16000, n.toLong)))
    val f = Multimodal.WavCodec.decodeToFeature(wav, 8)
    assert(f.length == 8)
    assert(f.take(4).forall(_ < 0.01f), f.toSeq) // silent half
    assert(f.drop(4).forall(_ > 0.5f), f.toSeq)  // loud half
    assert(Multimodal.audioMeta(Array[Byte](9, 9, 9)) == None)
  }

  test("extractFeatures with the real image codec runs batched over a media table") {
    import spark.implicits._
    val rows = (0L until 6L).map { i =>
      val shade = (i * 40).toInt
      Multimodal.MediaRow(i, "image",
        pngBytes(16, 16)((_, _) => shade << 16 | shade << 8 | shade),
        "image/png", 16, 16, -1, -1)
    }
    val feats = Multimodal.extractFeatures(rows.toDS(),
        codec = Multimodal.ImageIoCodec, dim = 16, targetPartitions = 3)
      .collect().sortBy(_.media_id)
    // mean luminance must increase with the painted shade
    val means = feats.map(f => f.feature.sum / f.feature.length)
    assert(means.zip(means.tail).forall { case (a, b) => a < b }, means.toSeq)
  }
}
