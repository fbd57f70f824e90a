package graft.ext

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import javax.imageio.ImageIO
import org.scalatest.funsuite.AnyFunSuite

/** Real-fixture tests for the pure-JDK video decode path: the suite BUILDS a
  * spec-conformant MJPEG AVI (RIFF → LIST hdrl(avih) → LIST movi(00dc…)) and
  * a multi-frame GIF, then decodes them back through [[VideoCodecs]].
  */
class VideoCodecsSpec extends AnyFunSuite {

  // ---- fixture builders -----------------------------------------------

  private def frameImage(w: Int, h: Int, shade: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g2 = img.createGraphics()
    g2.setColor(new java.awt.Color(shade, shade, shade))
    g2.fillRect(0, 0, w, h)
    g2.dispose()
    img
  }

  private def jpegBytes(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val pad = body.length & 1
    val out = ByteBuffer.allocate(8 + body.length + pad).order(ByteOrder.LITTLE_ENDIAN)
    out.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
    out.array()
  }

  private def list(form: String, bodies: Array[Byte]*): Array[Byte] =
    chunk("LIST", form.getBytes("US-ASCII") ++ bodies.flatten)

  private def avihBody(w: Int, h: Int, nFrames: Int, microsPerFrame: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(0, microsPerFrame)
    b.putInt(16, nFrames)
    b.putInt(24, 1) // dwStreams
    b.putInt(32, w)
    b.putInt(36, h)
    b.array()
  }

  /** Minimal spec-shaped MJPEG AVI: RIFF('AVI ', LIST hdrl(avih), LIST movi(00dc…)). */
  private def mjpegAvi(frames: Seq[BufferedImage], microsPerFrame: Int = 33333): Array[Byte] = {
    val (w, h) = if (frames.isEmpty) (0, 0) else (frames.head.getWidth, frames.head.getHeight)
    val hdrl = list("hdrl", chunk("avih", avihBody(w, h, frames.size, microsPerFrame)))
    val movi = list("movi", frames.map(f => chunk("00dc", jpegBytes(f))): _*)
    chunk("RIFF", "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi)
  }

  private def animatedGif(frames: Seq[BufferedImage]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(f =>
        writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  private val shades = Seq(20, 120, 230)
  private lazy val avi = mjpegAvi(shades.map(frameImage(32, 24, _)))
  private lazy val gif = animatedGif(shades.map(frameImage(16, 16, _)))

  // ---- AVI path --------------------------------------------------------

  test("aviFrames extracts every MJPEG chunk; frames decode to the right pixels") {
    val frames = VideoCodecs.aviFrames(avi)
    assert(frames.size == 3)
    val decoded = frames.map(Multimodal.ImageIoCodec.decode)
    assert(decoded.forall(img => img != null && img.getWidth == 32 && img.getHeight == 24))
    // JPEG is lossy but a flat gray frame survives within a small tolerance
    decoded.zip(shades).foreach { case (img, shade) =>
      val lum = img.getRGB(16, 12) & 0xff
      assert(math.abs(lum - shade) < 10, s"expected ~$shade got $lum")
    }
  }

  test("aviMeta reads width/height/frame-count from the header without decoding") {
    assert(VideoCodecs.aviMeta(avi).contains(VideoCodecs.AviMeta(32, 24, 3, 33333)))
    assert(VideoCodecs.videoMeta(avi).contains((32, 24, 3)))
  }

  test("decodeFrames everyK samples frames before decoding") {
    assert(VideoCodecs.decodeFrames(avi).size == 3)
    assert(VideoCodecs.decodeFrames(avi, everyK = 2).size == 2) // frames 0 and 2
    assert(VideoCodecs.decodeFrames(avi, maxFrames = 1).size == 1)
    intercept[IllegalArgumentException](VideoCodecs.decodeFrames(avi, everyK = 0))
  }

  // ---- GIF path --------------------------------------------------------

  test("animated GIF decodes to all frames via the multi-frame ImageIO reader") {
    val frames = VideoCodecs.decodeFrames(gif)
    assert(frames.size == 3)
    frames.zip(shades).foreach { case (img, shade) =>
      // GIF is palette-quantized; the flat shade survives within tolerance
      val lum = img.getRGB(8, 8) & 0xff
      assert(math.abs(lum - shade) < 16, s"expected ~$shade got $lum")
    }
    assert(VideoCodecs.videoMeta(gif).contains((16, 16, 3)))
  }

  // ---- codec contract --------------------------------------------------

  test("AviVideoCodec features track frame content and stay total on byte soup") {
    val dim = 16
    val dark = VideoCodecs.AviVideoCodec.decodeToFeature(
      mjpegAvi(Seq.fill(2)(frameImage(32, 24, 10))), dim)
    val bright = VideoCodecs.AviVideoCodec.decodeToFeature(
      mjpegAvi(Seq.fill(2)(frameImage(32, 24, 240))), dim)
    assert(dark.forall(_ < 0.2), dark.mkString(","))
    assert(bright.forall(_ > 0.8), bright.mkString(","))
    // mean over frames: half-dark half-bright lands in the middle
    val mixed = VideoCodecs.AviVideoCodec.decodeToFeature(
      mjpegAvi(Seq(frameImage(32, 24, 10), frameImage(32, 24, 240))), dim)
    assert(mixed.forall(v => v > 0.3 && v < 0.7), mixed.mkString(","))
    // garbage bytes: deterministic stub fallback, never a throw
    val junk = Array.tabulate[Byte](100)(i => (i * 7).toByte)
    val f1 = VideoCodecs.AviVideoCodec.decodeToFeature(junk, dim)
    val f2 = VideoCodecs.AviVideoCodec.decodeToFeature(junk, dim)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == dim)
  }

  test("an odd-sized final chunk with no pad byte ends the walk cleanly") {
    // writers may omit the even-pad at EOF: declared size is valid but the
    // aligned next-chunk position is one past the buffer — must not throw
    val odd = Array[Byte]('j', 'u', 'n') // 3 bytes, odd
    val noPadChunk = java.nio.ByteBuffer
      .allocate(8 + odd.length).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("00dc".getBytes("US-ASCII")).putInt(odd.length).put(odd).array()
    val movi = "movi".getBytes("US-ASCII") ++ noPadChunk
    val avi2 = java.nio.ByteBuffer.allocate(12 + 8 + movi.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes("US-ASCII")).putInt(4 + 8 + movi.length)
      .put("AVI ".getBytes("US-ASCII"))
      .put("LIST".getBytes("US-ASCII")).putInt(movi.length).put(movi)
      .array()
    val frames = VideoCodecs.aviFrames(avi2)
    assert(frames.size == 1 && frames.head.sameElements(odd))
    VideoCodecs.AviVideoCodec.decodeToFeature(avi2, 4) // junk frame → stub, no throw
  }

  test("GIF path samples BEFORE decoding: everyK and maxFrames match the AVI semantics") {
    assert(VideoCodecs.decodeFrames(gif, everyK = 2).size == 2) // frames 0, 2
    val sampled = VideoCodecs.decodeFrames(gif, everyK = 2)
    assert(math.abs((sampled.head.getRGB(8, 8) & 0xff) - shades.head) < 16)
    assert(math.abs((sampled(1).getRGB(8, 8) & 0xff) - shades(2)) < 16)
    assert(VideoCodecs.decodeFrames(gif, maxFrames = 1).size == 1)
  }

  test("videoMeta reports the true GIF frame count past the sampling cap") {
    val long = animatedGif((0 until 70).map(i => frameImage(8, 8, (i * 3) % 255)))
    assert(VideoCodecs.videoMeta(long).contains((8, 8, 70)))
  }

  test("truncated AVI degrades to the frames that fit, not an exception") {
    val cut = avi.take(avi.length / 2)
    val frames = VideoCodecs.aviFrames(cut)
    assert(frames.size < 3) // tolerant walker stops at the malformed tail
    VideoCodecs.AviVideoCodec.decodeToFeature(cut, 8) // must not throw
  }

  test("extractFeatures runs the real video codec through the batched Spark path") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "video", avi, "video/x-msvideo", 32, 24, -1, 3),
      Multimodal.MediaRow(2L, "video", gif, "image/gif", 16, 16, -1, 3))
      .toDS()
    val out = Multimodal.extractFeatures(media, VideoCodecs.AviVideoCodec, dim = 9)
      .collect().map(f => f.media_id -> f).toMap
    assert(out.size == 2)
    assert(out(1L).feature.length == 9 && out(2L).feature.length == 9)
    assert(out(1L).n_bytes == avi.length.toLong)
  }
}
