package graft.ext

import java.nio.{ByteBuffer, ByteOrder}

/** REAL video decode with zero external dependencies, closing the last
  * modality gap in [[Multimodal]]: the JDK cannot decode H.264/VP9 (that
  * genuinely needs FFmpeg-class codecs), but two real video container
  * formats ARE fully decodable on a bare Java 17 runtime:
  *
  *  - MJPEG-in-AVI: the AVI container is a RIFF chunk tree, and each
  *    Motion-JPEG frame chunk (`00dc`/`00db`) is a standalone JPEG the JDK's
  *    `javax.imageio` decodes. MJPEG remains the lingua franca of webcams,
  *    capture cards, and intermediate editing formats.
  *  - Animated GIF: `ImageIO`'s GIF reader is multi-frame aware.
  *
  * The RIFF walker is written from the public AVI/RIFF layout (chunk =
  * fourcc + u32le size + payload + even-pad; `LIST`/`RIFF` chunks carry a
  * form fourcc and nest). Frame features reuse [[Multimodal.ImageIoCodec]]'s
  * luminance grid, averaged over a bounded frame sample so cost per row is
  * O(sampled frames), not O(clip length).
  */
object VideoCodecs {

  /** Parsed AVI main header (the `avih` chunk). */
  final case class AviMeta(
      width: Int, height: Int, totalFrames: Int, microSecPerFrame: Int)

  private def fourcc(buf: ByteBuffer): String = {
    val b = new Array[Byte](4)
    buf.get(b)
    new String(b, java.nio.charset.StandardCharsets.US_ASCII)
  }

  /** Depth-first walk of a RIFF chunk tree invoking `sink(id, payload)` for
    * every leaf chunk. Tolerant of truncated trailers (stops at the first
    * malformed length) — corpus files are byte soup until proven otherwise.
    */
  private def walk(buf: ByteBuffer, sink: (String, Array[Byte]) => Unit): Unit = {
    while (buf.remaining() >= 8) {
      val id = fourcc(buf)
      val size = buf.getInt() // u32le; AVI files beyond 2 GB use ODML extensions
      if (size < 0 || size > buf.remaining()) return
      if (id == "RIFF" || id == "LIST") {
        if (size < 4) return
        val sub = buf.slice(buf.position(), size).order(ByteOrder.LITTLE_ENDIAN)
        fourcc(sub) // form type ('AVI ', 'hdrl', 'movi', …) — walk everything
        walk(sub, sink)
      } else {
        val payload = new Array[Byte](size)
        buf.slice(buf.position(), size).get(payload)
        sink(id, payload)
      }
      // chunks are even-aligned, but a final odd chunk may legally omit the
      // pad byte at EOF — advancing past the limit must end the walk, not
      // throw out of ByteBuffer.position
      val next = buf.position() + size + (size & 1)
      if (next > buf.limit()) return
      buf.position(next)
    }
  }

  private def riffBuffer(payload: Array[Byte]): Option[ByteBuffer] =
    if (payload.length < 12 ||
      !(payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' && payload(3) == 'F'))
      None
    else Some(ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN))

  /** Compressed frame payloads (`##dc`/`##db` chunks) in stream order.
    * Empty for anything that is not a parseable RIFF/AVI container.
    */
  def aviFrames(payload: Array[Byte]): Vector[Array[Byte]] =
    riffBuffer(payload) match {
      case None => Vector.empty
      case Some(buf) =>
        val out = Vector.newBuilder[Array[Byte]]
        walk(buf, (id, body) => {
          val kind = id.substring(2)
          if ((kind == "dc" || kind == "db") && body.nonEmpty) out += body
        })
        out.result()
    }

  /** Header metadata from the `avih` chunk without touching frame data. */
  def aviMeta(payload: Array[Byte]): Option[AviMeta] =
    riffBuffer(payload).flatMap { buf =>
      var meta: Option[AviMeta] = None
      walk(buf, (id, body) =>
        if (id == "avih" && meta.isEmpty && body.length >= 40) {
          val b = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
          val micros = b.getInt(0)
          val frames = b.getInt(16)
          val w = b.getInt(32)
          val h = b.getInt(36)
          meta = Some(AviMeta(w, h, frames, micros))
        })
      meta
    }

  /** Container-agnostic (width, height, n_frames) probe for [[Multimodal]]'s
    * metadata columns: AVI answers from the `avih` header alone (no frame
    * decode); other containers fall back to counting ImageIO frames (GIF
    * headers do not carry a frame count).
    */
  def videoMeta(payload: Array[Byte]): Option[(Int, Int, Int)] =
    aviMeta(payload) match {
      case Some(m) => Some((m.width, m.height, m.totalFrames))
      case None =>
        // metadata must report the TRUE frame count — no sampling cap here
        val frames = imageIoFrames(payload, maxFrames = Int.MaxValue)
        if (frames.isEmpty) None
        else Some((frames.head.getWidth, frames.head.getHeight, frames.size))
    }

  /** Decoded frames of a multi-image container (animated GIF; any format
    * whose ImageIO reader is sequence-aware): every `everyK`-th frame, at
    * most `maxFrames` KEPT — skipped indices are never passed to `read`, so
    * sampling cost follows frames kept, matching the AVI path's contract.
    */
  def imageIoFrames(payload: Array[Byte], maxFrames: Int = 64,
      everyK: Int = 1): Vector[java.awt.image.BufferedImage] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) Vector.empty
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          // allowSearch=false avoids a full-stream scan; fall back to probing
          val declared = r.getNumImages(false)
          val out = Vector.newBuilder[java.awt.image.BufferedImage]
          var i = 0
          var kept = 0
          var done = false
          while (!done && kept < maxFrames && (declared < 0 || i < declared)) {
            try { out += r.read(i); kept += 1; i += everyK }
            catch { case _: IndexOutOfBoundsException | _: java.io.IOException => done = true }
          }
          out.result()
        } finally r.dispose()
      }
    } catch { case _: Exception => Vector.empty } finally iis.close()
  }

  /** Decoded frames from either supported container: MJPEG-AVI chunks run
    * through the JPEG reader; otherwise the payload is probed as a
    * multi-frame ImageIO stream (animated GIF). `everyK` samples every k-th
    * frame BEFORE decoding — the AVI path never decodes skipped frames, so
    * sampling cost scales with frames kept, not clip length.
    */
  def decodeFrames(payload: Array[Byte], everyK: Int = 1,
      maxFrames: Int = 64): Vector[java.awt.image.BufferedImage] = {
    require(everyK >= 1, s"everyK must be >= 1: $everyK")
    val avi = aviFrames(payload)
    if (avi.nonEmpty)
      avi.iterator.zipWithIndex.collect { case (f, i) if i % everyK == 0 => f }
        .flatMap(f => Option(Multimodal.ImageIoCodec.decode(f)))
        .take(maxFrames).toVector
    else
      imageIoFrames(payload, maxFrames, everyK)
  }

  /** REAL video feature codec: mean of the per-frame luminance grids
    * ([[Multimodal.ImageIoCodec]]'s descriptor) over a bounded frame sample.
    * Payloads that decode to zero frames fall back to [[Multimodal.StubCodec]]
    * so the pipeline stays total on corrupt bytes — same contract as the
    * image and audio codecs.
    */
  object AviVideoCodec extends Multimodal.Codec {
    // every frame up to the cap: short clips keep full temporal coverage,
    // long clips are bounded by MaxFrames (decode cost stays O(MaxFrames))
    private val SampleEveryK = 1
    private val MaxFrames = 16

    def decodeToFeature(payload: Array[Byte], dim: Int): Array[Float] = {
      val frames = decodeFrames(payload, SampleEveryK, MaxFrames)
      if (frames.isEmpty) Multimodal.StubCodec.decodeToFeature(payload, dim)
      else {
        val acc = new Array[Float](dim)
        frames.foreach { img =>
          val f = Multimodal.ImageIoCodec.featureOf(img, dim)
          var i = 0
          while (i < dim) { acc(i) += f(i); i += 1 }
        }
        var i = 0
        while (i < dim) { acc(i) /= frames.size; i += 1 }
        acc
      }
    }
  }
}
