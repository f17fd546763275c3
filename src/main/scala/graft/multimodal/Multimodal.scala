package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.ops.{TextOps, VectorOps}

/** Opaque media blob + typed metadata — the multimodal column design:
  * media rides as `binary` with a typed struct beside it; decode/transform
  * stages are per-partition batched functions over the bytes. */
final case class MediaRow(
    media_id: Long,
    kind: String,            // image | audio | video
    mime: String,
    bytes: Array[Byte],
    width: Int,              // images/video
    height: Int,
    duration_ms: Long,       // audio/video
    source_url: String)

final case class MediaFeatures(
    media_id: Long,
    kind: String,
    feature: Array[Float],   // unit-norm embedding
    lsh_bucket: Int,
    decode_ok: Boolean)

/**
 * Multimodal pipeline plumbing (builder-prompt first-class component):
 * image/audio/video as opaque `binary` columns with typed metadata, and
 * decode / feature-extract / resize / frame-sample as batched per-partition
 * stages — the Scala equivalent of `mapInPandas` batches is `mapPartitions`
 * over the typed Dataset (one JVM-side batch per partition, setup amortized).
 *
 * Codec status: IMAGE decode + feature-extract + resize are REAL via the
 * JDK's `javax.imageio`, whose readers here cover JPEG, TIFF, BMP, GIF,
 * WBMP and PNG (`ImageIO.getReaderFormatNames()` on this JDK) — the
 * synthetic corpus plants genuine PNG, JPEG and GIF bytes so the real path
 * is exercised across formats. AUDIO decode is REAL for uncompressed PCM
 * via the JDK's `javax.sound.sampled` (WAV/AIFF/AU readers) — the corpus
 * plants genuine PCM16 WAVs whose sample rate / frame count / duration
 * the decode must recover, with per-window RMS features. Only VIDEO and
 * compressed-audio codecs do not ship in this container (no ffmpeg), so
 * those paths remain clearly-marked deterministic stubs derived from the
 * content hash. The Spark-side contract — schema, partitioning, batch
 * shape, unit-norm feature vectors, LSH bucketing — is identical on both
 * paths; swapping a real codec in changes only the function bodies.
 */
object Multimodal {

  val FeatureDim = 64

  // ---- REAL codec path (javax.imageio: PNG/BMP ship in every JDK) ----

  /** PNG magic sniff (public spec: 0x89 'P' 'N' 'G' \r \n 0x1a \n). */
  def isPng(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length > 8 &&
      (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G'

  /** REAL decode via ImageIO; None when no installed reader handles the
    * bytes (→ caller falls back to the stub path). */
  def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  /** REAL feature: `grid`×`grid` block mean-luminance vector, unit-norm —
    * deterministic pixel math over the decoded bitmap. */
  def luminanceFeature(img: java.awt.image.BufferedImage, grid: Int = 8): Array[Float] = {
    val w = img.getWidth; val h = img.getHeight
    val sums = new Array[Double](grid * grid)
    val counts = new Array[Int](grid * grid)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
        val cell = math.min(grid - 1, y * grid / h) * grid + math.min(grid - 1, x * grid / w)
        sums(cell) += lum; counts(cell) += 1
        x += 1
      }
      y += 1
    }
    val v = Array.tabulate(grid * grid)(i => if (counts(i) == 0) 0f else (sums(i) / counts(i)).toFloat)
    VectorOps.normalize(v)
  }

  /** REAL resize: nearest-neighbor scale → PNG bytes (ImageIO's PNG writer
    * emits no timestamps — output is a pure function of the pixels). */
  def resizeImage(img: java.awt.image.BufferedImage, w: Int, h: Int): Array[Byte] = {
    val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out.setRGB(x, y, img.getRGB(x * img.getWidth / w, y * img.getHeight / h))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  /** Deterministic pseudo-random RGB bitmap (the pixel source behind every
    * generated test image/frame: splitmix stream over the seed). */
  def makeBitmap(seed: Long, w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var state = seed
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        state = TextOps.mix64(state)
        img.setRGB(x, y, (state & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Deterministic REAL image bytes for the synthetic corpus, encoded by
    * the JDK's own writers (no timestamps — output a pure function of the
    * pixels) — exercises the real decode path end-to-end per format. */
  def makeImage(seed: Long, w: Int = 24, h: Int = 24, format: String = "png"): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(makeBitmap(seed, w, h), format, bos)
    bos.toByteArray
  }

  def makePng(seed: Long, w: Int = 24, h: Int = 24): Array[Byte] = makeImage(seed, w, h, "png")

  // ---- animated GIF: REAL multi-frame read/write (javax.imageio) ----

  /** Encode an animated GIF — `nFrames` deterministic frames, each with a
    * GraphicControlExtension `delayTime` of `delayCs` centiseconds (the
    * published GIF89a field), via the JDK's own GIF sequence writer. */
  def makeAnimatedGif(seed: Long, w: Int, h: Int, nFrames: Int,
                      delayCs: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    // memory-cached for the same reason gifFrames' read side is: the
    // factory default backs the stream with a temp file until close
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var k = 0
    while (k < nFrames) {
      val img = makeBitmap(TextOps.mix64(seed ^ (k + 1).toLong), w, h)
      val param = writer.getDefaultWriteParam
      val meta = writer.getDefaultImageMetadata(
        new javax.imageio.ImageTypeSpecifier(img), param)
      val fmt = meta.getNativeMetadataFormatName // javax_imageio_gif_image_1.0
      val root = meta.getAsTree(fmt).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      val gce = new javax.imageio.metadata.IIOMetadataNode("GraphicControlExtension")
      gce.setAttribute("disposalMethod", "none")
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("delayTime", delayCs.toString)
      gce.setAttribute("transparentColorIndex", "0")
      root.appendChild(gce)
      meta.setFromTree(fmt, root)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta), param)
      k += 1
    }
    writer.endWriteSequence()
    ios.close()
    bos.toByteArray
  }

  /** REAL animated-GIF read: `(delayCs, frame)` per frame, in order. Empty
    * for non-GIF bytes — callers route those to the single-image path. */
  def gifFrames(bytes: Array[Byte]): Vector[(Int, java.awt.image.BufferedImage)] = {
    // MemoryCacheImageInputStream, NOT ImageIO.createImageInputStream:
    // the factory's default disk cache backs each stream with a temp
    // file that lives until close()/GC — per-row inside executor map
    // tasks that's an fd + tmp-file leak. The bytes are already in
    // memory; cache there, and close/dispose on every path.
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    var reader: javax.imageio.ImageReader = null
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return Vector.empty
      val r = readers.next()
      reader = r
      if (!r.getFormatName.equalsIgnoreCase("gif")) return Vector.empty
      r.setInput(iis)
      val n = r.getNumImages(true)
      (0 until n).iterator.map { k =>
        val img = r.read(k)
        val meta = r.getImageMetadata(k)
        val root = meta.getAsTree("javax_imageio_gif_image_1.0")
          .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        var delay = 0
        val gces = root.getElementsByTagName("GraphicControlExtension")
        if (gces.getLength > 0) {
          val v = gces.item(0).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
            .getAttribute("delayTime")
          if (v != null && v.nonEmpty) delay = v.toInt
        }
        (delay, img)
      }.toVector
    } catch { case _: Throwable => Vector.empty }
    finally {
      if (reader != null) try reader.dispose() catch { case _: Throwable => }
      try iis.close() catch { case _: Throwable => }
    }
  }

  /** REAL frame sampling for animated GIFs: frame k's timestamp is the
    * cumulative delay of frames 0..k-1 (centiseconds × 10 → ms); frame
    * bytes are the decoded bitmap re-encoded as PNG. The video stub's
    * signature, real data. */
  def frameSampleGif(bytes: Array[Byte]): Vector[(Long, Array[Byte])] = {
    val frames = gifFrames(bytes)
    var ts = 0L
    frames.map { case (delayCs, img) =>
      val out = (ts, resizeImage(img, img.getWidth, img.getHeight))
      ts += delayCs * 10L
      out
    }
  }

  // ---- EXIF orientation: from-scratch APP1/TIFF tag parse ----

  /** EXIF orientation (tag 0x0112, values 1-8) from a JPEG's APP1 segment —
    * a from-scratch parse of the published JPEG marker + TIFF IFD layout
    * (the JDK's JPEG metadata exposes APP1 only as opaque bytes). None when
    * no EXIF orientation is present. */
  def exifOrientation(jpeg: Array[Byte]): Option[Int] = {
    if (jpeg == null || jpeg.length < 4 ||
      (jpeg(0) & 0xFF) != 0xFF || (jpeg(1) & 0xFF) != 0xD8) return None
    var i = 2
    while (i + 4 <= jpeg.length && (jpeg(i) & 0xFF) == 0xFF) {
      val marker = jpeg(i + 1) & 0xFF
      if (marker == 0xD9 || marker == 0xDA) return None // EOI / SOS: no EXIF
      val len = ((jpeg(i + 2) & 0xFF) << 8) | (jpeg(i + 3) & 0xFF)
      if (marker == 0xE1 && i + 4 + 6 <= jpeg.length &&
        jpeg(i + 4) == 'E' && jpeg(i + 5) == 'x' && jpeg(i + 6) == 'i' &&
        jpeg(i + 7) == 'f' && jpeg(i + 8) == 0 && jpeg(i + 9) == 0) {
        val tiff = i + 10 // TIFF header start
        if (tiff + 8 > jpeg.length) return None
        val le = jpeg(tiff) == 'I' && jpeg(tiff + 1) == 'I'
        val be = jpeg(tiff) == 'M' && jpeg(tiff + 1) == 'M'
        if (!le && !be) return None
        def u16(p: Int): Int =
          if (le) (jpeg(p) & 0xFF) | ((jpeg(p + 1) & 0xFF) << 8)
          else ((jpeg(p) & 0xFF) << 8) | (jpeg(p + 1) & 0xFF)
        def u32(p: Int): Long =
          if (le) (u16(p).toLong) | (u16(p + 2).toLong << 16)
          else (u16(p).toLong << 16) | u16(p + 2).toLong
        if (u16(tiff + 2) != 42) return None
        val ifd0 = tiff + u32(tiff + 4).toInt
        if (ifd0 + 2 > jpeg.length) return None
        val entries = u16(ifd0)
        var e = 0
        while (e < entries) {
          val p = ifd0 + 2 + e * 12
          if (p + 12 > jpeg.length) return None
          if (u16(p) == 0x0112 && u16(p + 2) == 3) { // SHORT orientation
            val v = u16(p + 8)
            return if (v >= 1 && v <= 8) Some(v) else None
          }
          e += 1
        }
        return None
      }
      i += 2 + len
    }
    None
  }

  /** Apply an EXIF orientation (exact per-pixel remap; orientations 5-8
    * swap the output dimensions). */
  def applyOrientation(img: java.awt.image.BufferedImage,
                       o: Int): java.awt.image.BufferedImage = {
    if (o <= 1 || o > 8) return img
    val w = img.getWidth; val h = img.getHeight
    val swapped = o >= 5
    val out = new java.awt.image.BufferedImage(
      if (swapped) h else w, if (swapped) w else h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        o match {
          case 2 => out.setRGB(w - 1 - x, y, rgb)
          case 3 => out.setRGB(w - 1 - x, h - 1 - y, rgb)
          case 4 => out.setRGB(x, h - 1 - y, rgb)
          case 5 => out.setRGB(y, x, rgb)
          case 6 => out.setRGB(h - 1 - y, x, rgb)
          case 7 => out.setRGB(h - 1 - y, w - 1 - x, rgb)
          case 8 => out.setRGB(y, w - 1 - x, rgb)
        }
        x += 1
      }
      y += 1
    }
    out
  }

  /** [[decodeImage]] honoring EXIF orientation when present. */
  def decodeImageOriented(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    decodeImage(bytes).map { img =>
      exifOrientation(bytes).fold(img)(o => applyOrientation(img, o))
    }

  /** A JPEG with a planted EXIF orientation: encode, then splice a minimal
    * APP1 segment (Exif\0\0 + one-entry TIFF IFD0, little-endian) right
    * after SOI — the published byte layout, since the JDK JPEG writer
    * emits no EXIF itself. */
  def makeJpegWithExif(seed: Long, w: Int, h: Int, orientation: Int): Array[Byte] = {
    val jpeg = makeImage(seed, w, h, "jpg")
    val tiff = Array[Byte](
      'I', 'I', 42, 0, 8, 0, 0, 0, // II, magic 42, IFD0 at offset 8
      1, 0, // 1 entry
      0x12, 0x01, 3, 0, 1, 0, 0, 0, // tag 0x0112, SHORT, count 1
      orientation.toByte, 0, 0, 0, // value
      0, 0, 0, 0) // next IFD: none
    val payload = Array[Byte]('E', 'x', 'i', 'f', 0, 0) ++ tiff
    val len = payload.length + 2
    val app1 = Array[Byte](0xFF.toByte, 0xE1.toByte,
      ((len >> 8) & 0xFF).toByte, (len & 0xFF).toByte) ++ payload
    jpeg.take(2) ++ app1 ++ jpeg.drop(2)
  }

  // ---- REAL audio path (javax.sound.sampled: WAV/AIFF/AU PCM ship in
  // every JDK — no ffmpeg needed for uncompressed audio) ----

  /** Decoded PCM audio: header parameters + channel-folded samples
    * normalized to [-1, 1]. */
  final case class PcmAudio(sampleRate: Float, channels: Int,
                            bitsPerSample: Int, frames: Long,
                            samples: Array[Float]) {
    def durationMs: Long =
      if (sampleRate <= 0) 0L else (frames * 1000.0 / sampleRate).toLong
  }

  /** Magic sniff for the JDK-decodable PCM containers: RIFF (WAV),
    * FORM (AIFF), .snd (AU). Distinguishes "corrupt PCM file" (decode_ok
    * must be false) from "compressed codec we honestly don't ship"
    * (stub path, like video). */
  def sniffsPcmContainer(bytes: Array[Byte]): Boolean = {
    def at(p: Int, s: String): Boolean =
      bytes.length >= p + s.length &&
        s.indices.forall(i => bytes(p + i) == s.charAt(i).toByte)
    at(0, "RIFF") || at(0, "FORM") || at(0, ".snd")
  }

  /** REAL audio decode via the JDK's `AudioSystem` (WAV/AIFF/AU readers):
    * signed-PCM 8/16-bit only — compressed codecs (MP3/AAC/…) have no JDK
    * reader and keep the stub path. None for undecodable bytes, never
    * throws. Channels fold to their mean (mono analysis view). */
  def decodeAudio(bytes: Array[Byte]): Option[PcmAudio] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val f = ais.getFormat
        val bits = f.getSampleSizeInBits
        if (f.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            (bits != 8 && bits != 16)) return None
        val ch = math.max(1, f.getChannels)
        val frames = ais.getFrameLength
        val bps = bits / 8
        val data = new java.io.ByteArrayOutputStream(
          math.min(bytes.length, 1 << 20))
        val buf = new Array[Byte](64 * 1024)
        var r = ais.read(buf)
        while (r >= 0) { data.write(buf, 0, r); r = ais.read(buf) }
        val raw = data.toByteArray
        val n = raw.length / (bps * ch)
        val out = new Array[Float](n)
        val big = f.isBigEndian
        var i = 0
        while (i < n) {
          var acc = 0.0
          var c = 0
          while (c < ch) {
            val p = (i * ch + c) * bps
            val s =
              if (bps == 1) raw(p).toInt // 8-bit signed
              else if (big) (raw(p) << 8) | (raw(p + 1) & 0xff)
              else (raw(p + 1) << 8) | (raw(p) & 0xff)
            acc += s / (if (bps == 1) 128.0 else 32768.0)
            c += 1
          }
          out(i) = (acc / ch).toFloat
          i += 1
        }
        // AU permits an unknown data size (getFrameLength = -1); the decoded
        // sample count is authoritative then — never report negative frames
        Some(PcmAudio(f.getSampleRate, ch, bits,
          if (frames < 0) n.toLong else frames, out))
      } finally ais.close()
    } catch { case _: Exception => None }

  /** REAL audio feature: per-window RMS energy over `dim` equal windows of
    * the mono samples, unit-normalized — the audio analog of
    * [[luminanceFeature]]'s grid. Deterministic, content-derived. */
  def audioFeature(samples: Array[Float], dim: Int = FeatureDim): Array[Float] = {
    val v = new Array[Float](dim)
    val n = samples.length
    if (n == 0) { java.util.Arrays.fill(v, 1.0f); return VectorOps.normalize(v) }
    var w = 0
    while (w < dim) {
      val from = (w.toLong * n / dim).toInt
      val until = math.max(from + 1, ((w + 1).toLong * n / dim).toInt)
      var s = 0.0
      var i = from
      while (i < math.min(until, n)) { s += samples(i).toDouble * samples(i); i += 1 }
      v(w) = math.sqrt(s / math.max(1, math.min(until, n) - from)).toFloat
      w += 1
    }
    VectorOps.normalize(v)
  }

  /** From-scratch RIFF/WAVE PCM16 mono writer (the published WAV layout:
    * RIFF size header, 16-byte `fmt ` chunk, `data` chunk) — deterministic
    * full-range noise samples from the seed, so the REAL decode path is
    * exercised end-to-end with plantable parameters. */
  def makeWav(seed: Long, sampleRate: Int = 8000, nSamples: Int = 1200): Array[Byte] = {
    val dataLen = nSamples * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM
      .putShort(1)                       // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)            // byte rate
      .putShort(2)                       // block align
      .putShort(16)                      // bits per sample
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var k = 0
    while (k < nSamples) {
      out.putShort((TextOps.mix64(seed ^ k.toLong) >>> 48).toShort)
      k += 1
    }
    out.array()
  }

  /** STUB decode: deterministic pseudo-decode from the content hash. A real
    * deployment replaces this body with an actual codec call. */
  def decodeStub(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (bytes == null || bytes.isEmpty) return None
    val h = TextOps.mix64(fnvBytes(bytes))
    // fake dims in realistic ranges, deterministic per content
    val w = 160 + (Math.floorMod(h, 8L) * 160).toInt
    val hgt = 120 + (Math.floorMod(h >>> 16, 8L) * 120).toInt
    Some((w, hgt))
  }

  /** STUB feature extraction: deterministic unit-norm pseudo-embedding from
    * the content bytes (splitmix stream over the content hash). */
  def featureStub(bytes: Array[Byte], dim: Int = FeatureDim): Array[Float] = {
    val base = fnvBytes(bytes)
    val v = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      val h = TextOps.mix64(base ^ (0x9e3779b97f4a7c15L * (i + 1)))
      v(i) = (((h >>> 11) * 1.1102230246251565e-16) * 2 - 1).toFloat
      i += 1
    }
    VectorOps.normalize(v)
  }

  /** STUB resize: deterministic content-derived stand-in for a scaled bitmap. */
  def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](math.max(16, (w * h) / 1024))
    var i = 0
    var state = fnvBytes(bytes) ^ (w.toLong << 32) ^ h
    while (i < out.length) {
      state = TextOps.mix64(state)
      out(i) = (state & 0xff).toByte
      i += 1
    }
    out
  }

  /** STUB frame sampling: one deterministic pseudo-frame per `everyMs`. */
  def frameSampleStub(media: MediaRow, everyMs: Long = 1000L): Vector[(Long, Array[Byte])] = {
    if (media.duration_ms <= 0) return Vector.empty
    val n = math.min(32, (media.duration_ms / math.max(1, everyMs)).toInt)
    (0 until n).map { k =>
      val ts = k * everyMs
      (ts, resizeStub(media.bytes, 64 + k, 64))
    }.toVector
  }

  private def fnvBytes(b: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < b.length) { h ^= b(i) & 0xff; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Deterministic synthetic media corpus (seeded from row id). */
  def mediaGen(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map { i =>
      val h = TextOps.mix64(0x6d656469L ^ i)
      val kind = (Math.floorMod(h, 4L)) match {
        case 0 => "image"; case 1 => "audio"; case 2 => "video"; case _ => "gif"
      }
      // image rows carry REAL encoded bytes across all four JDK-decodable
      // formats (decoded by the real ImageIO path; 7-in-8 JPEGs also carry
      // a planted EXIF orientation >1 the decode must honor); gif rows are
      // REAL animated GIFs whose frames/delays the real frame sampler
      // recovers; audio rows are REAL PCM16 WAVs the real javax.sound
      // decode recovers (sample rate / frame count / duration planted);
      // only video stays a hash-derived opaque blob for the stub codec
      // (no ffmpeg here)
      val (bytes, mime, w0, h0, dur) = kind match {
        case "image" =>
          val w = 16 + Math.floorMod(h, 17L).toInt
          val hh = 16 + Math.floorMod(h >>> 8, 17L).toInt
          val (fmt, mm) = Math.floorMod(h >>> 24, 4L).toInt match {
            case 0 => ("png", "image/png")
            case 1 => ("jpg", "image/jpeg")
            case 2 => ("gif", "image/gif")
            case _ => ("bmp", "image/bmp")
          }
          if (fmt == "jpg") {
            val o = 1 + Math.floorMod(h >>> 32, 8L).toInt
            val b = if (o > 1) makeJpegWithExif(h, w, hh, o) else makeImage(h, w, hh, fmt)
            // metadata records the ORIENTED dims — what a correct decode yields
            val (ow, oh) = if (o >= 5) (hh, w) else (w, hh)
            (b, mm, ow, oh, 0L)
          } else (makeImage(h, w, hh, fmt), mm, w, hh, 0L)
        case "gif" =>
          val w = 16 + Math.floorMod(h, 17L).toInt
          val hh = 16 + Math.floorMod(h >>> 8, 17L).toInt
          val frames = 2 + Math.floorMod(h >>> 16, 5L).toInt // 2..6
          val delayCs = 10 + Math.floorMod(h >>> 24, 4L).toInt * 10 // 100-400 ms
          (makeAnimatedGif(h, w, hh, frames, delayCs), "image/gif",
            w, hh, frames.toLong * delayCs * 10L)
        case "audio" =>
          // REAL PCM16 WAV: 8 kHz mono, 800..2392 samples (multiple of 8,
          // so the planted duration_ms = nSamples/8 is exact)
          val nSamples = 800 + 8 * Math.floorMod(h >>> 16, 200L).toInt
          (makeWav(h, 8000, nSamples), "audio/wav", 0, 0, nSamples / 8L)
        case _ =>
          val size = 256 + Math.floorMod(h >>> 8, 1792L).toInt
          val b = new Array[Byte](size)
          var state = h
          var j = 0
          while (j < size) { state = TextOps.mix64(state); b(j) = (state & 0xff).toByte; j += 1 }
          (b, "video/mp4", 640, 480, 5000 + Math.floorMod(h, 60000L))
      }
      MediaRow(i, kind, mime, bytes,
        width = w0,
        height = h0,
        duration_ms = dur,
        source_url = s"https://media.example.com/$kind/$i")
    })
  }

  /** The batched per-partition feature stage — real plumbing; REAL codec for
    * PNG/BMP images, deterministic stub for formats without a JDK codec. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition batch: codec/session setup would be amortized here
      it.map { m =>
        // image AND animated-gif rows decode for real (first frame for
        // gifs; EXIF orientation honored for jpegs); audio decodes for
        // real through javax.sound (PCM WAV/AIFF/AU) with per-window RMS
        // features
        val feat: Option[Array[Float]] =
          if (m.kind == "image" || m.kind == "gif")
            decodeImageOriented(m.bytes).map(luminanceFeature(_))
          else if (m.kind == "audio")
            decodeAudio(m.bytes).map(a => audioFeature(a.samples))
          else None
        feat match {
          case Some(f) =>
            MediaFeatures(m.media_id, m.kind, f, VectorOps.cosineLshBucket(f, 8), decode_ok = true)
          case None =>
            // the stub stands in ONLY for kinds without a JDK codec: video,
            // and audio whose container is NOT one of the JDK's PCM readers
            // (compressed mp3/aac/...). An IMAGE/GIF that failed ImageIO, or
            // an audio blob that SNIFFS as a PCM container (RIFF/FORM/.snd)
            // but failed the real decode, is corrupt input and must report
            // decode_ok=false — routing it through the stub fabricated
            // features and downstream decode_ok filters kept garbage rows
            val decoded =
              if (m.kind == "video") decodeStub(m.bytes)
              else if (m.kind == "audio" && !sniffsPcmContainer(m.bytes))
                decodeStub(m.bytes)
              else None
            val f = featureStub(m.bytes)
            MediaFeatures(m.media_id, m.kind, f, VectorOps.cosineLshBucket(f, 8), decoded.isDefined)
        }
      }
    }
  }
}
