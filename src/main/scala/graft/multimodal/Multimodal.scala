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
 * is exercised across formats. Audio/video codecs do not ship in this
 * container (no ffmpeg), so those paths remain clearly-marked deterministic
 * stubs derived from the content hash. The Spark-side contract — schema,
 * partitioning, batch shape, unit-norm feature vectors, LSH bucketing — is
 * identical on both paths; swapping a real codec in changes only the
 * function bodies.
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

  /** Deterministic REAL image bytes for the synthetic corpus (pixels from a
    * splitmix stream over the seed, encoded by the JDK's own writers — no
    * timestamps, output a pure function of the pixels) — exercises the real
    * decode path end-to-end per format. */
  def makeImage(seed: Long, w: Int = 24, h: Int = 24, format: String = "png"): Array[Byte] = {
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
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  def makePng(seed: Long, w: Int = 24, h: Int = 24): Array[Byte] = makeImage(seed, w, h, "png")

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
      val kind = (Math.floorMod(h, 3L)) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      // image rows carry REAL encoded bytes across all four JDK-decodable
      // formats (decoded by the real ImageIO path); audio/video stay
      // hash-derived opaque blobs for the stub codecs (no ffmpeg here)
      val (bytes, mime, w0, h0) =
        if (kind == "image") {
          val w = 16 + Math.floorMod(h, 17L).toInt
          val hh = 16 + Math.floorMod(h >>> 8, 17L).toInt
          val (fmt, mm) = Math.floorMod(h >>> 24, 4L).toInt match {
            case 0 => ("png", "image/png")
            case 1 => ("jpg", "image/jpeg")
            case 2 => ("gif", "image/gif")
            case _ => ("bmp", "image/bmp")
          }
          (makeImage(h, w, hh, fmt), mm, w, hh)
        } else {
          val size = 256 + Math.floorMod(h >>> 8, 1792L).toInt
          val b = new Array[Byte](size)
          var state = h
          var j = 0
          while (j < size) { state = TextOps.mix64(state); b(j) = (state & 0xff).toByte; j += 1 }
          (b, if (kind == "audio") "audio/mpeg" else "video/mp4", if (kind == "audio") 0 else 640, if (kind == "audio") 0 else 480)
        }
      MediaRow(i, kind, mime, bytes,
        width = w0,
        height = h0,
        duration_ms = if (kind != "image") 5000 + Math.floorMod(h, 60000L) else 0,
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
        val real = if (m.kind == "image") decodeImage(m.bytes) else None
        real match {
          case Some(img) =>
            val feat = luminanceFeature(img)
            MediaFeatures(m.media_id, m.kind, feat, VectorOps.cosineLshBucket(feat, 8), decode_ok = true)
          case None =>
            // the stub stands in ONLY for kinds without a JDK codec
            // (audio/video); an IMAGE that failed the real ImageIO decode is
            // corrupt input and must report decode_ok=false — routing it
            // through the stub fabricated dims/features and downstream
            // decode_ok filters kept garbage rows
            val decoded = if (m.kind == "image") None else decodeStub(m.bytes)
            val feat = featureStub(m.bytes)
            MediaFeatures(m.media_id, m.kind, feat, VectorOps.cosineLshBucket(feat, 8), decoded.isDefined)
        }
      }
    }
  }
}
