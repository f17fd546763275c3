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
 * STUBS, clearly marked: no image/audio codecs ship in this container
 * (SURVEY.md §7.6 — no javax.imageio use to keep byte-determinism, no ffmpeg)
 * so `decode*`/`resize` produce deterministic fakes derived from the content
 * hash. The Spark-side contract — schema, partitioning, batch shape,
 * unit-norm feature vectors, LSH bucketing — is real and tested; swapping a
 * real codec in changes only the function bodies.
 */
object Multimodal {

  val FeatureDim = 64

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
      val size = 256 + Math.floorMod(h >>> 8, 1792L).toInt
      val bytes = new Array[Byte](size)
      var state = h
      var j = 0
      while (j < size) { state = TextOps.mix64(state); bytes(j) = (state & 0xff).toByte; j += 1 }
      val mime = kind match {
        case "image" => "image/jpeg"; case "audio" => "audio/mpeg"; case _ => "video/mp4"
      }
      MediaRow(i, kind, mime, bytes,
        width = if (kind != "audio") 640 else 0,
        height = if (kind != "audio") 480 else 0,
        duration_ms = if (kind != "image") 5000 + Math.floorMod(h, 60000L) else 0,
        source_url = s"https://media.example.com/$kind/$i")
    })
  }

  /** The batched per-partition feature stage — real plumbing, stubbed codec. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition batch: codec/session setup would be amortized here
      it.map { m =>
        val decoded = decodeStub(m.bytes)
        val feat = featureStub(m.bytes)
        MediaFeatures(m.media_id, m.kind, feat, VectorOps.cosineLshBucket(feat, 8), decoded.isDefined)
      }
    }
  }
}
