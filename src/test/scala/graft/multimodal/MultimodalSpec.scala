package graft.multimodal

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Real PNG codec path (javax.imageio) + deterministic stub fallbacks. */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("graft-multimodal-test")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("makePng emits a real PNG that ImageIO round-trips at the exact dims") {
    val bytes = Multimodal.makePng(seed = 7L, w = 20, h = 12)
    assert(Multimodal.isPng(bytes))
    val img = Multimodal.decodeImage(bytes)
    assert(img.isDefined)
    assert(img.get.getWidth == 20 && img.get.getHeight == 12)
  }

  test("makePng is deterministic; luminanceFeature is unit-norm and pixel-determined") {
    val a = Multimodal.makePng(3L); val b = Multimodal.makePng(3L)
    assert(a.sameElements(b))
    val f1 = Multimodal.luminanceFeature(Multimodal.decodeImage(a).get)
    val f2 = Multimodal.luminanceFeature(Multimodal.decodeImage(b).get)
    assert(f1.sameElements(f2))
    assert(f1.length == 64)
    assert(math.abs(graft.ops.VectorOps.norm(f1) - 1.0) < 1e-5)
    // different pixels → different feature
    val g = Multimodal.luminanceFeature(Multimodal.decodeImage(Multimodal.makePng(4L)).get)
    assert(!f1.sameElements(g))
  }

  test("resizeImage produces a decodable PNG at the requested dims") {
    val img = Multimodal.decodeImage(Multimodal.makePng(11L, 32, 32)).get
    val small = Multimodal.resizeImage(img, 8, 6)
    val back = Multimodal.decodeImage(small)
    assert(back.isDefined)
    assert(back.get.getWidth == 8 && back.get.getHeight == 6)
  }

  test("decodeImage returns None on non-image bytes (stub fallback trigger)") {
    assert(Multimodal.decodeImage(Array[Byte](1, 2, 3, 4)).isEmpty)
    assert(!Multimodal.isPng(Array[Byte](1, 2, 3, 4)))
  }

  test("makeImage emits real JPEG and GIF bytes that ImageIO decodes") {
    // this JDK's ImageIO readers: JPEG, TIFF, BMP, GIF, WBMP, PNG
    val formats = javax.imageio.ImageIO.getReaderFormatNames.map(_.toLowerCase).toSet
    assert(formats.contains("jpeg") && formats.contains("gif"))
    for (fmt <- Seq("jpg", "gif", "bmp")) {
      val bytes = Multimodal.makeImage(9L, 20, 12, fmt)
      val img = Multimodal.decodeImage(bytes)
      assert(img.isDefined, s"$fmt must decode")
      assert(img.get.getWidth == 20 && img.get.getHeight == 12)
      // determinism: identical bytes for identical pixels
      assert(bytes.sameElements(Multimodal.makeImage(9L, 20, 12, fmt)))
    }
  }

  test("extractFeatures: every planted image (png/jpeg/gif) decodes via the REAL codec path") {
    val media = Multimodal.mediaGen(spark, 160)
    val features = Multimodal.extractFeatures(media).collect().map(f => f.media_id -> f).toMap
    val rows = media.collect()
    val images = rows.filter(_.kind == "image")
    assert(images.nonEmpty)
    // the corpus must exercise all four real formats
    val mimes = images.map(_.mime).toSet
    assert(mimes == Set("image/png", "image/jpeg", "image/gif", "image/bmp"), s"formats planted: $mimes")
    images.foreach { m =>
      assert(features(m.media_id).decode_ok, s"image ${m.media_id} (${m.mime}) must really decode")
      // the feature must equal the real ORIENTED pixel feature, not the stub
      val expected = Multimodal.luminanceFeature(Multimodal.decodeImageOriented(m.bytes).get)
      assert(features(m.media_id).feature.sameElements(expected))
    }
    images.filter(_.mime == "image/png").foreach(m => assert(Multimodal.isPng(m.bytes)))
    // EXIF-planted jpegs: metadata dims = oriented decode dims
    val exifImages = images.filter(m =>
      m.mime == "image/jpeg" && Multimodal.exifOrientation(m.bytes).exists(_ > 1))
    assert(exifImages.nonEmpty, "corpus must plant EXIF orientations")
    exifImages.foreach { m =>
      val img = Multimodal.decodeImageOriented(m.bytes).get
      assert(img.getWidth == m.width && img.getHeight == m.height,
        s"oriented dims must match metadata for ${m.media_id}")
    }
    // animated-gif rows decode for real too, and their frames are real
    val gifs = rows.filter(_.kind == "gif")
    assert(gifs.nonEmpty)
    gifs.foreach { m =>
      assert(features(m.media_id).decode_ok, s"gif ${m.media_id} must really decode")
      val frames = Multimodal.gifFrames(m.bytes)
      assert(frames.length >= 2, "animated: at least 2 frames")
      assert(frames.forall { case (_, img) =>
        img.getWidth == m.width && img.getHeight == m.height })
      val sampled = Multimodal.frameSampleGif(m.bytes)
      assert(sampled.length == frames.length)
      assert(sampled.head._1 == 0L)
      assert(m.duration_ms == frames.map(_._1.toLong * 10).sum)
    }
    // audio rows are REAL PCM16 WAVs: javax.sound must recover the planted
    // sample rate / frame count / duration, and the feature is the real
    // per-window RMS, not the stub
    val audios = rows.filter(_.kind == "audio")
    assert(audios.nonEmpty)
    audios.foreach { m =>
      assert(features(m.media_id).decode_ok, s"audio ${m.media_id} must really decode")
      val a = Multimodal.decodeAudio(m.bytes).get
      assert(a.sampleRate == 8000f && a.channels == 1 && a.bitsPerSample == 16)
      assert(a.durationMs == m.duration_ms,
        s"decoded duration ${a.durationMs} != planted ${m.duration_ms}")
      assert(a.frames == m.duration_ms * 8, "8 kHz: frames = ms * 8")
      assert(features(m.media_id).feature.sameElements(Multimodal.audioFeature(a.samples)))
    }
    // video rows still flow through the stub path deterministically
    rows.filter(_.kind == "video").foreach { m =>
      assert(features(m.media_id).feature.sameElements(Multimodal.featureStub(m.bytes)))
    }
  }

  test("decodeAudio: real WAV round-trip, channel fold, and refusal of non-audio") {
    // planted params recovered exactly
    val w = Multimodal.makeWav(99L, sampleRate = 8000, nSamples = 1200)
    val a = Multimodal.decodeAudio(w).get
    assert(a.sampleRate == 8000f && a.channels == 1 && a.bitsPerSample == 16)
    assert(a.frames == 1200 && a.samples.length == 1200 && a.durationMs == 150L)
    // samples really are the planted PCM (first sample, exact value)
    val s0 = (graft.ops.TextOps.mix64(99L ^ 0L) >>> 48).toShort / 32768.0f
    assert(math.abs(a.samples(0) - s0) < 1e-7)
    // deterministic
    assert(Multimodal.makeWav(99L, 8000, 1200).sameElements(w))
    // feature: unit-norm, FeatureDim windows
    val f = Multimodal.audioFeature(a.samples)
    assert(f.length == Multimodal.FeatureDim)
    assert(math.abs(math.sqrt(f.map(v => v.toDouble * v).sum) - 1.0) < 1e-3)
    // garbage refuses without throwing
    assert(Multimodal.decodeAudio("not audio".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeAudio(Array.emptyByteArray).isEmpty)
  }

  test("decodeAudio: big-endian path via an AIFF transcode of the same PCM") {
    import javax.sound.sampled._
    val wav = Multimodal.makeWav(7L, 8000, 800)
    val fromWav = Multimodal.decodeAudio(wav).get
    // JDK-transcode the identical PCM into AIFF (big-endian container)
    val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(wav))
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.AIFF, bos)
    ais.close()
    val fromAiff = Multimodal.decodeAudio(bos.toByteArray).get
    assert(fromAiff.frames == 800 && fromAiff.durationMs == 100L)
    // same PCM through the little- and big-endian branches = same samples
    assert(fromAiff.samples.sameElements(fromWav.samples))
  }
}
