package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.pipeline.FixtureSupport

/**
 * Fixture-anchored driver query for the multimodal image path: plant images
 * whose width/height/format are GENERATOR PARAMETERS, push them through the
 * REAL `javax.imageio` decode / feature / resize stages, and emit
 * `(test_case, field, value)` rows the driver compares against a VALUES
 * oracle. The ground truth here is independent of the code under test — a
 * correct decoder must recover exactly the planted dimensions, a resize to
 * (w, h) must decode back to (w, h), a luminance feature over a g×g grid
 * must have g² cells and unit norm, and non-image bytes must refuse to
 * decode. Frame sampling is pinned to its documented contract
 * (`min(32, duration/step)` frames at `k·step` timestamps).
 *
 * Mirrors the reference's media contract (`/root/reference/src/` treats
 * media as opaque bytes + typed metadata); the exercised codecs are the
 * JDK's own PNG/JPEG/GIF/BMP readers.
 */
object MediaFixtureQueries {

  /** (case, seed, w, h, format) — formats all real on this JDK. */
  private val imageSpecs: Seq[(String, Long, Int, Int, String)] = Seq(
    ("png_24x24", 1L, 24, 24, "png"),
    ("jpeg_32x16", 2L, 32, 16, "jpg"),
    ("gif_8x8", 3L, 8, 8, "gif"),
    ("bmp_16x24", 4L, 16, 24, "bmp")
  )

  def mediaFixture(s: SparkSession): DataFrame = {
    import s.implicits._
    val cases = imageSpecs.map(_._1) ++
      Seq("resize_png_to_12x12", "feature_grid", "feature_unitnorm",
        "not_an_image", "frames_3500ms_1000ms", "frames_zero_duration",
        "gif_anim_3f_25cs", "exif_rot90", "exif_fliph", "exif_absent",
        "wav_8k_1200", "wav_feature", "not_audio")
    FixtureSupport.fixtureDf(s, cases) { name =>
      val rows: Seq[(String, String)] = imageSpecs.find(_._1 == name) match {
        case Some((_, seed, w, h, fmt)) =>
          val decoded = Multimodal.decodeImage(Multimodal.makeImage(seed, w, h, fmt))
          Seq(
            "decode_ok" -> decoded.isDefined.toString,
            "width" -> decoded.map(_.getWidth).getOrElse(-1).toString,
            "height" -> decoded.map(_.getHeight).getOrElse(-1).toString)
        case None => name match {
          case "resize_png_to_12x12" =>
            val img = Multimodal.decodeImage(Multimodal.makePng(7L, 24, 24)).get
            val back = Multimodal.decodeImage(Multimodal.resizeImage(img, 12, 12))
            Seq(
              "decode_ok" -> back.isDefined.toString,
              "width" -> back.map(_.getWidth).getOrElse(-1).toString,
              "height" -> back.map(_.getHeight).getOrElse(-1).toString)
          case "feature_grid" =>
            val img = Multimodal.decodeImage(Multimodal.makePng(8L, 24, 24)).get
            Seq("feature_len" -> Multimodal.luminanceFeature(img, grid = 8).length.toString)
          case "feature_unitnorm" =>
            val img = Multimodal.decodeImage(Multimodal.makePng(9L, 24, 24)).get
            val f = Multimodal.luminanceFeature(img)
            val norm = math.sqrt(f.map(v => v.toDouble * v).sum)
            Seq("unit_norm" -> (math.abs(norm - 1.0) < 1e-3).toString)
          case "not_an_image" =>
            val decoded = Multimodal.decodeImage("not an image at all".getBytes("UTF-8"))
            Seq("decode_ok" -> decoded.isDefined.toString)
          case "frames_3500ms_1000ms" =>
            val row = MediaRow(1L, "video", "video/mp4", Array[Byte](1, 2, 3),
              0, 0, 3500L, "https://example.com/v.mp4")
            val frames = Multimodal.frameSampleStub(row, everyMs = 1000L)
            Seq(
              "n_frames" -> frames.length.toString,
              "timestamps" -> frames.map(_._1).mkString("|"))
          case "frames_zero_duration" =>
            val row = MediaRow(2L, "audio", "audio/mpeg", Array[Byte](1),
              0, 0, 0L, "https://example.com/a.mp3")
            Seq("n_frames" -> Multimodal.frameSampleStub(row).length.toString)
          case "gif_anim_3f_25cs" =>
            // REAL round-trip: a 3-frame 20×12 animated GIF at 25 cs/frame
            // must read back exactly those frames, delays, and timestamps,
            // and each sampled frame must decode to the planted dims
            val g = Multimodal.makeAnimatedGif(11L, 20, 12, nFrames = 3, delayCs = 25)
            val frames = Multimodal.gifFrames(g)
            val sampled = Multimodal.frameSampleGif(g)
            val dims = sampled.map(f => Multimodal.decodeImage(f._2)
              .map(i => s"${i.getWidth}x${i.getHeight}").getOrElse("bad"))
            Seq(
              "n_frames" -> frames.length.toString,
              "delays_cs" -> frames.map(_._1).mkString("|"),
              "timestamps_ms" -> sampled.map(_._1).mkString("|"),
              "frame_dims" -> dims.distinct.mkString("|"))
          case "exif_rot90" =>
            // orientation 6 (rotate 90 CW): decode must SWAP the dims
            val j = Multimodal.makeJpegWithExif(12L, 32, 16, orientation = 6)
            val o = Multimodal.decodeImageOriented(j)
            Seq(
              "orientation" -> Multimodal.exifOrientation(j).getOrElse(-1).toString,
              "width" -> o.map(_.getWidth).getOrElse(-1).toString,
              "height" -> o.map(_.getHeight).getOrElse(-1).toString)
          case "exif_fliph" =>
            // orientation 2 (mirror): dims unchanged, tag still read; the
            // flip really happened — corner pixels swap sides
            val j = Multimodal.makeJpegWithExif(13L, 32, 16, orientation = 2)
            val plain = Multimodal.decodeImage(j).get
            val flipped = Multimodal.decodeImageOriented(j).get
            Seq(
              "orientation" -> Multimodal.exifOrientation(j).getOrElse(-1).toString,
              "width" -> flipped.getWidth.toString,
              "height" -> flipped.getHeight.toString,
              "mirrored" -> (flipped.getRGB(0, 0) == plain.getRGB(31, 0) &&
                flipped.getRGB(31, 0) == plain.getRGB(0, 0)).toString)
          case "exif_absent" =>
            Seq("orientation" -> Multimodal.exifOrientation(
              Multimodal.makeImage(14L, 8, 8, "jpg")).getOrElse(-1).toString)
          case "wav_8k_1200" =>
            // REAL javax.sound decode must recover the GENERATOR PARAMETERS
            val a = Multimodal.decodeAudio(Multimodal.makeWav(21L, 8000, 1200))
            Seq(
              "decode_ok" -> a.isDefined.toString,
              "sample_rate" -> a.map(_.sampleRate.toInt).getOrElse(-1).toString,
              "channels" -> a.map(_.channels).getOrElse(-1).toString,
              "frames" -> a.map(_.frames).getOrElse(-1L).toString,
              "duration_ms" -> a.map(_.durationMs).getOrElse(-1L).toString)
          case "wav_feature" =>
            val a = Multimodal.decodeAudio(Multimodal.makeWav(22L, 8000, 2000)).get
            val f = Multimodal.audioFeature(a.samples)
            val norm = math.sqrt(f.map(v => v.toDouble * v).sum)
            Seq(
              "feature_len" -> f.length.toString,
              "unit_norm" -> (math.abs(norm - 1.0) < 1e-3).toString)
          case "not_audio" =>
            Seq("decode_ok" ->
              Multimodal.decodeAudio("not audio at all".getBytes("UTF-8")).isDefined.toString)
          case _ => Nil
        }
      }
      rows
    }
  }

  val mediaOracle: String = {
    val rows = Seq(
      ("bmp_16x24", "decode_ok", "true"),
      ("exif_absent", "orientation", "-1"),
      ("exif_fliph", "height", "16"),
      ("exif_fliph", "mirrored", "true"),
      ("exif_fliph", "orientation", "2"),
      ("exif_fliph", "width", "32"),
      ("exif_rot90", "height", "32"),
      ("exif_rot90", "orientation", "6"),
      ("exif_rot90", "width", "16"),
      ("gif_anim_3f_25cs", "delays_cs", "25|25|25"),
      ("gif_anim_3f_25cs", "frame_dims", "20x12"),
      ("gif_anim_3f_25cs", "n_frames", "3"),
      ("gif_anim_3f_25cs", "timestamps_ms", "0|250|500"),
      ("bmp_16x24", "height", "24"),
      ("bmp_16x24", "width", "16"),
      ("feature_grid", "feature_len", "64"),
      ("feature_unitnorm", "unit_norm", "true"),
      ("frames_3500ms_1000ms", "n_frames", "3"),
      ("frames_3500ms_1000ms", "timestamps", "0|1000|2000"),
      ("frames_zero_duration", "n_frames", "0"),
      ("gif_8x8", "decode_ok", "true"),
      ("gif_8x8", "height", "8"),
      ("gif_8x8", "width", "8"),
      ("jpeg_32x16", "decode_ok", "true"),
      ("jpeg_32x16", "height", "16"),
      ("jpeg_32x16", "width", "32"),
      ("not_an_image", "decode_ok", "false"),
      ("png_24x24", "decode_ok", "true"),
      ("png_24x24", "height", "24"),
      ("png_24x24", "width", "24"),
      ("resize_png_to_12x12", "decode_ok", "true"),
      ("resize_png_to_12x12", "height", "12"),
      ("resize_png_to_12x12", "width", "12"),
      // WAV ground truth = generator parameters (8 kHz mono PCM16,
      // 1200 frames → 150 ms), independent of the decode under test
      ("wav_8k_1200", "decode_ok", "true"),
      ("wav_8k_1200", "sample_rate", "8000"),
      ("wav_8k_1200", "channels", "1"),
      ("wav_8k_1200", "frames", "1200"),
      ("wav_8k_1200", "duration_ms", "150"),
      ("wav_feature", "feature_len", "64"),
      ("wav_feature", "unit_norm", "true"),
      ("not_audio", "decode_ok", "false")
    )
    FixtureSupport.valuesOracle(rows)
  }
}
