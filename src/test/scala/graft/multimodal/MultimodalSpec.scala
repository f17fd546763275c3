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

  test("extractFeatures: every planted PNG decodes via the REAL codec path") {
    val media = Multimodal.mediaGen(spark, 60)
    val features = Multimodal.extractFeatures(media).collect().map(f => f.media_id -> f).toMap
    val rows = media.collect()
    val images = rows.filter(_.kind == "image")
    assert(images.nonEmpty)
    images.foreach { m =>
      assert(Multimodal.isPng(m.bytes), s"image ${m.media_id} must carry real PNG bytes")
      assert(features(m.media_id).decode_ok, s"image ${m.media_id} must really decode")
      // the feature must equal the real pixel feature, not the stub
      val expected = Multimodal.luminanceFeature(Multimodal.decodeImage(m.bytes).get)
      assert(features(m.media_id).feature.sameElements(expected))
    }
    // non-image rows still flow through the stub path deterministically
    rows.filter(_.kind != "image").foreach { m =>
      assert(features(m.media_id).feature.sameElements(Multimodal.featureStub(m.bytes)))
    }
  }
}
