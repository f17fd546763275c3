package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Local mirror of the three fixture-anchored driver oracles: every expected
  * cell here is transcribed from the reference's own assertions (see
  * FixtureQueries scaladoc) — if extraction drifts, this fails before the
  * driver's DuckDB gate does. */
class FixtureQueriesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("graft-test")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("fixtureMeta matches the reference-asserted exact values") {
    val got = FixtureQueries.fixtureMeta(spark).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    val expected = Map(
      ("https://example.com/blog/messy", "title") -> "The Real Title",
      ("https://example.com/blog/messy", "description") -> "The actual summary of the article.",
      ("https://example.com/blog/deep-dive", "title") -> "Deep Dive: Web Scraping",
      ("https://example.com/blog/deep-dive", "description") -> "A practical guide to scraping modern websites.",
      ("https://example.com/blog/deep-dive", "canonical_url") -> "https://example.com/blog/deep-dive",
      ("https://example.com/blog/deep-dive", "author") -> "Alex Doe",
      ("https://example.com/blog/deep-dive", "image") -> "https://example.com/assets/cover.png",
      ("https://example.com/page", "title") -> "My Page",
      ("https://example.com/page", "description") -> "Page description",
      ("https://example.com/article", "title") -> "My Article",
      ("https://example.com/article", "description") -> "Article description",
      ("https://example.com/", "custom_price") -> "$29.99",
      // M3/M5 cells (round 4): content types per the reference's detection
      // rules; favicons per the fallback / swapped-resolveUrl quirk
      ("https://example.com/", "content_type") -> "product",
      ("https://example.com/blog/messy", "content_type") -> "article",
      ("https://example.com/blog/messy", "favicon") -> "https://example.com/favicon.ico",
      ("https://example.com/blog/deep-dive", "content_type") -> "unknown",
      ("https://example.com/blog/deep-dive", "favicon") -> "https://example.com/favicon.ico",
      ("https://example.com/page", "content_type") -> "unknown",
      ("https://example.com/minimal", "title") -> "Simple",
      ("https://example.com/minimal", "description") -> "",
      ("https://example.com/minimal", "content_type") -> "unknown",
      // scrape.test.ts:47-54 sampleHtml assertions
      ("https://example.com/sample", "title") -> "OG Title",
      ("https://example.com/sample", "description") -> "OG Description",
      ("https://example.com/sample", "image") -> "https://example.com/image.jpg",
      ("https://example.com/sample", "author") -> "Test Author",
      ("https://example.com/sample", "canonical_url") -> "https://example.com/canonical",
      ("https://example.com/sample", "language") -> "en",
      ("https://example.com/sample", "keywords") -> "test,page,keywords",
      ("https://example.com/sample", "favicon") -> "https://example.com/sample")
    assert(got == expected)
  }

  test("fixtureChecks all pass") {
    val rows = FixtureQueries.fixtureChecks(spark).collect()
    assert(rows.length == 17)
    val failing = rows.filterNot(_.getBoolean(2)).map(r => s"${r.getString(0)}:${r.getString(1)}")
    assert(failing.isEmpty, s"failing checks: ${failing.mkString(", ")}")
  }

  test("normalizeValues matches the reference normalizer assertions") {
    val got = FixtureQueries.normalizeValues(spark).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getBoolean(2), r.getLong(3)))).toMap
    assert(got("decode_entities_strip_links") == (("Hello world & Link", false, 1L)))
    assert(got("truncate_sentence_boundary") == (("This is the first sentence.", true, 1L)))
    assert(got("below_min_chars_empty") == (("", false, 0L)))
  }
}
