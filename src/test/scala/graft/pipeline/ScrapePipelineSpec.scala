package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source
import graft.content.NormalizeOptions

/** Ported from the reference's `test/e2e/core-scraping.test.ts`,
  * `test/core/scrape.test.ts` and `test/core/scrape-normalize.test.ts` —
  * same fixture inputs, same expected values. */
class ScrapePipelineSpec extends AnyFunSuite {

  private def fixture(name: String): String = {
    val in = getClass.getResourceAsStream(s"/scrapex-fixtures/$name")
    require(in != null, s"missing fixture $name")
    val s = Source.fromInputStream(in, "UTF-8").mkString
    in.close(); s
  }

  private lazy val messy = ScrapePipeline.scrapeHtml(fixture("messy-blog-post.html"), "https://example.com/blog/messy")

  test("messy-blog-post: metadata preference (OG > Title)") {
    assert(messy.title == "The Real Title")
    assert(messy.description == "The actual summary of the article.")
    assert(messy.author.exists(_.contains("Jane Doe")))
    assert(messy.published_at.exists(_.contains("2023-10-27")))
  }

  test("messy-blog-post: content extraction excludes boilerplate") {
    assert(messy.text_content.contains("This is the primary content of the article"))
    assert(messy.text_content.contains("Point 1"))
    assert(!messy.text_content.contains("Related Posts"))
    assert(!messy.text_content.contains("Example Corp"))
    assert(!messy.text_content.contains("document.write"))
  }

  test("messy-blog-post: normalized text") {
    assert(messy.normalized_text.contains("This is the primary content of the article"))
    assert(!messy.normalized_text.contains("Related Posts"))
    assert(messy.norm_meta.blocks_accepted > 0)
  }

  test("messy-blog-post: resolves relative links in main content") {
    val articleLink = messy.links.find(_.url.contains("wiki/article"))
    assert(articleLink.isDefined)
    assert(articleLink.get.url == "https://example.com/wiki/article")
  }

  test("quick-start: title and description") {
    val r = ScrapePipeline.scrapeHtml(fixture("quick-start.html"), "https://example.com/page")
    assert(r.title == "My Page")
    assert(r.description == "Page description")
  }

  test("article-real-world: metadata, JSON-LD, content links") {
    val html = fixture("article-real-world.html").replace("{{BASE_URL}}", "https://example.com")
    val r = ScrapePipeline.scrapeHtml(html, "https://example.com/blog/deep-dive")
    assert(r.title == "Deep Dive: Web Scraping")
    assert(r.description == "A practical guide to scraping modern websites.")
    assert(r.canonical_url == "https://example.com/blog/deep-dive")
    assert(r.author.contains("Alex Doe"))
    assert(r.image.contains("https://example.com/assets/cover.png"))
    assert(Set("scraping", "web", "data").subsetOf(r.keywords.toSet))
    assert(r.json_ld.exists(_.nonEmpty))

    val contentLink = r.links.find(_.url == "https://example.com/blog/tools")
    val externalLink = r.links.find(_.url == "https://external.example.org/guide")
    assert(contentLink.exists(!_.is_external))
    assert(externalLink.exists(_.is_external))
    assert(!r.links.exists(_.url == "https://example.com/home"))
  }

  test("sampleHtml: basic metadata extraction (scrape.test.ts)") {
    val sampleHtml =
      """<!DOCTYPE html>
<html lang="en">
<head>
  <meta charset="UTF-8">
  <title>Test Page Title</title>
  <meta name="description" content="Test page description">
  <meta property="og:title" content="OG Title">
  <meta property="og:description" content="OG Description">
  <meta property="og:image" content="https://example.com/image.jpg">
  <meta name="author" content="Test Author">
  <meta name="keywords" content="test, page, keywords">
  <link rel="canonical" href="https://example.com/canonical">
  <link rel="icon" href="/favicon.ico">
</head>
<body>
  <article>
    <h1>Main Heading</h1>
    <p>This is the main content of the test page. It contains enough text to be considered meaningful content for extraction purposes.</p>
    <p>Here is another paragraph with more content to ensure we have sufficient text for the content extractor to work with.</p>
    <a href="https://external.com/link">External Link</a>
    <a href="/internal/page">Internal Link</a>
  </article>
</body>
</html>
"""
    val r = ScrapePipeline.scrapeHtml(sampleHtml, "https://example.com/page")
    assert(r.title == "OG Title")
    assert(r.description == "OG Description")
    assert(r.image.contains("https://example.com/image.jpg"))
    assert(r.author.contains("Test Author"))
    assert(r.canonical_url == "https://example.com/canonical")
    assert(r.language.contains("en"))
    assert(r.keywords == Seq("test", "page", "keywords"))

    val r2 = ScrapePipeline.scrapeHtml(sampleHtml, "https://www.example.com/page")
    assert(r2.domain == "example.com")
  }

  test("scrape-normalize: normalized text and metadata") {
    val html =
      """
      <html>
        <body>
          <nav>Home About Subscribe</nav>
          <main>
            <h1>Test Article</h1>
            <p>This is the first paragraph.</p>
            <p>This is the second paragraph.</p>
          </main>
          <footer>All rights reserved</footer>
        </body>
      </html>
    """
    val r = ScrapePipeline.scrapeHtml(html, "https://example.com/article")
    assert(r.normalized_text.contains("Test Article"))
    assert(r.normalized_text.contains("This is the first paragraph."))
    assert(!r.normalized_text.contains("Subscribe"))
    assert(r.norm_meta.blocks_total > 0)
    assert(r.norm_meta.blocks_accepted <= r.norm_meta.blocks_total)
    assert(r.norm_meta.boilerplate_removed)
  }

  test("invalid URL routes to error row, does not throw") {
    val r = ScrapePipeline.scrapeHtml("<p>x</p>", "not-a-url")
    assert(r.status == "invalid_url")
  }

  test("url is normalized (utm strip) in result") {
    val r = ScrapePipeline.scrapeHtml("<title>T</title>", "https://example.com/page?utm_source=x")
    assert(r.url == "https://example.com/page")
  }

  test("determinism: same input → byte-identical output") {
    val h = fixture("messy-blog-post.html")
    val a = ScrapePipeline.scrapeHtml(h, "https://example.com/blog/messy")
    val b = ScrapePipeline.scrapeHtml(h, "https://example.com/blog/messy")
    assert(a == b)
    assert(a.text_content == b.text_content)
    assert(a.norm_hash == b.norm_hash)
  }

  // scrape.test.ts:123-159 — pluggable extractor registration
  test("custom extractors append to defaults; replaceDefaultExtractors runs only customs") {
    val html = """<html><head><title>Doc Title</title>
      |<meta name="description" content="A description"></head>
      |<body><p>Body text.</p></body></html>""".stripMargin

    object TitleOverride extends graft.extract.Extractor {
      val name = "custom"
      val priority = 10 // lowest priority -> runs last -> its non-empty fields win (D1/D2)
      def extract(ctx: graft.extract.ExtractionContext): graft.extract.Partial =
        graft.extract.Partial(title = Some("Custom Title"))
    }

    val appended = ScrapePipeline.scrapeHtml(html, "https://example.com/x",
      extractors = Seq(TitleOverride))
    assert(appended.title == "Custom Title")       // custom merged in
    assert(appended.description == "A description") // defaults still ran

    val replaced = ScrapePipeline.scrapeHtml(html, "https://example.com/x",
      extractors = Seq(TitleOverride), replaceDefaultExtractors = true)
    assert(replaced.title == "Custom Title")
    assert(replaced.description == "")              // defaults did not run
  }

  test("failing custom extractor appends to error and does not abort (scrape.test.ts:161-181)") {
    object Exploder extends graft.extract.Extractor {
      val name = "exploder"
      val priority = 99
      def extract(ctx: graft.extract.ExtractionContext): graft.extract.Partial =
        throw new RuntimeException("boom")
    }
    val html = "<html><head><title>T</title></head><body><p>x</p></body></html>"
    val row = ScrapePipeline.scrapeHtml(html, "https://example.com/x", extractors = Seq(Exploder))
    assert(row.error.exists(_.contains("exploder: boom")))
    assert(row.title == "T") // remaining extractors still ran
  }

  test("custom extractor writes into custom map (core-scraping.test.ts:235-258 PriceExtractor)") {
    object PriceExtractor extends graft.extract.Extractor {
      val name = "price"
      val priority = 50
      def extract(ctx: graft.extract.ExtractionContext): graft.extract.Partial =
        graft.extract.Partial(custom = Map(
          "price" -> ctx.doc.select(".price").map(_.text()).mkString))
    }
    val html = """<html><body><div class="price">$29.99</div></body></html>"""
    val row = ScrapePipeline.scrapeHtml(html, "https://example.com", extractors = Seq(PriceExtractor))
    assert(row.custom.get("price").contains("$29.99"))
  }

  test("custom map deep-merges across extractors, per-key newer wins (context.ts:79-83)") {
    def ex(n: String, prio: Int, kv: (String, String)*) = new graft.extract.Extractor {
      val name = n; val priority = prio
      def extract(ctx: graft.extract.ExtractionContext) = graft.extract.Partial(custom = kv.toMap)
    }
    val html = "<html><body><p>x</p></body></html>"
    val row = ScrapePipeline.scrapeHtml(html, "https://example.com",
      extractors = Seq(ex("a", 90, "k1" -> "v1", "shared" -> "early"),
                       ex("b", 10, "k2" -> "v2", "shared" -> "late")))
    assert(row.custom == Map("k1" -> "v1", "k2" -> "v2", "shared" -> "late"))
  }
}
