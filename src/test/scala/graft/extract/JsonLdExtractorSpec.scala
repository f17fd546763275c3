package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import graft.dom.HtmlParser

/** Ported from `test/extractors/jsonld.test.ts` — shape polymorphism cases. */
class JsonLdExtractorSpec extends AnyFunSuite {

  private def extract(html: String): Partial =
    JsonLdExtractor.extract(ExtractionContext("https://example.com", "https://example.com", HtmlParser.parse(html)))

  private def ld(json: String): String =
    s"""<html><head><script type="application/ld+json">$json</script></head></html>"""

  test("name and priority") {
    assert(JsonLdExtractor.name == "jsonld")
    assert(JsonLdExtractor.priority == 80)
  }

  test("extracts JSON-LD from script tag") {
    val r = extract(ld("""{"@context": "https://schema.org", "@type": "Article", "headline": "Test Article"}"""))
    assert(r.jsonLd.exists(_.length == 1))
    assert(r.title.contains("Test Article"))
  }

  test("multiple blocks and arrays") {
    val multi = extract(
      """<html><head>
        |<script type="application/ld+json">{"@type": "Article", "headline": "One"}</script>
        |<script type="application/ld+json">{"@type": "Organization", "name": "Org"}</script>
        |</head></html>""".stripMargin)
    assert(multi.jsonLd.exists(_.length == 2))
    assert(multi.siteName.contains("Org"))

    val arr = extract(ld("""[{"@type": "Article", "headline": "Article One"},{"@type": "Article", "headline": "Article Two"}]"""))
    assert(arr.jsonLd.exists(_.length == 2))
    assert(arr.title.contains("Article One")) // first-wins across blocks
  }

  test("skips invalid JSON; empty when none") {
    val r = extract(
      """<html><head>
        |<script type="application/ld+json">invalid json{</script>
        |<script type="application/ld+json">{"@type": "Valid"}</script>
        |</head></html>""".stripMargin)
    assert(r.jsonLd.exists(_.length == 1))
    assert(extract("<html><head></head></html>").jsonLd.isEmpty)
  }

  test("article metadata extraction") {
    val r = extract(ld(
      """{"@type": "Article", "headline": "Test Headline", "description": "Test description",
        |"author": {"@type": "Person", "name": "John Doe"}, "datePublished": "2024-01-15",
        |"dateModified": "2024-02-01", "image": "https://example.com/image.jpg"}""".stripMargin))
    assert(r.title.contains("Test Headline"))
    assert(r.description.contains("Test description"))
    assert(r.author.contains("John Doe"))
    assert(r.publishedAt.contains("2024-01-15"))
    assert(r.modifiedAt.contains("2024-02-01"))
    assert(r.image.contains("https://example.com/image.jpg"))
  }

  test("author shapes: string / array") {
    assert(extract(ld("""{"@type": "Article", "author": "Jane Doe"}""")).author.contains("Jane Doe"))
    assert(extract(ld("""{"@type": "Article", "headline": "Test", "author": [{"@type": "Person", "name": "Author One"},{"@type": "Person", "name": "Author Two"}]}"""))
      .author.contains("Author One, Author Two"))
  }

  test("image shapes: object / array") {
    assert(extract(ld("""{"@type": "Article", "image": {"@type": "ImageObject", "url": "https://example.com/image.jpg"}}"""))
      .image.contains("https://example.com/image.jpg"))
    assert(extract(ld("""{"@type": "Article", "headline": "Test", "image": ["https://example.com/first.jpg", "https://example.com/second.jpg"]}"""))
      .image.contains("https://example.com/first.jpg"))
  }

  test("Organization / Product extraction") {
    assert(extract(ld("""{"@type": "Organization", "name": "My Organization"}""")).siteName.contains("My Organization"))
    val p = extract(ld("""{"@type": "Product", "name": "Test Product", "description": "Product description", "image": "https://example.com/product.jpg"}"""))
    assert(p.title.contains("Test Product"))
    assert(p.description.contains("Product description"))
    assert(p.image.contains("https://example.com/product.jpg"))
  }

  test("keywords: string / array / dedup across blocks") {
    assert(extract(ld("""{"@type": "Article", "keywords": "javascript, typescript, nodejs"}"""))
      .keywords.contains(Seq("javascript", "typescript", "nodejs")))
    assert(extract(ld("""{"@type": "Article", "keywords": ["javascript", "typescript"]}"""))
      .keywords.contains(Seq("javascript", "typescript")))
    val dedup = extract(
      """<html><head>
        |<script type="application/ld+json">{"keywords": "javascript, typescript"}</script>
        |<script type="application/ld+json">{"keywords": "typescript, nodejs"}</script>
        |</head></html>""".stripMargin)
    assert(dedup.keywords.contains(Seq("javascript", "typescript", "nodejs")))
  }

  test("@type as array") {
    assert(extract(ld("""{"@type": ["Article", "NewsArticle"], "headline": "News"}""")).title.contains("News"))
  }
}
