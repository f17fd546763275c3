package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import graft.dom.HtmlParser

/** Ported from `test/extractors/meta.test.ts` — every precedence chain. */
class MetaExtractorSpec extends AnyFunSuite {

  private def extract(html: String, url: String = "https://example.com"): Partial =
    MetaExtractor.extract(ExtractionContext(url, url, HtmlParser.parse(html)))

  test("name and priority") {
    assert(MetaExtractor.name == "meta")
    assert(MetaExtractor.priority == 100)
  }

  test("title: og:title primary") {
    val r = extract("""<html><head><title>Page Title</title>
      <meta property="og:title" content="OG Title">
      <meta name="twitter:title" content="Twitter Title"></head></html>""")
    assert(r.title.contains("OG Title"))
  }

  test("title: twitter fallback then <title>") {
    assert(extract("""<html><head><title>Page Title</title>
      <meta name="twitter:title" content="Twitter Title"></head></html>""").title.contains("Twitter Title"))
    assert(extract("<html><head><title>Page Title</title></head></html>").title.contains("Page Title"))
  }

  test("description: og primary, meta fallback") {
    assert(extract("""<html><head><meta name="description" content="Meta description">
      <meta property="og:description" content="OG description"></head></html>""").description.contains("OG description"))
    assert(extract("""<html><head><meta name="description" content="Meta description"></head></html>""")
      .description.contains("Meta description"))
  }

  test("image: og:image then twitter:image") {
    assert(extract("""<html><head><meta property="og:image" content="https://example.com/image.jpg"></head></html>""")
      .image.contains("https://example.com/image.jpg"))
    assert(extract("""<html><head><meta name="twitter:image" content="https://example.com/twitter.jpg"></head></html>""")
      .image.contains("https://example.com/twitter.jpg"))
  }

  test("author: meta author and article:author") {
    assert(extract("""<html><head><meta name="author" content="John Doe"></head></html>""").author.contains("John Doe"))
    assert(extract("""<html><head><meta property="article:author" content="Jane Doe"></head></html>""").author.contains("Jane Doe"))
  }

  test("canonical: link rel, og:url, finalUrl") {
    assert(extract("""<html><head><link rel="canonical" href="https://example.com/canonical"></head></html>""")
      .canonicalUrl.contains("https://example.com/canonical"))
    assert(extract("""<html><head><meta property="og:url" content="https://example.com/og-url"></head></html>""")
      .canonicalUrl.contains("https://example.com/og-url"))
    assert(extract("<html><head></head></html>", "https://example.com/final")
      .canonicalUrl.contains("https://example.com/final"))
  }

  test("dates: article times and time[datetime]") {
    assert(extract("""<html><head><meta property="article:published_time" content="2024-01-15T10:00:00Z"></head></html>""")
      .publishedAt.contains("2024-01-15T10:00:00Z"))
    assert(extract("""<html><body><time datetime="2024-01-15">Published Date</time></body></html>""")
      .publishedAt.contains("2024-01-15"))
    assert(extract("""<html><head><meta property="article:modified_time" content="2024-02-01T12:00:00Z"></head></html>""")
      .modifiedAt.contains("2024-02-01T12:00:00Z"))
  }

  test("language: html lang then og:locale") {
    assert(extract("""<html lang="en-US"><head></head></html>""").language.contains("en-US"))
    assert(extract("""<html><head><meta property="og:locale" content="fr_FR"></head></html>""").language.contains("fr_FR"))
  }

  test("keywords: split + empty") {
    assert(extract("""<html><head><meta name="keywords" content="javascript, typescript, nodejs"></head></html>""")
      .keywords.contains(Seq("javascript", "typescript", "nodejs")))
    assert(extract("<html><head></head></html>").keywords.contains(Seq.empty[String]))
  }

  test("site name: og:site_name") {
    assert(extract("""<html><head><meta property="og:site_name" content="My Site"></head></html>""")
      .siteName.contains("My Site"))
  }
}

/** M5 — detectContentType heuristics (`src/extractors/content.ts:108-165`). */
class ContentTypeSpec extends org.scalatest.funsuite.AnyFunSuite {
  private def detect(html: String, url: String): String =
    ContentTypeDetect.detect(ExtractionContext(url, url, graft.dom.HtmlParser.parse(html)))

  test("github repo / npm / pypi / docs / video") {
    assert(detect("<html></html>", "https://github.com/user/repo") == "repo")
    assert(detect("<html></html>", "https://github.com/user/repo/blob/main/x") != "repo")
    assert(detect("<html></html>", "https://www.npmjs.com/package/foo") == "package")
    assert(detect("<html></html>", "https://pypi.org/project/foo") == "package")
    assert(detect("<html></html>", "https://site.com/docs/intro") == "docs")
    assert(detect("<html></html>", "https://proj.readthedocs.io/en/latest") == "docs")
    assert(detect("<html></html>", "https://www.youtube.com/watch?v=x") == "video")
  }

  test("product via price/cart selectors") {
    assert(detect("""<html><body><span class="price">$9</span></body></html>""", "https://shop.example.com/x") == "product")
    assert(detect("""<html><body><button>Add to cart</button></body></html>""", "https://shop.example.com/x") == "product")
  }

  test("article via og:type and article+dateline; unknown fallback") {
    assert(detect("""<html><head><meta property="og:type" content="article"></head></html>""", "https://example.com/x") == "article")
    assert(detect("""<html><body><article><time datetime="2024-01-01">x</time>body</article></body></html>""", "https://example.com/x") == "article")
    assert(detect("<html><body><p>hi</p></body></html>", "https://example.com/x") == "unknown")
  }
}
