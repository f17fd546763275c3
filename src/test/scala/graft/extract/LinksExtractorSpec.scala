package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import graft.dom.HtmlParser

/** Ported from `test/extractors/links.test.ts` — skip rules, caps, dedupe. */
class LinksExtractorSpec extends AnyFunSuite {

  private def links(html: String, url: String = "https://example.com"): Seq[ExtractedLink] =
    LinksExtractor.extract(ExtractionContext(url, url, HtmlParser.parse(html))).links.getOrElse(Nil)

  test("name and priority") {
    assert(LinksExtractor.name == "links")
    assert(LinksExtractor.priority == 30)
  }

  test("extracts links from content") {
    val r = links("""<html><body><article>
      <a href="https://external.com/page">External Link</a>
      <a href="/internal/page">Internal Link</a></article></body></html>""")
    assert(r.length == 2)
  }

  test("marks external links correctly") {
    val r = links("""<html><body><article>
      <a href="https://other.com/page">External</a>
      <a href="https://example.com/page">Internal</a></article></body></html>""")
    assert(r.find(_.url.contains("other.com")).exists(_.isExternal))
    assert(r.find(_.url.contains("example.com")).exists(!_.isExternal))
  }

  test("resolves relative URLs") {
    val r = links("""<html><body><article>
      <a href="/relative/path">Relative Link</a>
      <a href="./another/path">Another Relative</a></article></body></html>""",
      "https://example.com/page/")
    assert(r.exists(_.url == "https://example.com/relative/path"))
  }

  test("link text + title attribute fallback") {
    assert(links("""<html><body><article><a href="https://example.com/link">Link Text Here</a></article></body></html>""")
      .head.text == "Link Text Here")
    val r = links("""<html><body><article><a href="https://example.com/link" title="Title Text"></a></article></body></html>""")
    assert(r.length == 1 && r.head.text == "Title Text")
  }

  test("skips anchors, javascript, mailto, tel") {
    assert(links("""<html><body><article><a href="#section">Anchor Link</a><a href="https://example.com/real">Real Link</a></article></body></html>""").length == 1)
    assert(links("""<html><body><article><a href="javascript:void(0)">JS Link</a><a href="https://example.com/real">Real Link</a></article></body></html>""").length == 1)
    assert(links("""<html><body><article><a href="mailto:test@example.com">Email</a><a href="tel:+1234567890">Phone</a><a href="https://example.com/real">Real Link</a></article></body></html>""").length == 1)
  }

  test("skips very short text; deduplicates") {
    val r = links("""<html><body><article><a href="https://example.com/a">X</a><a href="https://example.com/b">Longer Text</a></article></body></html>""")
    assert(r.length == 1 && r.head.text == "Longer Text")
    assert(links("""<html><body><article><a href="https://example.com/page">Link One</a><a href="https://example.com/page">Link Two</a></article></body></html>""").length == 1)
  }

  test("skips nav/header/footer/nav-class links") {
    assert(links("""<html><body><nav><a href="https://example.com/nav">Nav Link</a></nav><article><a href="https://example.com/content">Content Link</a></article></body></html>""")
      .map(_.url).forall(_.contains("content")))
    assert(links("""<html><body><header><a href="https://example.com/header">Header Link</a></header><article><a href="https://example.com/content">Content Link</a></article></body></html>""").length == 1)
    assert(links("""<html><body><article><a href="https://example.com/content">Content Link</a></article><footer><a href="https://example.com/footer">Footer Link</a></footer></body></html>""").length == 1)
    assert(links("""<html><body><div class="navigation-menu"><a href="https://example.com/menu">Menu Link</a></div><article><a href="https://example.com/content">Content Link</a></article></body></html>""").length == 1)
  }

  test("content area: article/main preferred over body") {
    val a = links("""<html><body><article><a href="https://example.com/article">Article Link</a></article><aside><a href="https://example.com/aside">Aside Link</a></aside></body></html>""")
    assert(a.length == 1 && a.head.url.contains("article"))
    assert(links("""<html><body><main><a href="https://example.com/main">Main Link</a></main><aside><a href="https://example.com/aside">Aside Link</a></aside></body></html>""").length == 1)
  }

  test("caps at 100 links, text at 200 chars") {
    val many = (1 to 150).map(i => s"""<a href="https://example.com/p$i">Link number $i</a>""").mkString
    assert(links(s"<html><body><article>$many</article></body></html>").length == 100)
    val long = "x" * 500
    val r = links(s"""<html><body><article><a href="https://example.com/l">$long</a></article></body></html>""")
    assert(r.head.text.length == 200)
  }
}
