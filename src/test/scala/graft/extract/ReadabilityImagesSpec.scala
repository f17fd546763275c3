package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import graft.dom.HtmlParser

/** Round-4 fidelity ports from readability.js: `_unwrapNoscriptImages`,
  * `_fixLazyImages`, and the cleanConditionally image-gallery exemption —
  * lazy-loaded and noscript-fallback images must survive into content. */
class ReadabilityImagesSpec extends AnyFunSuite {

  private val para =
    "<p>This is a long and meaningful paragraph of genuine article prose that gives " +
    "the readability scorer plenty of commas, words, and sentence structure to work " +
    "with, so the surrounding container is selected as the top candidate.</p>"

  private def article(inner: String): Option[Article] =
    Readability.parse(
      HtmlParser.parse(s"<html><body><div id='main'>$para$para$inner$para</div></body></html>"),
      "https://example.com/a")

  test("lazy image: data-src promoted to src when no src present") {
    val art = article("""<img class="lazy-img" data-src="https://example.com/real.jpg" alt="x">""")
    assert(art.exists(_.content.contains("real.jpg")), art.map(_.content))
  }

  test("tiny base64 placeholder src is dropped and the lazy attribute promoted") {
    val placeholder = "data:image/gif;base64," + "A" * 40 // < 133 b64 chars
    val art = article(
      s"""<img class="lazy" src="$placeholder" data-src="https://example.com/real2.png">""")
    assert(art.exists(a => a.content.contains("real2.png") && !a.content.contains("base64")),
      art.map(_.content))
  }

  test("noscript fallback image replaces its placeholder sibling") {
    val art = article(
      """<img src="data:image/gif;base64,R0lGODlhAQABAAAAACw=">""" +
      """<noscript><img src="https://example.com/fallback.jpg"></noscript>""")
    assert(art.exists(_.content.contains("fallback.jpg")), art.map(_.content))
  }

  test("img with no image-bearing attribute at all is dropped") {
    val art = article("""<img class="tracker" data-beacon="pixel">""")
    assert(art.exists(a => !a.content.contains("<img") && !a.content.contains("![")))
  }

  test("image-gallery list (every li a single img) survives cleanConditionally") {
    val gallery = "<ul class='gallery'>" +
      (1 to 4).map(i => s"""<li><img src="https://example.com/g$i.jpg"></li>""").mkString +
      "</ul>"
    val art = article(gallery)
    assert(art.exists(_.content.contains("g1.jpg")), art.map(_.content))
  }
}
