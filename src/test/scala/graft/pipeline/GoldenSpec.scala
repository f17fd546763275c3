package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source
import graft.ops.TextOps

/** Frozen-golden harness (FIXTURES.md / SURVEY.md §5.3c): first verified run
  * froze `(url, sha256(textContent), sha256(normalizedText), norm_hash)` into
  * `goldens.tsv`; every future run must reproduce them byte-for-byte. Any
  * intentional algorithm change must regenerate the goldens consciously. */
class GoldenSpec extends AnyFunSuite {

  private def fixture(name: String): String = {
    val in = getClass.getResourceAsStream(s"/scrapex-fixtures/$name")
    val s = Source.fromInputStream(in, "UTF-8").mkString
    in.close(); s
  }

  private lazy val goldens: Map[String, (String, String, String)] = {
    val in = getClass.getResourceAsStream("/goldens.tsv")
    val lines = Source.fromInputStream(in, "UTF-8").getLines().toVector
    in.close()
    lines.map { l =>
      val Array(url, tc, nt, nh) = l.split("\t", -1)
      url -> (tc, nt, nh)
    }.toMap
  }

  test("synthetic corpus rows 0..99 match frozen goldens byte-for-byte") {
    (0 until 100).foreach { i =>
      val p = PagesGen.makePage(i.toLong)
      val r = ScrapePipeline.scrapeHtml(ExtractJob.decodeHtml(p.html), p.url)
      val (tc, nt, nh) = goldens(r.url)
      assert(TextOps.sha256Hex(r.text_content) == tc, s"textContent drift at ${r.url}")
      assert(TextOps.sha256Hex(r.normalized_text) == nt, s"normalizedText drift at ${r.url}")
      assert(r.norm_hash == nh, s"norm_hash drift at ${r.url}")
    }
  }

  test("fixture pages match frozen goldens") {
    for ((f, u) <- Seq(
        ("messy-blog-post.html", "https://example.com/blog/messy"),
        ("article-real-world.html", "https://example.com/blog/deep-dive"),
        ("quick-start.html", "https://example.com/page"))) {
      val html = fixture(f).replace("{{BASE_URL}}", "https://example.com")
      val r = ScrapePipeline.scrapeHtml(html, u)
      val (tc, nt, nh) = goldens(r.url)
      assert(TextOps.sha256Hex(r.text_content) == tc, s"textContent drift at $f")
      assert(TextOps.sha256Hex(r.normalized_text) == nt, s"normalizedText drift at $f")
      assert(r.norm_hash == nh)
    }
  }
}
