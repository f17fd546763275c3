package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/**
 * Totality under adversarial markup: at 100 TB of real web crawl, markup
 * bombs (deep nesting, fan-out bombs, attribute bombs, unclosed structures,
 * byte soup) WILL occur, and a single page that throws — or takes minutes —
 * kills or stalls a Spark task. Every case here must produce a row (never
 * throw, including StackOverflowError, which escapes Exception containment)
 * within a generous wall bound.
 *
 * The guards under test: HtmlParser.MaxTreeDepth (512 — deep nesting
 * flattens; recursive DOM walks stay bounded), MaxAttrsPerTag (512),
 * MaxChildrenPerElement (8192 — bounds Readability's sibling-removal sweep),
 * and Markdown.MaxNodeChars (128k per-node content cap — bounds turndown's
 * per-level list re-indentation, provably invisible inside the 50k document
 * truncation every caller applies).
 */
class AdversarialHtmlSpec extends AnyFunSuite {

  private def total(name: String, html: String, boundSec: Double = 30.0): Unit = {
    val t0 = System.nanoTime()
    // call through the full per-row pipeline — the exact code a task runs
    val r = ScrapePipeline.scrapeHtml(html, s"https://example.com/$name")
    val dt = (System.nanoTime() - t0) / 1e9
    assert(r.status == "ok" || r.error.isDefined, s"$name must produce a row")
    assert(dt < boundSec, f"$name took $dt%.1f s (bound $boundSec%.0f s)")
  }

  test("deep nesting (200k divs) — was StackOverflowError before MaxTreeDepth") {
    total("deep_div", "<html><body>" + "<div>" * 200000 + "text" + "</div>" * 200000)
  }

  test("deep unclosed inline chain (100k p/b/i)") {
    total("deep_unclosed", "<html><body>" + "<p><b><i>" * 100000 + "x")
  }

  test("attribute bomb (50k attrs on one tag) — was 49s before MaxAttrsPerTag") {
    total("attr_bomb",
      "<html><body><div " + (1 to 50000).map(i => s"a$i='v$i'").mkString(" ") + ">x</div>", 10.0)
  }

  test("list bomb (60k nested ul/li) — was StackOverflow, then 140s, before the caps") {
    total("list_bomb", "<html><body>" + "<ul><li>item" * 60000)
  }

  test("table nesting bomb (30k table/tr/td)") {
    total("table_nest", "<html><body>" + "<table><tr><td>" * 30000 + "x")
  }

  test("blockquote nesting bomb (100k deep)") {
    total("blockquote_bomb",
      "<html><body>" + "<blockquote>" * 100000 + "quote" + "</blockquote>" * 100000)
  }

  test("flat sibling bomb (100k empty divs) — was quadratic sibling removal") {
    total("flat_siblings", "<html><body>" + "<div></div>" * 100000 + "<p>real content here</p>", 10.0)
  }

  test("entity soup, unclosed comment, cdata garbage, random bytes") {
    total("entity_soup", "<html><body><p>" + "&#xFFFFFFF;&#;&amp&bogus;&#x;" * 20000, 10.0)
    total("comment_unclosed", "<html><body><!-- " + "x" * 1000000, 10.0)
    total("cdata", "<html><body><![CDATA[" + "]]>" * 10000, 10.0)
    total("random_bytes",
      new String((0 until 300000).map(i => (graft.ops.TextOps.mix64(i.toLong) & 0xff).toChar).toArray), 10.0)
  }

  test("real content still extracted next to a markup bomb") {
    val r = ScrapePipeline.scrapeHtml(
      "<html><body><article><p>The quick brown fox jumps over the lazy dog. " +
        "This is genuine article content that must survive extraction even when " +
        "the page carries adversarial structures elsewhere in the document body.</p></article>" +
        "<div>" + "<ul><li>x" * 5000 + "</div>",
      "https://example.com/mixed")
    assert(r.text_content.contains("quick brown fox"))
  }
}
