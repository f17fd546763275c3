package graft.content

import org.scalatest.funsuite.AnyFunSuite
import graft.dom.HtmlParser

/** Ported from the reference's `test/content/{blocks,classifier,normalizer}.test.ts`. */
class ContentSpec extends AnyFunSuite {

  private def block(t: String, text: String, level: Option[Int] = None): ContentBlock =
    ContentBlock(t, text, level, None, Map.empty, Nil, 0)

  private val ctx = ClassifierContext(0, 1, None, Nil, 0)

  // --- parseBlocks ---

  test("parses headings and paragraphs with levels") {
    val html =
      """
      <main>
        <h1>Main Title</h1>
        <p>First paragraph.</p>
        <h2>Section</h2>
        <p>Second paragraph.</p>
      </main>
    """
    val blocks = BlockParser.parseBlocks(HtmlParser.parse(html))
    assert(blocks.length == 4)
    assert(blocks(0).blockType == "heading" && blocks(0).level.contains(1) && blocks(0).text == "Main Title")
    assert(blocks(1).blockType == "paragraph" && blocks(1).text == "First paragraph.")
    assert(blocks(2).blockType == "heading" && blocks(2).level.contains(2) && blocks(2).text == "Section")
    assert(blocks(3).blockType == "paragraph" && blocks(3).text == "Second paragraph.")
  }

  test("respects drop selectors and removes noisy elements") {
    val html =
      """
      <body>
        <div class="ad">Sponsored block</div>
        <p>Keep this.</p>
        <script>console.log('drop');</script>
      </body>
    """
    val blocks = BlockParser.parseBlocks(HtmlParser.parse(html), dropSelectors = Seq(".ad"))
    assert(blocks.length == 1)
    assert(blocks(0).blockType == "paragraph" && blocks(0).text == "Keep this.")
  }

  test("caps blocks at maxBlocks") {
    val html = "<body><p>One</p><p>Two</p><p>Three</p></body>"
    val blocks = BlockParser.parseBlocks(HtmlParser.parse(html), maxBlocks = 2)
    assert(blocks.length == 2)
  }

  test("extracts table text content") {
    val html =
      """
      <body>
        <table>
          <tr><th>Column A</th><th>Column B</th></tr>
          <tr><td>Value 1</td><td>Value 2</td></tr>
        </table>
      </body>
    """
    val blocks = BlockParser.parseBlocks(HtmlParser.parse(html))
    assert(blocks.length == 1)
    assert(blocks(0).blockType == "table")
    assert(blocks(0).text.contains("Column A"))
    assert(blocks(0).text.contains("Value 1"))
  }

  // --- defaultBlockClassifier ---

  test("rejects navigation and footer blocks") {
    assert(!Classifier.default(block("nav", "Main menu"), ctx).accept)
    assert(!Classifier.default(block("footer", "All rights reserved"), ctx).accept)
  }

  test("rejects boilerplate phrases") {
    val r = Classifier.default(block("paragraph", "Subscribe to our newsletter today"), ctx)
    assert(!r.accept && r.label.contains("boilerplate"))
  }

  test("accepts substantive paragraph content") {
    val r = Classifier.default(
      block("paragraph", "This is a longer paragraph with enough information to be meaningful."), ctx)
    assert(r.accept && r.score.exists(_ > 0.5))
  }

  test("rejects very short fragments without punctuation") {
    val r = Classifier.default(block("paragraph", "Click here"), ctx)
    assert(!r.accept && r.label.contains("too-short"))
  }

  test("accepts short sentences with punctuation") {
    assert(Classifier.default(block("paragraph", "All set."), ctx).accept)
  }

  test("rejects media credits and captions") {
    val r = Classifier.default(block("paragraph", "Photo by Jane Doe"), ctx)
    assert(!r.accept && r.label.contains("media-credit"))
  }

  test("assigns higher scores to headings by level") {
    assert(Classifier.default(block("heading", "Title", Some(1)), ctx).score.contains(0.9))
    assert(Classifier.default(block("heading", "Section", Some(2)), ctx).score.contains(0.8))
    assert(Classifier.default(block("heading", "Subsection", Some(3)), ctx).score.contains(0.7))
  }

  test("uses a consistent score for quote and code blocks") {
    assert(Classifier.default(block("quote", "A concise quote."), ctx).score.contains(0.7))
    assert(Classifier.default(block("code", "const x = 1;"), ctx).score.contains(0.7))
  }

  // --- normalizeText ---

  test("decodes entities, normalizes whitespace, and strips markdown links") {
    val blocks = Seq(block("paragraph", "Hello&nbsp;world &amp; [Link](https://example.com)"))
    val result = Normalizer.normalizeText(blocks)
    assert(result.text == "Hello world & Link")
  }

  test("truncates at sentence boundaries") {
    val blocks = Seq(block("paragraph",
      "This is the first sentence. Second sentence is much longer than the first. Third sentence here."))
    val result = Normalizer.normalizeText(blocks, NormalizeOptions(maxChars = Some(50), truncate = "sentence"))
    assert(result.text == "This is the first sentence.")
    assert(result.meta.truncated)
  }

  test("returns empty text when below minChars") {
    val result = Normalizer.normalizeText(Seq(block("paragraph", "Short")), NormalizeOptions(minChars = Some(10)))
    assert(result.text == "")
    assert(result.meta.blocksAccepted == 0)
  }

  // --- extra invariants ---

  test("hash: sha256 first 32 hex chars") {
    // sha256("abc") = ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad
    assert(Normalizer.generateHash("abc") == "ba7816bf8f01cfea414140de5dae2223")
  }

  test("tokenEstimate is ceil(len/4); heading prefixes; summary sort stable") {
    val blocks = Seq(
      block("heading", "Top Title", Some(1)),
      block("paragraph", "This paragraph carries a decent amount of substance for scoring purposes."),
      block("heading", "Sub Section", Some(3))
    )
    val full = Normalizer.normalizeText(blocks)
    assert(full.text.startsWith("# Top Title\n\n"))
    assert(full.text.contains("\n\n### Sub Section"))
    assert(full.meta.tokenEstimate == math.ceil(full.text.length / 4.0).toInt)

    val summary = Normalizer.normalizeText(blocks, NormalizeOptions(mode = "summary"))
    // h1 (0.9) first; then the two 0.5-ish: paragraph scored 0.5+len/1000 > 0.7? text len 74 → 0.574
    assert(summary.text.startsWith("# Top Title"))
  }

  test("JS fromCharCode quirk: astral numeric entity truncates to 16 bits") {
    // &#128169; (💩 U+1F4A9) → JS String.fromCharCode(128169) → U+F4A9
    val r = Normalizer.normalizeString("x &#128169; y")
    assert(r == "x  y")
  }
}
