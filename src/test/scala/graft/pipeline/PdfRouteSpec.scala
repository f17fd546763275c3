package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.content.NormalizeOptions
import graft.sources.PdfGen

/** Round-6 parity of the PDF route with the HTML route (VERDICT r5
  * #1/#2/#3/#4): layout blocks run the SAME B2 classifier + B7
  * normalizeText gates, `content` gets the C3 cap + marker, parser
  * containment surfaces in norm_meta.truncated, encrypted PDFs get their
  * own status, and exact-dedup keys are byte-comparable across routes. */
class PdfRouteSpec extends AnyFunSuite {

  private val url = "https://pdf.example.com/doc.pdf"

  test("cross-route exact dedup: HTML page and PDF with the same content share norm_hash") {
    val htmlRow = ScrapePipeline.scrapeHtml(PdfGen.crossRouteHtml, "https://site-a.example.com/page")
    val pdfRow = ScrapePipeline.scrapePdf(PdfGen.crossRoutePdf(), "https://site-b.example.com/doc.pdf")
    assert(htmlRow.status == "ok" && pdfRow.status == "ok")
    assert(htmlRow.normalized_text ==
      "# Shared Cross-Route Document\n\nThis exact paragraph exists in both routes.\n\nA second matching paragraph closes the document.")
    assert(htmlRow.normalized_text == pdfRow.normalized_text, "byte-identical across routes")
    assert(htmlRow.norm_hash == pdfRow.norm_hash)
  }

  test("PDF blocks run the B2 classifier: short no-punct block rejected like its HTML twin") {
    val row = ScrapePipeline.scrapePdf(PdfGen.fixtureDocs.toMap.apply("kerning"), url)
    assert(row.status == "ok")
    assert(row.norm_meta.blocks_total == 1)
    assert(row.norm_meta.blocks_accepted == 0, "'Kerned words here' is a too-short reject")
    assert(row.normalized_text.isEmpty)
    assert(row.norm_meta.classifier_used && row.norm_meta.boilerplate_removed)
  }

  test("C3 parity: content over 50k gets the same cap + truncation marker as the HTML route") {
    val line = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do " * 4).trim
    val sb = new StringBuilder("BT /F1 12 Tf 72 10000 Td\n")
    (0 until 250).foreach(_ => sb.append(s"($line) Tj 0 -14 Td\n"))
    sb.append("ET")
    val row = ScrapePipeline.scrapePdf(PdfGen.onePage(sb.toString), url)
    assert(row.status == "ok")
    assert(row.content.length <= 50000 + "\n\n[Content truncated...]".length)
    assert(row.content.endsWith("[Content truncated...]"))
    // text_content/normalized_text are governed by the B7 gates, not C3
    assert(row.text_content.length > 50000)
  }

  test("normalizeOptions gates apply on the PDF route: maxChars truncates, minChars empties") {
    val pdf = PdfGen.fixtureDocs.toMap.apply("plain")
    val capped = ScrapePipeline.scrapePdf(pdf, url, NormalizeOptions(maxChars = Some(30), truncate = "char"))
    assert(capped.norm_meta.truncated)
    assert(capped.normalized_text.length <= 30)
    val emptied = ScrapePipeline.scrapePdf(pdf, url, NormalizeOptions(minChars = Some(100000)))
    assert(emptied.normalized_text.isEmpty)
    assert(emptied.norm_meta.blocks_accepted == 0)
  }

  test("parser containment surfaces in norm_meta.truncated (no silent caps)") {
    val ops = "BT /F1 12 Tf 72 700 Td (visible text stays here.) Tj " +
      ("T* " * 4100000) + "(never) Tj ET"
    val row = ScrapePipeline.scrapePdf(PdfGen.onePage(ops), url)
    assert(row.status == "ok")
    assert(row.norm_meta.truncated, "interpreter guard must reach norm_meta")
    assert(row.text_content.contains("visible text stays here."))
  }

  test("encrypted PDFs get their own status, distinct from empty_html") {
    val enc = ScrapePipeline.scrapePdf(PdfGen.encryptedPdf(), url)
    assert(enc.status == "encrypted_pdf")
    assert(enc.error.exists(_.contains("encrypted")))
    assert(enc.content_type == "pdf")
    assert(enc.domain == "pdf.example.com")
    val empty = ScrapePipeline.scrapePdf(PdfGen.fixtureDocs.toMap.apply("corrupt"), url)
    assert(empty.status == "empty_html")
  }

  test("/Info document metadata populates title/author/dates/keywords (round 6)") {
    val row = ScrapePipeline.scrapePdf(PdfGen.docInfoPdf(), url)
    assert(row.title == "Document Info Title") // UTF-16BE BOM hex string
    assert(row.author.contains("Jane Q. Author"))
    assert(row.description == "A concise subject line.")
    assert(row.keywords == Seq("alpha", "beta", "gamma"))
    assert(row.published_at.contains("2024-01-02T03:04:05+01:00"))
    assert(row.modified_at.contains("2024-06-01T12:00:00Z"))
    // docs WITHOUT /Info keep the first-heading title heuristic
    val plain = ScrapePipeline.scrapePdf(PdfGen.fixtureDocs.toMap.apply("plain"), url)
    assert(plain.title == "Annual Report")
    assert(plain.author.isEmpty)
  }

  test("FreeText annotations extract; /Link URIs populate links with M4-style filtering (round 6)") {
    val row = ScrapePipeline.scrapePdf(PdfGen.annotsPdf(), url)
    assert(row.text_content.contains("A margin note worth keeping."))
    assert(row.links.map(l => (l.url, l.is_external)) == Seq(
      ("https://elsewhere.example.org/x", true),
      ("https://pdf.example.com/other", false))) // mailto filtered out
  }

  test("PDF headings normalize with the same '# ' level-1 prefix as HTML h1") {
    val row = ScrapePipeline.scrapePdf(PdfGen.fixtureDocs.toMap.apply("plain"), url)
    assert(row.normalized_text.startsWith("# Annual Report\n\n"))
    assert(row.norm_meta.hash == row.norm_hash)
  }
}
