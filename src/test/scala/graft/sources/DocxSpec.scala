package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** DOCX extractor over the frozen DocxGen corpus plus adversarial
  * containers: block/kind/text mapping, run composition (tab/br),
  * tables, hyperlink rels, core metadata, and the bomb/garbage classes
  * (totality: parseDetailed never throws). */
class DocxSpec extends AnyFunSuite {

  test("report: headings, runs with tab/br, table flattening, links, meta") {
    val r = Docx.parseDetailed(DocxGen.report)
    assert(r.status == "ok" && !r.truncated)
    val kinds = r.blocks.map(b => (b.kind, b.text))
    assert(kinds(0) == (("heading", "Quarterly Review")))
    assert(kinds(1) == (("heading", "Findings")))
    assert(kinds(2) == (("text", "Revenue grew modestly across the northern region.")))
    assert(kinds(3) == (("text", "Before\tafter tab\nnew line")))
    assert(kinds(4) == (("table", "Metric | Value\nMargin | 12%")))
    assert(kinds(5) == (("text", "details here")))
    assert(r.links == Vector("https://data.example.com/q3"))
    assert(r.meta("title") == "Q3 Operations Report")
    assert(r.meta("author") == "Ops Team")
    assert(r.meta("keywords") == "revenue, margin")
    assert(r.meta("created") == "2024-10-01T08:00:00Z")
  }

  test("minimal: one paragraph, empty meta and links") {
    val r = Docx.parseDetailed(DocxGen.minimal)
    assert(r.status == "ok")
    assert(r.blocks.map(_.text) == Vector("Just one plain paragraph."))
    assert(r.meta.isEmpty && r.links.isEmpty)
  }

  test("a ZIP without word/document.xml is not_docx; non-ZIP bytes too") {
    assert(Docx.parseDetailed(DocxGen.plainZip).status == "not_docx")
    assert(Docx.parseDetailed("<html>x</html>".getBytes("UTF-8")).status == "not_docx")
    assert(Docx.parseDetailed(Array.emptyByteArray).status == "not_docx")
    assert(Docx.parseDetailed(null).status == "not_docx")
    // PK magic followed by garbage: a corrupt archive, still total
    val garbage = Array[Byte]('P', 'K', 3, 4) ++ Array.fill(64)(0x5a.toByte)
    assert(Docx.parseDetailed(garbage).status == "not_docx")
  }

  test("entry-count bomb: caps at MaxEntries and flags truncated, never silently") {
    val r = Docx.parseDetailed(DocxGen.manyEntriesZip(Docx.MaxEntries + 10))
    // document.xml is buried past the cap: whatever the classification,
    // the cut MUST surface as truncated (no silent caps)
    assert(r.truncated, s"cap cut the walk but truncated=false (status ${r.status})")
  }

  test("nested table text surfaces exactly once, inside its outer cell") {
    val r = Docx.parseDetailed(DocxGen.nestedTableDoc)
    assert(r.blocks.map(b => (b.kind, b.text)) == Vector(
      ("table", "outer inner | right")))
  }

  test("pptx a:br separates runs instead of merging words") {
    val r = Docx.parseDetailed(DocxGen.deckWithBreak)
    assert(r.blocks.map(_.text) == Vector("Hello\nWorld"))
  }

  test("unwanted-entry bulk costs no inflate work (central-directory reads)") {
    // a 1000:1-compressible 24 MiB junk entry before document.xml: the old
    // streaming reader inflated it to discard it; the CD reader must not —
    // pin by wall time (decompressing tens of MB of zeros is measurable,
    // skipping them is not)
    val junk = "z" * (24 << 20)
    val bytes = {
      val bo = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(bo)
      def add(n: String, c: String): Unit = {
        val e = new java.util.zip.ZipEntry(n); e.setTime(0L)
        z.putNextEntry(e); z.write(c.getBytes("UTF-8")); z.closeEntry()
      }
      add("media/huge.bin", junk)
      add("word/document.xml",
        """<w:document xmlns:w="x"><w:body><w:p><w:r><w:t>after the junk</w:t></w:r></w:p></w:body></w:document>""")
      z.close(); bo.toByteArray
    }
    val t0 = System.nanoTime()
    val r = Docx.parseDetailed(bytes)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(r.status == "ok" && r.blocks.head.text == "after the junk")
    assert(ms < 250, f"parse took $ms%.0f ms — unwanted entries are being inflated")
  }

  test("inflate bomb: per-entry cap flags truncated, never OOMs") {
    val r = Docx.parseDetailed(DocxGen.bigEntry(Docx.MaxEntryBytes + (4 << 20)))
    assert(r.truncated, "oversized document.xml must flag truncated")
  }

  test("pptx: slides in numeric order, title placeholders become headings") {
    val r = Docx.parseDetailed(DocxGen.deck)
    assert(r.status == "ok" && r.flavor == "pptx")
    assert(r.blocks.map(b => (b.page, b.kind, b.text)) == Vector(
      (0, "heading", "Launch Plan"),
      (0, "text", "Ship the beta in October"), // runs concatenate
      (1, "heading", "Risks"),
      (1, "text", "Vendor delay"),
      (1, "text", "Hiring gap")))
  }

  test("xlsx: shared strings, inline strings, and literal values per sheet") {
    val r = Docx.parseDetailed(DocxGen.workbook)
    assert(r.status == "ok" && r.flavor == "xlsx")
    assert(r.blocks.map(b => (b.kind, b.text)) == Vector(
      ("table", "Region | Sales\nNorth | 1250\nSouth | 990")))
  }

  test("epub: spine-ordered chapters through the HTML block machinery") {
    val r = Docx.parseDetailed(DocxGen.book)
    assert(r.status == "ok" && r.flavor == "epub")
    assert(r.meta("title") == "The Harbour Year" && r.meta("author") == "A. Keeper")
    assert(r.blocks.map(b => (b.page, b.kind, b.text)) == Vector(
      (0, "heading", "Winter"),
      (0, "text", "Ice sealed the harbour mouth in January."),
      (0, "text", "The keeper logged each frozen morning."),
      (1, "heading", "Spring"),
      (1, "text", "The first sloop cleared the point in April.")))
    val row = graft.pipeline.ExtractJob.scrapeAny(
      "https://books.example.com/harbour.epub", DocxGen.book)
    assert(row.status == "ok" && row.content_type == "epub")
    assert(row.title == "The Harbour Year")
  }

  test("pptx/xlsx route through scrapeAny with their own content_type") {
    val deck = graft.pipeline.ExtractJob.scrapeAny(
      "https://docs.example.com/d.pptx", DocxGen.deck)
    assert(deck.status == "ok" && deck.content_type == "pptx")
    assert(deck.title == "Launch Plan") // first heading, no core.xml title
    val wb = graft.pipeline.ExtractJob.scrapeAny(
      "https://docs.example.com/w.xlsx", DocxGen.workbook)
    assert(wb.status == "ok" && wb.content_type == "xlsx")
    assert(wb.text_content.contains("North | 1250"))
  }

  test("scrapeAny routes ZIP → docx; dedup keys comparable across routes") {
    val text = "Shared body sentence one.\nShared body sentence two."
    val docx = graft.pipeline.ExtractJob.scrapeAny(
      "https://docs.example.com/a.docx", DocxGen.fromText(text))
    assert(docx.content_type == "docx" && docx.status == "ok")
    assert(docx.word_count > 0)
    val html = graft.pipeline.ExtractJob.scrapeAny(
      "https://docs.example.com/a.html",
      ("<html><body><p>Shared body sentence one.</p>" +
        "<p>Shared body sentence two.</p></body></html>").getBytes("UTF-8"))
    assert(html.norm_hash == docx.norm_hash,
      s"cross-route exact-dedup keys must match: ${html.norm_hash} vs ${docx.norm_hash}")
  }

  test("not_docx zip through the pipeline carries its own error code") {
    val row = graft.pipeline.ExtractJob.scrapeAny(
      "https://docs.example.com/x.zip", DocxGen.plainZip)
    assert(row.status == "not_docx" && row.content_type == "docx")
  }

  test("truncation surfaces in norm_meta on the pipeline row") {
    val row = graft.pipeline.ScrapePipeline.scrapeDocx(
      DocxGen.bigEntry(Docx.MaxEntryBytes + (4 << 20)), "https://docs.example.com/big.docx")
    assert(row.norm_meta.truncated)
  }
}
