package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

/**
 * Deterministic test-side DOCX writer — the PdfGen/WarcGen pattern: an
 * INDEPENDENT encoder (shares no code with [[Docx]]) producing frozen
 * fixture bytes for the oracle corpus. Entry timestamps are pinned so the
 * bytes are reproducible run to run.
 */
object DocxGen {

  private val FixedTime = 1704067200000L // 2024-01-01T00:00:00Z

  private def zip(entries: Seq[(String, String)]): Array[Byte] = {
    val bo = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bo)
    entries.foreach { case (name, content) =>
      val e = new ZipEntry(name)
      e.setTime(FixedTime)
      z.putNextEntry(e)
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    z.close()
    bo.toByteArray
  }

  private val contentTypes =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
      |<Default Extension="xml" ContentType="application/xml"/>
      |<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
      |</Types>""".stripMargin

  private def doc(bodyXml: String): String =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main" """ +
      """xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
      s"<w:body>$bodyXml</w:body></w:document>"

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def p(text: String, style: String = ""): String = {
    val pr = if (style.isEmpty) "" else s"""<w:pPr><w:pStyle w:val="$style"/></w:pPr>"""
    s"""<w:p>$pr<w:r><w:t xml:space="preserve">${esc(text)}</w:t></w:r></w:p>"""
  }

  /** Report: title-styled heading, Heading1, body paragraphs with a tab
    * and a line break inside one run, a 2x2 table, a hyperlink, core
    * metadata. */
  def report: Array[Byte] = zip(Seq(
    "[Content_Types].xml" -> contentTypes,
    "word/document.xml" -> doc(
      p("Quarterly Review", "Title") +
      p("Findings", "Heading1") +
      p("Revenue grew modestly across the northern region.") +
      """<w:p><w:r><w:t>Before</w:t><w:tab/><w:t>after tab</w:t><w:br/><w:t>new line</w:t></w:r></w:p>""" +
      """<w:tbl><w:tr><w:tc><w:p><w:r><w:t>Metric</w:t></w:r></w:p></w:tc><w:tc><w:p><w:r><w:t>Value</w:t></w:r></w:p></w:tc></w:tr>""" +
      """<w:tr><w:tc><w:p><w:r><w:t>Margin</w:t></w:r></w:p></w:tc><w:tc><w:p><w:r><w:t>12%</w:t></w:r></w:p></w:tc></w:tr></w:tbl>""" +
      """<w:p><w:hyperlink r:id="rId7"><w:r><w:t>details here</w:t></w:r></w:hyperlink></w:p>"""),
    "word/_rels/document.xml.rels" ->
      ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
       """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
       """<Relationship Id="rId7" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/hyperlink" Target="https://data.example.com/q3" TargetMode="External"/>""" +
       """</Relationships>"""),
    "docProps/core.xml" ->
      ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
       """<cp:coreProperties xmlns:cp="http://schemas.openxmlformats.org/package/2006/metadata/core-properties" """ +
       """xmlns:dc="http://purl.org/dc/elements/1.1/" xmlns:dcterms="http://purl.org/dc/terms/">""" +
       """<dc:title>Q3 Operations Report</dc:title><dc:creator>Ops Team</dc:creator>""" +
       """<dc:subject>quarterly metrics</dc:subject><cp:keywords>revenue, margin</cp:keywords>""" +
       """<dcterms:created>2024-10-01T08:00:00Z</dcterms:created>""" +
       """<dcterms:modified>2024-10-02T09:30:00Z</dcterms:modified></cp:coreProperties>""")))

  /** Minimal: one paragraph, no styles, no metadata, no rels. */
  def minimal: Array[Byte] = zip(Seq(
    "[Content_Types].xml" -> contentTypes,
    "word/document.xml" -> doc(p("Just one plain paragraph."))))

  /** Body text identical to a given plain text (for cross-route dedup
    * checks): one paragraph per line. */
  def fromText(text: String): Array[Byte] = zip(Seq(
    "[Content_Types].xml" -> contentTypes,
    "word/document.xml" -> doc(text.split("\n").map(l => p(l)).mkString)))

  /** Two-slide deck: title placeholder + body paragraphs per slide. */
  def deck: Array[Byte] = zip(Seq(
    "[Content_Types].xml" -> contentTypes,
    "ppt/presentation.xml" ->
      """<p:presentation xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"/>""",
    "ppt/slides/slide1.xml" ->
      ("""<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" """ +
       """xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"><p:cSld><p:spTree>""" +
       """<p:sp><p:nvSpPr><p:nvPr><p:ph type="ctrTitle"/></p:nvPr></p:nvSpPr>""" +
       """<p:txBody><a:p><a:r><a:t>Launch Plan</a:t></a:r></a:p></p:txBody></p:sp>""" +
       """<p:sp><p:txBody><a:p><a:r><a:t>Ship the beta in </a:t></a:r><a:r><a:t>October</a:t></a:r></a:p></p:txBody></p:sp>""" +
       """</p:spTree></p:cSld></p:sld>"""),
    "ppt/slides/slide2.xml" ->
      ("""<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" """ +
       """xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"><p:cSld><p:spTree>""" +
       """<p:sp><p:nvSpPr><p:nvPr><p:ph type="title"/></p:nvPr></p:nvSpPr>""" +
       """<p:txBody><a:p><a:r><a:t>Risks</a:t></a:r></a:p></p:txBody></p:sp>""" +
       """<p:sp><p:txBody><a:p><a:r><a:t>Vendor delay</a:t></a:r></a:p>""" +
       """<a:p><a:r><a:t>Hiring gap</a:t></a:r></a:p></p:txBody></p:sp>""" +
       """</p:spTree></p:cSld></p:sld>""")))

  /** One-sheet workbook: shared strings, an inline string, and numbers. */
  def workbook: Array[Byte] = zip(Seq(
    "[Content_Types].xml" -> contentTypes,
    "xl/workbook.xml" ->
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"/>""",
    "xl/sharedStrings.xml" ->
      ("""<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">""" +
       """<si><t>Region</t></si><si><t>Sales</t></si><si><t>North</t></si></sst>"""),
    "xl/worksheets/sheet1.xml" ->
      ("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
       """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>""" +
       """<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>1250</v></c></row>""" +
       """<row r="3"><c r="A3" t="inlineStr"><is><t>South</t></is></c><c r="B3"><v>990</v></c></row>""" +
       """</sheetData></worksheet>""")))

  /** Table nested inside a cell (common Word output): the inner table's
    * text must surface exactly once (inside the outer cell), never as
    * extra rows/cells of the outer table. */
  def nestedTableDoc: Array[Byte] = zip(Seq(
    "[Content_Types].xml" -> contentTypes,
    "word/document.xml" -> doc(
      """<w:tbl><w:tr><w:tc><w:p><w:r><w:t>outer</w:t></w:r></w:p>""" +
      """<w:tbl><w:tr><w:tc><w:p><w:r><w:t>inner</w:t></w:r></w:p></w:tc></w:tr></w:tbl>""" +
      """</w:tc><w:tc><w:p><w:r><w:t>right</w:t></w:r></w:p></w:tc></w:tr></w:tbl>""")))

  /** Slide paragraph with an a:br between runs. */
  def deckWithBreak: Array[Byte] = zip(Seq(
    "[Content_Types].xml" -> contentTypes,
    "ppt/presentation.xml" ->
      """<p:presentation xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"/>""",
    "ppt/slides/slide1.xml" ->
      ("""<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" """ +
       """xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"><p:cSld><p:spTree>""" +
       """<p:sp><p:txBody><a:p><a:r><a:t>Hello</a:t></a:r><a:br/><a:r><a:t>World</a:t></a:r></a:p></p:txBody></p:sp>""" +
       """</p:spTree></p:cSld></p:sld>""")))

  /** Two-chapter EPUB: container → OPF (manifest + spine + Dublin Core) →
    * XHTML chapters. */
  def book: Array[Byte] = zip(Seq(
    "mimetype" -> "application/epub+zip",
    "META-INF/container.xml" ->
      ("""<?xml version="1.0"?><container version="1.0" xmlns="urn:oasis:names:tc:opendocument:xmlns:container">""" +
       """<rootfiles><rootfile full-path="OEBPS/content.opf" media-type="application/oebps-package+xml"/></rootfiles></container>"""),
    "OEBPS/content.opf" ->
      ("""<?xml version="1.0"?><package xmlns="http://www.idpf.org/2007/opf" xmlns:dc="http://purl.org/dc/elements/1.1/" version="3.0">""" +
       """<metadata><dc:title>The Harbour Year</dc:title><dc:creator>A. Keeper</dc:creator>""" +
       """<dc:subject>maritime</dc:subject><dc:date>2024-02-02</dc:date></metadata>""" +
       """<manifest><item id="c1" href="ch1.xhtml" media-type="application/xhtml+xml"/>""" +
       """<item id="c2" href="ch2.xhtml" media-type="application/xhtml+xml"/>""" +
       """<item id="css" href="style.css" media-type="text/css"/></manifest>""" +
       """<spine><itemref idref="c1"/><itemref idref="c2"/></spine></package>"""),
    "OEBPS/ch1.xhtml" ->
      ("""<html><body><h1>Winter</h1><p>Ice sealed the harbour mouth in January.</p>""" +
       """<p>The keeper logged each frozen morning.</p></body></html>"""),
    "OEBPS/ch2.xhtml" ->
      """<html><body><h1>Spring</h1><p>The first sloop cleared the point in April.</p></body></html>""",
    "OEBPS/style.css" -> "p { margin: 0 }"))

  /** A ZIP that is NOT a DOCX (no word/document.xml). */
  def plainZip: Array[Byte] = zip(Seq(
    "readme.txt" -> "nothing wordprocessing about this archive"))

  /** Entry-count bomb: MaxEntries+ tiny entries before any document.xml. */
  def manyEntriesZip(n: Int): Array[Byte] =
    zip((0 until n).map(i => s"junk/$i.xml" -> "<x/>") :+
      ("word/document.xml" -> doc(p("buried"))))

  /** Inflate bomb: one huge highly-compressible document.xml. */
  def bigEntry(sizeBytes: Int): Array[Byte] = {
    val filler = p("a" * 1000) * (sizeBytes / 1050)
    zip(Seq(
      "[Content_Types].xml" -> contentTypes,
      "word/document.xml" -> doc(filler)))
  }
}
