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

  private def p(text: String, style: String = ""): String = {
    val pr = if (style.isEmpty) "" else s"""<w:pPr><w:pStyle w:val="$style"/></w:pPr>"""
    s"""<w:p>$pr<w:r><w:t xml:space="preserve">$text</w:t></w:r></w:p>"""
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
