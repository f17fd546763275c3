package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import graft.dom.{Element, Node, TextNode}
import graft.feed.XmlParser

/**
 * From-scratch DOCX (OOXML WordprocessingML) text extractor — the office-
 * document leg of the content-type routing, beside HTML and PDF. No Office
 * libraries exist in the sandbox (no POI/tika in `/opt/spark/jars`); a
 * .docx is a ZIP of XML parts, so the JDK `ZipInputStream` plus the
 * existing [[graft.feed.XmlParser]] cover the whole format.
 *
 * Parts read: `word/document.xml` (required — its absence means "a ZIP
 * but not a DOCX"), `docProps/core.xml` (Dublin-Core metadata → the same
 * meta keys the PDF /Info route emits), `word/_rels/document.xml.rels`
 * (hyperlink relationship targets). Body mapping:
 *
 *  - `w:p` → one text/heading block; run text from descendant `w:t`
 *    (space-preserving), `w:tab` → TAB, `w:br`/`w:cr` → newline;
 *    `w:pPr/w:pStyle@w:val` of `Heading*`/`Title` marks a heading;
 *  - `w:hyperlink@r:id` resolves through the rels part into the links
 *    list (the M4 analogue);
 *  - `w:tbl` → ONE table block, rows joined with newlines and cells with
 *    " | " (the markdown-ish flattening the training pipeline wants).
 *
 * Bomb containment (the PDF route's budget discipline): per-entry inflate
 * cap [[MaxEntryBytes]], per-document budget [[MaxTotalBytes]], entry
 * count cap [[MaxEntries]], paragraph cap [[MaxParagraphs]] — every cap
 * surfaces as `truncated`, never silently. A non-ZIP blob, a ZIP without
 * `word/document.xml`, and a corrupt archive all return `status =
 * "not_docx"` (total: parse never throws).
 */
object Docx {

  val MaxEntryBytes: Int = 16 << 20
  val MaxTotalBytes: Long = 64L << 20
  val MaxEntries: Int = 4096
  val MaxParagraphs: Int = 20000

  final case class DocxResult(
      blocks: Vector[LayoutBlock],
      status: String, // ok | not_docx | empty
      truncated: Boolean,
      meta: Map[String, String],
      links: Vector[String])

  def isZip(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 4 &&
      bytes(0) == 'P' && bytes(1) == 'K' && bytes(2) == 3 && bytes(3) == 4

  def parseDetailed(bytes: Array[Byte]): DocxResult = {
    if (!isZip(bytes)) return DocxResult(Vector.empty, "not_docx", truncated = false, Map.empty, Vector.empty)
    var documentXml: String = null
    var coreXml: String = null
    var relsXml: String = null
    var truncated = false
    try {
      val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
      var entry = zin.getNextEntry
      var entries = 0
      var total = 0L
      val buf = new Array[Byte](8192)
      while (entry != null && entries < MaxEntries && total < MaxTotalBytes) {
        entries += 1
        val name = entry.getName
        val wanted = name == "word/document.xml" || name == "docProps/core.xml" ||
          name == "word/_rels/document.xml.rels"
        if (wanted) {
          val out = new java.io.ByteArrayOutputStream()
          var n = zin.read(buf)
          var over = false
          while (n >= 0 && !over) {
            if (out.size + n > MaxEntryBytes || total + out.size + n > MaxTotalBytes) {
              truncated = true; over = true
            } else {
              out.write(buf, 0, n)
              n = zin.read(buf)
            }
          }
          total += out.size
          val s = out.toString("UTF-8")
          name match {
            case "word/document.xml" => documentXml = s
            case "docProps/core.xml" => coreXml = s
            case _ => relsXml = s
          }
        }
        entry = zin.getNextEntry
      }
      if (entry != null) truncated = true // entry/budget cap hit mid-archive
    } catch {
      case _: Exception => // corrupt archive: fall through with what we have
        if (documentXml == null)
          return DocxResult(Vector.empty, "not_docx", truncated = false, Map.empty, Vector.empty)
        truncated = true
    }
    if (documentXml == null)
      return DocxResult(Vector.empty, "not_docx", truncated = false, Map.empty, Vector.empty)

    val rels: Map[String, String] =
      if (relsXml == null) Map.empty
      else XmlParser.find(XmlParser.parse(relsXml), "Relationship").flatMap { r =>
        for (id <- r.attr("Id"); t <- r.attr("Target")) yield id -> t
      }.toMap

    val meta: Map[String, String] =
      if (coreXml == null) Map.empty
      else {
        val root = XmlParser.parse(coreXml)
        def first(tag: String): Option[String] = {
          val t = XmlParser.findText(root, tag).trim
          if (t.isEmpty) None else Some(t)
        }
        Seq(
          "title" -> first("dc:title"), "author" -> first("dc:creator"),
          "subject" -> first("dc:subject"), "keywords" -> first("cp:keywords"),
          "created" -> first("dcterms:created"), "modified" -> first("dcterms:modified")
        ).collect { case (k, Some(v)) => k -> v }.toMap
      }

    val body = XmlParser.findFirst(XmlParser.parse(documentXml), "w:body")
    val blocks = Vector.newBuilder[LayoutBlock]
    val links = Vector.newBuilder[String]
    var nBlocks = 0

    def runText(el: Element, sb: java.lang.StringBuilder): Unit = {
      el.children.foreach {
        case t: TextNode => if (el.tag == "w:t") sb.append(t.data)
        case c: Element => c.tag match {
          case "w:tab" => sb.append('\t')
          case "w:br" | "w:cr" => sb.append('\n')
          case "w:hyperlink" =>
            c.attr("r:id").flatMap(rels.get).foreach(links += _)
            runText(c, sb)
          case _ => runText(c, sb)
        }
        case _ =>
      }
      // w:t leaves hold their text directly; non-leaf recursion above
      // already visited children, so nothing more to do here
    }

    def paraStyle(p: Element): String =
      XmlParser.findFirst(p, "w:pStyle").flatMap(_.attr("w:val")).getOrElse("")

    def emit(kind: String, text: String): Unit = {
      val t = text.trim
      if (t.nonEmpty && nBlocks < MaxParagraphs) {
        val i = nBlocks
        blocks += LayoutBlock(page = i / 40, kind = kind, text = t,
          x0 = 0f, y0 = (i % 40) * 18f, x1 = 612f, y1 = (i % 40) * 18f + 16f)
        nBlocks += 1
      } else if (t.nonEmpty) truncated = true
    }

    body.foreach(_.children.foreach {
      case el: Element if el.tag == "w:p" =>
        val sb = new java.lang.StringBuilder
        runText(el, sb)
        val style = paraStyle(el)
        val isHeading = style.startsWith("Heading") || style == "Title"
        emit(if (isHeading) "heading" else "text", sb.toString)
      case el: Element if el.tag == "w:tbl" =>
        val rows = XmlParser.find(el, "w:tr").map { tr =>
          XmlParser.find(tr, "w:tc").map { tc =>
            val sb = new java.lang.StringBuilder
            runText(tc, sb)
            sb.toString.trim.replace('\n', ' ')
          }.mkString(" | ")
        }
        emit("table", rows.mkString("\n"))
      case _ =>
    })

    val out = blocks.result()
    DocxResult(out, if (out.isEmpty) "empty" else "ok", truncated, meta,
      links.result().distinct)
  }
}
