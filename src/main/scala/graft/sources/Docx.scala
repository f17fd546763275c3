package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import graft.dom.{Element, TextNode}
import graft.feed.XmlParser

/**
 * From-scratch OOXML office-document extractor — the office leg of the
 * content-type routing, beside HTML and PDF. No Office libraries exist in
 * the sandbox (no POI/tika in `/opt/spark/jars`); .docx/.pptx/.xlsx are
 * ZIPs of XML parts, so the JDK `ZipInputStream` plus the existing
 * [[graft.feed.XmlParser]] cover all three flavors. Flavor is detected by
 * which main part the archive carries:
 *
 *  - **docx** (`word/document.xml`): `w:p` → one text/heading block; run
 *    text from descendant `w:t` (space-preserving), `w:tab` → TAB,
 *    `w:br`/`w:cr` → newline; `w:pPr/w:pStyle@w:val` of `Heading*`/`Title`
 *    marks a heading; `w:hyperlink@r:id` resolves through
 *    `word/_rels/document.xml.rels` into the links list (the M4
 *    analogue); `w:tbl` → ONE table block, rows joined with newlines and
 *    cells with " | ".
 *  - **pptx** (`ppt/presentation.xml`): slides in `ppt/slides/slideN.xml`
 *    numeric order; each `a:p` with any `a:t` text becomes a block, a
 *    heading when its enclosing shape's placeholder is
 *    `p:ph@type=title|ctrTitle`; block `page` = slide index.
 *  - **xlsx** (`xl/workbook.xml`): `xl/sharedStrings.xml` indexed by
 *    `xl/worksheets/sheetN.xml` cells (`t="s"` shared refs, inline
 *    `<is>`, literal `<v>` otherwise); one table block per sheet, rows
 *    joined with newlines, cells with " | "; block `page` = sheet index.
 *
 * `docProps/core.xml` (Dublin-Core metadata) maps onto the same meta keys
 * the PDF /Info route emits, for every flavor.
 *
 * Bomb containment (the PDF route's budget discipline): per-entry inflate
 * cap [[MaxEntryBytes]], per-document budget [[MaxTotalBytes]], entry
 * count cap [[MaxEntries]], block cap [[MaxParagraphs]], per-flavor part
 * caps ([[MaxSlides]] / [[MaxSheets]]) — every cap surfaces as
 * `truncated`, never silently. A non-ZIP blob, a ZIP with none of the
 * three main parts, and a corrupt archive all return `status =
 * "not_docx"` (total: parse never throws).
 */
object Docx {

  val MaxEntryBytes: Int = 16 << 20
  val MaxTotalBytes: Long = 64L << 20
  val MaxEntries: Int = 4096
  val MaxParagraphs: Int = 20000
  val MaxSlides: Int = 1000
  val MaxSheets: Int = 256

  final case class DocxResult(
      blocks: Vector[LayoutBlock],
      status: String, // ok | not_docx | empty
      truncated: Boolean,
      meta: Map[String, String],
      links: Vector[String],
      flavor: String) // docx | pptx | xlsx | "" when not_docx

  def isZip(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 4 &&
      bytes(0) == 'P' && bytes(1) == 'K' && bytes(2) == 3 && bytes(3) == 4

  private def notOffice =
    DocxResult(Vector.empty, "not_docx", truncated = false, Map.empty, Vector.empty, "")

  private val SlideRe = "ppt/slides/slide([0-9]+)\\.xml".r
  private val SheetRe = "xl/worksheets/sheet([0-9]+)\\.xml".r

  def parseDetailed(bytes: Array[Byte]): DocxResult = {
    if (!isZip(bytes)) return notOffice
    val parts = scala.collection.mutable.Map.empty[String, String]
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
          name == "word/_rels/document.xml.rels" ||
          name == "ppt/presentation.xml" || name == "xl/workbook.xml" ||
          name == "xl/sharedStrings.xml" ||
          SlideRe.pattern.matcher(name).matches() ||
          SheetRe.pattern.matcher(name).matches()
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
          parts(name) = out.toString("UTF-8")
        }
        entry = zin.getNextEntry
      }
      if (entry != null) truncated = true // entry/budget cap hit mid-archive
    } catch {
      case _: Exception => // corrupt archive: fall through with what we have
        if (parts.isEmpty) return notOffice
        truncated = true
    }

    val meta: Map[String, String] = parts.get("docProps/core.xml") match {
      case None => Map.empty
      case Some(coreXml) =>
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

    if (parts.contains("word/document.xml"))
      parseWord(parts, meta, truncated)
    else if (parts.contains("ppt/presentation.xml"))
      parseSlides(parts, meta, truncated)
    else if (parts.contains("xl/workbook.xml"))
      parseSheets(parts, meta, truncated)
    else notOffice
  }

  /** Block collector with the shared caps + synthetic geometry. */
  private final class Blocks(var truncated: Boolean) {
    private val b = Vector.newBuilder[LayoutBlock]
    private var n = 0
    def emit(kind: String, text: String, page: Int = -1): Unit = {
      val t = text.trim
      if (t.isEmpty) return
      if (n < MaxParagraphs) {
        val i = n
        b += LayoutBlock(page = if (page >= 0) page else i / 40, kind = kind,
          text = t, x0 = 0f, y0 = (i % 40) * 18f, x1 = 612f, y1 = (i % 40) * 18f + 16f)
        n += 1
      } else truncated = true
    }
    def result(): Vector[LayoutBlock] = b.result()
  }

  private def parseWord(parts: collection.Map[String, String],
                        meta: Map[String, String], trunc0: Boolean): DocxResult = {
    val rels: Map[String, String] = parts.get("word/_rels/document.xml.rels") match {
      case None => Map.empty
      case Some(relsXml) =>
        XmlParser.find(XmlParser.parse(relsXml), "Relationship").flatMap { r =>
          for (id <- r.attr("Id"); t <- r.attr("Target")) yield id -> t
        }.toMap
    }
    val body = XmlParser.findFirst(XmlParser.parse(parts("word/document.xml")), "w:body")
    val blocks = new Blocks(trunc0)
    val links = Vector.newBuilder[String]

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
    }

    def paraStyle(p: Element): String =
      XmlParser.findFirst(p, "w:pStyle").flatMap(_.attr("w:val")).getOrElse("")

    body.foreach(_.children.foreach {
      case el: Element if el.tag == "w:p" =>
        val sb = new java.lang.StringBuilder
        runText(el, sb)
        val style = paraStyle(el)
        val isHeading = style.startsWith("Heading") || style == "Title"
        blocks.emit(if (isHeading) "heading" else "text", sb.toString)
      case el: Element if el.tag == "w:tbl" =>
        val rows = XmlParser.find(el, "w:tr").map { tr =>
          XmlParser.find(tr, "w:tc").map { tc =>
            val sb = new java.lang.StringBuilder
            runText(tc, sb)
            sb.toString.trim.replace('\n', ' ')
          }.mkString(" | ")
        }
        blocks.emit("table", rows.mkString("\n"))
      case _ =>
    })
    finish(blocks, meta, links.result().distinct, "docx")
  }

  private def parseSlides(parts: collection.Map[String, String],
                          meta: Map[String, String], trunc0: Boolean): DocxResult = {
    val blocks = new Blocks(trunc0)
    val slideNames = parts.keys.collect {
      case n @ SlideRe(num) => (num.toInt, n)
    }.toSeq.sortBy(_._1)
    if (slideNames.size > MaxSlides) blocks.truncated = true
    slideNames.take(MaxSlides).zipWithIndex.foreach { case ((_, name), page) =>
      val root = XmlParser.parse(parts(name))
      // shapes carry the placeholder kind; paragraphs carry the text
      XmlParser.find(root, "p:sp").foreach { sp =>
        val phType = XmlParser.findFirst(sp, "p:ph").flatMap(_.attr("type")).getOrElse("")
        val isTitle = phType == "title" || phType == "ctrTitle"
        XmlParser.find(sp, "a:p").foreach { p =>
          val text = XmlParser.find(p, "a:t").map(tText).mkString
          blocks.emit(if (isTitle) "heading" else "text", text, page)
        }
      }
    }
    finish(blocks, meta, Vector.empty, "pptx")
  }

  private def parseSheets(parts: collection.Map[String, String],
                          meta: Map[String, String], trunc0: Boolean): DocxResult = {
    val blocks = new Blocks(trunc0)
    val shared: Vector[String] = parts.get("xl/sharedStrings.xml") match {
      case None => Vector.empty
      case Some(s) =>
        XmlParser.find(XmlParser.parse(s), "si").map(si =>
          XmlParser.find(si, "t").map(tText).mkString)
    }
    val sheetNames = parts.keys.collect {
      case n @ SheetRe(num) => (num.toInt, n)
    }.toSeq.sortBy(_._1)
    if (sheetNames.size > MaxSheets) blocks.truncated = true
    sheetNames.take(MaxSheets).zipWithIndex.foreach { case ((_, name), page) =>
      val root = XmlParser.parse(parts(name))
      val rows = XmlParser.find(root, "row").map { row =>
        XmlParser.find(row, "c").map { c =>
          val v = XmlParser.findFirst(c, "v").map(elText).getOrElse("")
          c.attr("t") match {
            case Some("s") => // shared-string index
              val i = try v.trim.toInt catch { case _: NumberFormatException => -1 }
              if (i >= 0 && i < shared.length) shared(i) else ""
            case Some("inlineStr") =>
              XmlParser.findFirst(c, "is").map(is =>
                XmlParser.find(is, "t").map(tText).mkString).getOrElse("")
            case _ => v
          }
        }.mkString(" | ")
      }
      blocks.emit("table", rows.mkString("\n"), page)
    }
    finish(blocks, meta, Vector.empty, "xlsx")
  }

  private def tText(t: Element): String =
    t.children.collect { case tn: TextNode => tn.data }.mkString

  private def elText(e: Element): String = tText(e)

  private def finish(blocks: Blocks, meta: Map[String, String],
                     links: Vector[String], flavor: String): DocxResult = {
    val out = blocks.result()
    DocxResult(out, if (out.isEmpty) "empty" else "ok", blocks.truncated,
      meta, links, flavor)
  }
}
