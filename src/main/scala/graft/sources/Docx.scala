package graft.sources

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
  val MaxChapters: Int = 500

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

  /** Central-directory entry: name + where its compressed data lives. */
  private final case class CdEntry(name: String, method: Int,
      compressedSize: Long, localHeaderOffset: Long)

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    (u16(b, i) | (u16(b, i + 2).toLong << 16)) & 0xffffffffL

  /** Walk the central directory (at the END of the archive — no entry data
    * is touched, let alone inflated; EOCD count is u16, so ≤65535 entries —
    * no ZIP64, documented). Returns None for a blob without a parseable
    * EOCD/CD, i.e. not a usable ZIP; the Boolean is true when the walk was
    * CUT by [[MaxEntries]] (caps must surface, never silently). */
  private def centralDirectory(bytes: Array[Byte]): Option[(Vector[CdEntry], Boolean)] = {
    // EOCD: scan backward for PK\x05\x06 within the max comment span
    val lo = math.max(0, bytes.length - 22 - 65535)
    var eocd = -1
    var i = bytes.length - 22
    while (i >= lo && eocd < 0) {
      if (bytes(i) == 'P' && bytes(i + 1) == 'K' && bytes(i + 2) == 5 && bytes(i + 3) == 6)
        eocd = i
      i -= 1
    }
    if (eocd < 0) return None
    val count = u16(bytes, eocd + 10)
    val cdOff = u32(bytes, eocd + 16)
    if (cdOff >= bytes.length) return None
    val out = Vector.newBuilder[CdEntry]
    var p = cdOff.toInt
    var k = 0
    while (k < count && k < MaxEntries && p + 46 <= bytes.length) {
      if (!(bytes(p) == 'P' && bytes(p + 1) == 'K' && bytes(p + 2) == 1 && bytes(p + 3) == 2))
        return Some((out.result(), true)) // salvage what parsed so far
      val method = u16(bytes, p + 10)
      val csize = u32(bytes, p + 20)
      val nameLen = u16(bytes, p + 28)
      val extraLen = u16(bytes, p + 30)
      val commentLen = u16(bytes, p + 32)
      val lho = u32(bytes, p + 42)
      if (p + 46 + nameLen > bytes.length) return Some((out.result(), true))
      val name = new String(bytes, p + 46, nameLen, "UTF-8")
      out += CdEntry(name, method, csize, lho)
      p += 46 + nameLen + extraLen + commentLen
      k += 1
    }
    Some((out.result(), k < count))
  }

  /** Inflate ONE entry's data slice with the per-entry/total output caps —
    * only wanted parts ever reach this, so the archive's unwanted bulk
    * (media, bloated junk entries) costs zero inflate work. */
  private def readEntry(bytes: Array[Byte], e: CdEntry, budgetLeft: Long): (String, Boolean) = {
    val p = e.localHeaderOffset.toInt
    if (p < 0 || p + 30 > bytes.length ||
        !(bytes(p) == 'P' && bytes(p + 1) == 'K' && bytes(p + 2) == 3 && bytes(p + 3) == 4))
      return ("", true)
    val nameLen = u16(bytes, p + 26)
    val extraLen = u16(bytes, p + 28)
    val dataOff = p + 30 + nameLen + extraLen
    val csize = math.min(e.compressedSize, math.max(0L, bytes.length - dataOff)).toInt
    if (dataOff >= bytes.length || csize <= 0) return ("", true)
    val cap = math.min(MaxEntryBytes.toLong, budgetLeft).toInt
    if (e.method == 0) { // STORED
      val n = math.min(csize, cap)
      (new String(bytes, dataOff, n, "UTF-8"), n < csize)
    } else { // DEFLATED
      val inf = new java.util.zip.Inflater(true)
      try {
        inf.setInput(bytes, dataOff, csize)
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var truncated = false
        var done = false
        while (!done && !truncated) {
          val n = inf.inflate(buf)
          if (n > 0) {
            if (out.size + n > cap) truncated = true
            else out.write(buf, 0, n)
          } else done = inf.finished() || inf.needsDictionary() || inf.needsInput()
        }
        (out.toString("UTF-8"), truncated)
      } catch {
        case _: Exception => ("", true)
      } finally inf.end()
    }
  }

  def parseDetailed(bytes: Array[Byte]): DocxResult = {
    if (!isZip(bytes)) return notOffice
    val (cd, cdCut) = centralDirectory(bytes) match {
      case None => return notOffice
      case Some(x) => x
    }
    def wanted(name: String): Boolean =
      name == "word/document.xml" || name == "docProps/core.xml" ||
        name == "word/_rels/document.xml.rels" ||
        name == "ppt/presentation.xml" || name == "xl/workbook.xml" ||
        name == "xl/sharedStrings.xml" ||
        SlideRe.pattern.matcher(name).matches() ||
        SheetRe.pattern.matcher(name).matches()
    val cdIndex: Map[String, CdEntry] = cd.iterator.map(e => e.name -> e).toMap
    val parts = scala.collection.mutable.Map.empty[String, String]
    var truncated = cdCut
    var total = 0L
    // budget-tracked on-demand read from the CD index — the EPUB flavor
    // discovers its chapter names only after reading the OPF, so reads
    // must be dynamic, not a static wanted-set
    def readPart(name: String): Option[String] = parts.get(name).orElse {
      cdIndex.get(name).flatMap { e =>
        if (total >= MaxTotalBytes) { truncated = true; None }
        else {
          val (s, trunc) = readEntry(bytes, e, MaxTotalBytes - total)
          total += s.length
          if (trunc) truncated = true
          if (s.nonEmpty) { parts(e.name) = s; Some(s) } else None
        }
      }
    }
    cd.iterator.filter(e => wanted(e.name)).foreach(e => readPart(e.name))

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
    else if (cdIndex.contains("META-INF/container.xml"))
      parseEpub(readPart, () => truncated)
    else if (truncated)
      // a cap cut the walk/reads before any main part appeared: surface
      // the truncation instead of a clean-looking "not an office file"
      notOffice.copy(truncated = true)
    else notOffice
  }

  /** EPUB flavor (round 6): an EPUB is a ZIP with `META-INF/container.xml`
    * naming an OPF package file, whose manifest/spine order the XHTML
    * chapters. Chapters run through the repo's OWN HTML machinery
    * ([[graft.dom.HtmlParser]] + [[graft.content.BlockParser]]) — the
    * book route reuses the page route's block semantics, so headings and
    * paragraphs normalize identically to web pages. OPF Dublin-Core maps
    * onto the shared meta keys. Chapter count capped at [[MaxChapters]]
    * (surfaced as truncated). */
  private def parseEpub(readPart: String => Option[String],
                        truncatedNow: () => Boolean): DocxResult = {
    val blocks = new Blocks(truncatedNow())
    val containerXml = readPart("META-INF/container.xml").getOrElse("")
    val opfPath = XmlParser.find(XmlParser.parse(containerXml), "rootfile")
      .flatMap(_.attr("full-path")).headOption.getOrElse("")
    val opfDir = opfPath.lastIndexOf('/') match {
      case -1 => ""
      case i => opfPath.substring(0, i + 1)
    }
    val opf = readPart(opfPath).getOrElse("")
    if (opf.isEmpty) return notOffice.copy(truncated = truncatedNow())
    val opfRoot = XmlParser.parse(opf)
    def dc(tag: String): Option[String] = {
      val t = XmlParser.findText(opfRoot, tag).trim
      if (t.isEmpty) None else Some(t)
    }
    val meta = Seq(
      "title" -> dc("dc:title"), "author" -> dc("dc:creator"),
      "subject" -> dc("dc:subject"), "created" -> dc("dc:date")
    ).collect { case (k, Some(v)) => k -> v }.toMap
    val manifest: Map[String, (String, String)] =
      XmlParser.find(opfRoot, "item").flatMap { it =>
        for (id <- it.attr("id"); href <- it.attr("href"))
          yield id -> ((href, it.attr("media-type").getOrElse("")))
      }.toMap
    val spine = XmlParser.find(opfRoot, "itemref").flatMap(_.attr("idref"))
    val chapters = spine.flatMap(manifest.get)
      .filter { case (_, mt) => mt.contains("html") || mt.isEmpty }
      .map(_._1)
    if (chapters.size > MaxChapters) blocks.truncated = true
    chapters.take(MaxChapters).zipWithIndex.foreach { case (href, page) =>
      readPart(opfDir + href).foreach { xhtml =>
        val doc = try graft.dom.HtmlParser.parse(xhtml) catch {
          case _: Exception => blocks.truncated = true; null
        }
        if (doc != null)
          graft.content.BlockParser.parseBlocks(doc).foreach { cb =>
            blocks.emit(
              if (cb.blockType == "heading") "heading" else "text",
              cb.text, page)
          }
      }
    }
    finish(blocks, meta, Vector.empty, "epub")
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
        // DIRECT children only: XmlParser.find is a descendant search, so a
        // table nested inside a cell would re-surface as extra rows/cells —
        // nested-table text is included exactly once, inside its outer cell
        // (runText recurses through it)
        val rows = directChildren(el, "w:tr").map { tr =>
          directChildren(tr, "w:tc").map { tc =>
            // block-level children (paragraphs, nested tables) joined with
            // a space — bare recursion would weld their words together
            tc.children.collect { case c: Element =>
              val sb = new java.lang.StringBuilder
              runText(c, sb)
              sb.toString.trim
            }.filter(_.nonEmpty).mkString(" ").replace('\n', ' ')
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
          // ordered walk so a:br line breaks separate runs (bare a:t
          // concatenation would merge words across breaks)
          val sb = new java.lang.StringBuilder
          def walk(e: Element): Unit = e.children.foreach {
            case c: Element if c.tag == "a:br" => sb.append('\n')
            case c: Element if c.tag == "a:t" => sb.append(tText(c))
            case c: Element => walk(c)
            case _ =>
          }
          walk(p)
          blocks.emit(if (isTitle) "heading" else "text", sb.toString, page)
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

  private def directChildren(e: Element, tag: String): Vector[Element] =
    e.children.collect { case c: Element if c.tag == tag => c }.toVector

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
