package graft.dom

import scala.collection.mutable

/**
 * Streaming single-pass HTML tokenizer + simplified HTML5 tree builder.
 *
 * From-scratch implementation (no jsoup/tika on the classpath — verified in
 * SURVEY.md §7.6) scoped to the HTML5 subset the extraction corpus exercises,
 * matching what the reference relies on from cheerio/parse5
 * (`/root/reference/src/core/context.ts:33`):
 *
 *  - start/end tags, double/single/unquoted/valueless attributes,
 *    self-closing syntax, case-folded tag + attribute names
 *  - comments, doctype, CDATA and bogus `<?...>` sections (skipped)
 *  - raw-text elements (script/style/…, no entity decode) and RCDATA
 *    (title/textarea, entities decoded)
 *  - character references in text + attribute values ([[Entities]])
 *  - implied `<html><head><body>` skeleton; head-phase element routing
 *  - implied end tags: `p` closed by block starts, `li` by `li`,
 *    `dt`/`dd`, table rows/cells, `option`
 *  - void elements never pushed on the open stack
 *
 * The tokenizer walks the input exactly once (SAX-style events applied
 * straight to the arena of nodes); per-row cost is O(bytes). The builder is
 * used once per page row inside `mapPartitions` — instantiate nothing per
 * call beyond the node objects themselves.
 */
object HtmlParser {

  val voidElements: Set[String] = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr"
  )

  /** Raw text: content until matching end tag, no entity decoding. */
  private val rawTextTags: Set[String] = Set("script", "style", "xmp", "iframe", "noembed", "noframes")
  /** RCDATA: like raw text but entities decode. */
  private val rcdataTags: Set[String] = Set("title", "textarea")

  /** Start tags that close an open <p> (HTML5 "closes a p element in button scope"). */
  private val pClosers: Set[String] = Set(
    "address", "article", "aside", "blockquote", "details", "dialog", "dir",
    "div", "dl", "fieldset", "figcaption", "figure", "footer", "form",
    "h1", "h2", "h3", "h4", "h5", "h6", "header", "hgroup", "hr", "main",
    "menu", "nav", "ol", "p", "pre", "section", "summary", "table", "ul",
    "li", "dt", "dd"
  )

  /** Elements allowed in <head>; anything else flips us into body. */
  private val headTags: Set[String] =
    Set("base", "basefont", "bgsound", "link", "meta", "title", "noscript", "noframes", "style", "script", "template")

  def parse(htmlInput: String): DomDoc = {
    val html = if (htmlInput == null) "" else htmlInput
    val docHtml = new Element("html")
    val docHead = new Element("head")
    val docBody = new Element("body")
    docHtml.appendChild(docHead)
    docHtml.appendChild(docBody)

    // insertion state
    var inBody = false
    var sawExplicitHead = false
    val stack = mutable.ArrayBuffer[Element]() // open elements *below* head/body

    def current: Element =
      if (stack.nonEmpty) stack.last else if (inBody) docBody else docHead

    def switchToBody(): Unit = if (!inBody) { inBody = true; stack.clear() }

    def appendText(text: String): Unit = {
      if (text.isEmpty) return
      if (!inBody && stack.isEmpty && text.exists(c => !Character.isWhitespace(c)))
        switchToBody()
      val tgt = current
      tgt.children.lastOption match {
        case Some(t: TextNode) => t.data += text
        case _ => tgt.appendChild(new TextNode(text))
      }
    }

    def closePUpTo(): Unit = {
      val idx = stack.lastIndexWhere(_.tag == "p")
      if (idx >= 0) {
        // button-scope boundary check: stop if a table/td/th/button sits above the p
        val boundary = stack.indexWhere(e => Set("table", "td", "th", "button", "caption").contains(e.tag), idx + 1)
        if (boundary < 0) stack.dropRightInPlace(stack.length - idx)
      }
    }

    def closeImplied(tag: String): Unit = {
      tag match {
        case t if pClosers.contains(t) => closePUpTo()
        case _ =>
      }
      tag match {
        case "li" =>
          val idx = stack.lastIndexWhere(_.tag == "li")
          if (idx >= 0 && !stack.drop(idx + 1).exists(e => e.tag == "ul" || e.tag == "ol"))
            stack.dropRightInPlace(stack.length - idx)
        case "dt" | "dd" =>
          val idx = stack.lastIndexWhere(e => e.tag == "dt" || e.tag == "dd")
          if (idx >= 0 && !stack.drop(idx + 1).exists(_.tag == "dl"))
            stack.dropRightInPlace(stack.length - idx)
        case "td" | "th" =>
          val idx = stack.lastIndexWhere(e => e.tag == "td" || e.tag == "th")
          if (idx >= 0 && !stack.drop(idx + 1).exists(e => e.tag == "tr" || e.tag == "table"))
            stack.dropRightInPlace(stack.length - idx)
        case "tr" =>
          val idx = stack.lastIndexWhere(_.tag == "tr")
          if (idx >= 0 && !stack.drop(idx + 1).exists(_.tag == "table"))
            stack.dropRightInPlace(stack.length - idx)
        case "option" =>
          val idx = stack.lastIndexWhere(_.tag == "option")
          if (idx >= 0 && idx == stack.length - 1)
            stack.dropRightInPlace(1)
        case _ =>
      }
    }

    def startTag(tag: String, attrs: Seq[(String, String)], selfClosing: Boolean): Unit = {
      tag match {
        case "html" =>
          attrs.foreach { case (k, v) => docHtml.setAttr(k, v) }
          return
        case "head" =>
          sawExplicitHead = true
          attrs.foreach { case (k, v) => docHead.setAttr(k, v) }
          return
        case "body" =>
          attrs.foreach { case (k, v) => docBody.setAttr(k, v) }
          switchToBody()
          return
        case _ =>
      }
      if (!inBody && stack.isEmpty && !headTags.contains(tag)) switchToBody()
      closeImplied(tag)
      val el = new Element(tag)
      attrs.foreach { case (k, v) => el.setAttr(k, v) }
      current.appendChild(el)
      if (!voidElements.contains(tag) && !selfClosing) stack += el
      // foreign content self-closing (<svg/>) respected via selfClosing flag
    }

    def endTag(tag: String): Unit = tag match {
      case "html" => ()
      case "head" => ()
      case "body" => ()
      case t =>
        val idx = stack.lastIndexWhere(_.tag == t)
        if (idx >= 0) stack.dropRightInPlace(stack.length - idx)
    }

    // ---------------- tokenizer ----------------
    val n = html.length
    var i = 0
    val textBuf = new java.lang.StringBuilder

    def flushText(): Unit = {
      if (textBuf.length > 0) {
        appendText(Entities.decode(textBuf.toString))
        textBuf.setLength(0)
      }
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = html.charAt(i + 1)
        if (c1 == '!') {
          flushText()
          if (html.startsWith("<!--", i)) {
            val end = html.indexOf("-->", i + 4)
            val stop = if (end < 0) n else end
            val data = html.substring(i + 4, stop)
            current.appendChild(new CommentNode(data))
            i = if (end < 0) n else end + 3
          } else if (html.regionMatches(true, i, "<![CDATA[", 0, 9)) {
            val end = html.indexOf("]]>", i + 9)
            i = if (end < 0) n else end + 3
          } else { // doctype / bogus
            val end = html.indexOf('>', i + 2)
            i = if (end < 0) n else end + 1
          }
        } else if (c1 == '?') {
          flushText()
          val end = html.indexOf('>', i + 2)
          i = if (end < 0) n else end + 1
        } else if (c1 == '/') {
          if (i + 2 < n && Character.isLetter(html.charAt(i + 2))) {
            flushText()
            var j = i + 2
            while (j < n && html.charAt(j) != '>') j += 1
            val raw = html.substring(i + 2, math.min(j, n))
            val name = raw.takeWhile(ch => !Character.isWhitespace(ch)).toLowerCase
            endTag(name)
            i = if (j < n) j + 1 else n
          } else { textBuf.append(c); i += 1 }
        } else if (Character.isLetter(c1)) {
          flushText()
          val (tag, attrs, selfClosing, next) = parseStartTag(html, i)
          i = next
          if (rawTextTags.contains(tag) || rcdataTags.contains(tag)) {
            // consume raw content until matching end tag
            val endIdx = findEndTag(html, i, tag)
            val content = html.substring(i, endIdx)
            startTag(tag, attrs, selfClosing = false)
            if (content.nonEmpty) {
              val data = if (rcdataTags.contains(tag)) Entities.decode(content) else content
              current.appendChild(new TextNode(data))
            }
            endTag(tag)
            // skip past the end tag itself
            i = if (endIdx >= n) n else {
              val gt = html.indexOf('>', endIdx)
              if (gt < 0) n else gt + 1
            }
          } else {
            startTag(tag, attrs, selfClosing)
          }
        } else { textBuf.append(c); i += 1 }
      } else {
        textBuf.append(c)
        i += 1
      }
    }
    flushText()

    new DomDoc(docHtml, docHead, docBody)
  }

  /** Parse a start tag at s(start)=='<'; returns (tag, attrs, selfClosing, nextIndex). */
  private def parseStartTag(s: String, start: Int): (String, Vector[(String, String)], Boolean, Int) = {
    val n = s.length
    var i = start + 1
    val nameStart = i
    while (i < n && (Character.isLetterOrDigit(s.charAt(i)) || s.charAt(i) == '-' || s.charAt(i) == ':')) i += 1
    val tag = s.substring(nameStart, i).toLowerCase
    val attrs = Vector.newBuilder[(String, String)]
    var selfClosing = false
    var done = false
    while (!done && i < n) {
      // skip whitespace and stray slashes (not before '>')
      while (i < n && (Character.isWhitespace(s.charAt(i)))) i += 1
      if (i >= n) { done = true }
      else s.charAt(i) match {
        case '>' => i += 1; done = true
        case '/' =>
          if (i + 1 < n && s.charAt(i + 1) == '>') { selfClosing = true; i += 2; done = true }
          else i += 1
        case _ =>
          // attribute name
          val as = i
          while (i < n && !Character.isWhitespace(s.charAt(i)) && s.charAt(i) != '=' && s.charAt(i) != '>' && s.charAt(i) != '/') i += 1
          val name = s.substring(as, i).toLowerCase
          while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
          var value = ""
          if (i < n && s.charAt(i) == '=') {
            i += 1
            while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
            if (i < n && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
              val q = s.charAt(i); i += 1
              val vs = i
              while (i < n && s.charAt(i) != q) i += 1
              value = Entities.decode(s.substring(vs, i), inAttribute = true)
              if (i < n) i += 1
            } else {
              val vs = i
              while (i < n && !Character.isWhitespace(s.charAt(i)) && s.charAt(i) != '>') i += 1
              value = Entities.decode(s.substring(vs, i), inAttribute = true)
            }
          }
          if (name.nonEmpty) attrs += (name -> value)
      }
    }
    (tag, attrs.result(), selfClosing, i)
  }

  /** Index of `</tag` (case-insensitive) at or after `from`; input length if absent. */
  private def findEndTag(s: String, from: Int, tag: String): Int = {
    val needle = "</" + tag
    var i = from
    val n = s.length
    while (i < n) {
      val idx = indexOfIgnoreCase(s, needle, i)
      if (idx < 0) return n
      val after = idx + needle.length
      if (after >= n) return idx
      val ch = s.charAt(after)
      if (ch == '>' || Character.isWhitespace(ch) || ch == '/') return idx
      i = idx + 1
    }
    n
  }

  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    val n = s.length
    val m = needle.length
    var i = from
    while (i + m <= n) {
      if (s.regionMatches(true, i, needle, 0, m)) return i
      i += 1
    }
    -1
  }
}
