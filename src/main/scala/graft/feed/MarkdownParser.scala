package graft.feed

import graft.util.Js

final case class MarkdownLink(url: String, text: String, title: Option[String], context: Option[String])
final case class MarkdownSection(level: Int, title: String, content: String, links: Seq[MarkdownLink])
final case class CodeBlock(language: Option[String], code: String, meta: Option[String])
final case class ParsedMarkdown(
    title: Option[String], description: Option[String],
    sections: Seq[MarkdownSection], links: Seq[MarkdownLink],
    codeBlocks: Seq[CodeBlock], frontmatter: Map[String, String])

/**
 * K1–K3 — CommonMark-subset markdown parser re-expressing
 * `/root/reference/src/parsers/markdown.ts`: sections by ATX heading,
 * inline links with section context, fenced code blocks (lang + meta),
 * naive `---` frontmatter with bool/number/quote coercion (values stored as
 * strings here — `MapType(String,String)` per SURVEY.md §1.1).
 */
object MarkdownParser {

  def canParse(content: String): Boolean =
    content.contains("# ") || content.contains("## ") ||
    content.contains("- [") || content.contains("* [") || content.contains("```")

  private val atxRe = "^(#{1,6})\\s+(.*?)\\s*#*\\s*$".r
  private val fenceRe = "^(```+|~~~+)\\s*(.*)$".r
  private val listItemRe = "^\\s*(?:[-*+]|\\d+[.)])\\s+(.*)$".r
  // inline link, not image: negative lookbehind for '!'
  private val linkRe = java.util.regex.Pattern.compile(
    "(?<!!)\\[([^\\]]*)\\]\\(\\s*(<[^>]*>|[^)\\s]*)(?:\\s+\"([^\"]*)\"|\\s+'([^']*)')?\\s*\\)")

  /** Strip inline formatting the way `mdast-util-to-string` does: text content
    * only (links keep their text, emphasis/code markers dropped). */
  private def toPlainText(s: String): String = {
    var r = linkRe.matcher(s).replaceAll("$1")
    r = r.replaceAll("!\\[([^\\]]*)\\]\\([^)]*\\)", "$1")
    r = r.replaceAll("\\*\\*([^*]+)\\*\\*", "$1")
    r = r.replaceAll("__([^_]+)__", "$1")
    r = r.replaceAll("\\*([^*]+)\\*", "$1")
    r = r.replaceAll("(?<![\\w])_([^_]+)_(?![\\w])", "$1")
    r = r.replaceAll("`([^`]+)`", "$1")
    r
  }

  private def extractLinks(line: String, context: Option[String]): Vector[MarkdownLink] = {
    val out = Vector.newBuilder[MarkdownLink]
    val m = linkRe.matcher(line)
    while (m.find()) {
      var url = m.group(2)
      if (url.startsWith("<") && url.endsWith(">")) url = url.substring(1, url.length - 1)
      val title = Option(m.group(3)).orElse(Option(m.group(4)))
      out += MarkdownLink(url, toPlainText(m.group(1)), title, context)
    }
    out.result()
  }

  def parse(content: String): ParsedMarkdown = {
    // frontmatter (markdown.ts:47-54)
    var frontmatter = Map.empty[String, String]
    var body = content
    if (content.startsWith("---")) {
      val endIndex = content.indexOf("---", 3)
      if (endIndex != -1) {
        frontmatter = parseFrontmatter(content.substring(3, endIndex).trim)
        body = content.substring(endIndex + 3)
      }
    }

    val sections = Vector.newBuilder[MarkdownSection]
    val allLinks = Vector.newBuilder[MarkdownLink]
    val codeBlocks = Vector.newBuilder[CodeBlock]
    var curLevel = 0
    var curTitle = ""
    var curContent = new StringBuilder
    var curLinks = Vector.newBuilder[MarkdownLink]
    var inSection = false
    var description: Option[String] = None
    var sawHeading = false

    def finalizeSection(): Unit = if (inSection) {
      sections += MarkdownSection(curLevel, curTitle, curContent.toString, curLinks.result())
      curContent = new StringBuilder
      curLinks = Vector.newBuilder[MarkdownLink]
      inSection = false
    }

    val lines = body.split("\n", -1)
    var i = 0
    var inFence = false
    var fenceMarker = ""
    var fenceLang: Option[String] = None
    var fenceMeta: Option[String] = None
    val fenceBuf = new StringBuilder
    val paraBuf = new StringBuilder

    def flushParagraph(): Unit = {
      val text = Js.trim(paraBuf.toString)
      paraBuf.setLength(0)
      if (text.nonEmpty) {
        val plain = toPlainText(text)
        if (inSection) {
          if (curContent.nonEmpty) curContent.append("\n\n")
          curContent.append(plain)
        } else if (!sawHeading && description.isEmpty) {
          description = Some(plain)
        }
      }
    }

    while (i < lines.length) {
      val line = lines(i)
      if (inFence) {
        if (line.trim.startsWith(fenceMarker)) {
          codeBlocks += CodeBlock(fenceLang, fenceBuf.toString.stripSuffix("\n"), fenceMeta)
          fenceBuf.setLength(0)
          inFence = false
        } else {
          fenceBuf.append(line).append('\n')
        }
      } else line match {
        case fenceRe(marker, info) =>
          flushParagraph()
          inFence = true
          fenceMarker = marker.take(3)
          val parts = info.trim.split("\\s+", 2)
          fenceLang = parts.headOption.filter(_.nonEmpty)
          fenceMeta = if (parts.length > 1) Some(parts(1)) else None
        case atxRe(hashes, titleRaw) =>
          flushParagraph()
          finalizeSection()
          sawHeading = true
          curLevel = hashes.length
          curTitle = toPlainText(titleRaw)
          inSection = true
          val links = extractLinks(titleRaw, Some(curTitle))
          allLinks ++= links
          curLinks ++= links
        case l if Js.trim(l).isEmpty =>
          flushParagraph()
        case listItemRe(itemText) =>
          flushParagraph()
          val links = extractLinks(itemText, if (inSection) Some(curTitle) else None)
          allLinks ++= links
          if (inSection) curLinks ++= links
          // mdast wraps each listItem's text in a paragraph node, and the
          // section-content visitor appends EVERY paragraph — including
          // those inside list items (markdown.ts:59-109), so list-only
          // sections carry their items' text as content
          paraBuf.append(itemText)
          flushParagraph()
        case l =>
          val links = extractLinks(l, if (inSection) Some(curTitle) else None)
          allLinks ++= links
          if (inSection) curLinks ++= links
          if (paraBuf.nonEmpty) paraBuf.append('\n')
          paraBuf.append(l)
      }
      i += 1
    }
    flushParagraph()
    if (inFence) codeBlocks += CodeBlock(fenceLang, fenceBuf.toString.stripSuffix("\n"), fenceMeta)
    finalizeSection()

    val secs = sections.result()
    val title = frontmatter.get("title").orElse(secs.find(_.level == 1).map(_.title))
    val desc = frontmatter.get("description").orElse(description)

    ParsedMarkdown(title, desc, secs, allLinks.result(), codeBlocks.result(), frontmatter)
  }

  /** markdown.ts:136-158 — naive `key: value` with bool/number/quote coercion
    * (stringified for the MapType column). */
  def parseFrontmatter(content: String): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    content.split("\n").foreach { line =>
      val colonIndex = line.indexOf(':')
      if (colonIndex > 0) {
        val key = line.substring(0, colonIndex).trim
        var value = line.substring(colonIndex + 1).trim
        if (value.startsWith("\"") && value.endsWith("\"") && value.length >= 2)
          value = value.substring(1, value.length - 1)
        else if (value.startsWith("'") && value.endsWith("'") && value.length >= 2)
          value = value.substring(1, value.length - 1)
        else if (value.matches("^-?\\d+(\\.\\d+)?$"))
          value = { val d = value.toDouble; if (d == d.toLong.toDouble && !value.contains('.')) d.toLong.toString else d.toString }
        out += (key -> value)
      }
    }
    out.result()
  }

  /** K3 — links inside list items with current-heading context (github.ts-style lists). */
  def extractListLinks(markdown: String): Vector[MarkdownLink] = {
    val out = Vector.newBuilder[MarkdownLink]
    var currentHeading = ""
    var inFence = false
    markdown.split("\n", -1).foreach { line =>
      line match {
        case fenceRe(_, _) => inFence = !inFence
        case _ if inFence =>
        case atxRe(_, titleRaw) => currentHeading = toPlainText(titleRaw)
        case listItemRe(itemText) =>
          out ++= extractLinks(itemText, Some(currentHeading).filter(_.nonEmpty))
        case _ =>
      }
    }
    out.result()
  }

  /** K3 — sections at or below a heading level. */
  def parseByHeadings(markdown: String, minLevel: Int = 2): Seq[MarkdownSection] =
    parse(markdown).sections.filter(_.level >= minLevel)

  /** K3 — group links into a Map by context ('Uncategorized' default) — a
    * per-document map, NOT a Spark groupBy. */
  def groupByCategory(links: Seq[MarkdownLink]): Map[String, Seq[MarkdownLink]] =
    links.groupBy(_.context.getOrElse("Uncategorized"))
}

/** K14 — GitHub URL utilities (`src/parsers/github.ts:10-33`). */
object GitHubOps {
  private val repoRe = java.util.regex.Pattern.compile("^https?://(www\\.)?github\\.com/[^/]+/[^/]+/?$")
  private val parseRe = java.util.regex.Pattern.compile("github\\.com/([^/]+)/([^/]+)")

  def isGitHubRepo(url: String): Boolean = repoRe.matcher(url).matches()

  def parseGitHubUrl(url: String): Option[(String, String)] = {
    val m = parseRe.matcher(url)
    if (m.find() && m.group(1).nonEmpty && m.group(2).nonEmpty)
      Some((m.group(1), m.group(2).replaceAll("\\.git$", "")))
    else None
  }

  def toRawUrl(url: String, branch: String = "main", file: String = "README.md"): String =
    parseGitHubUrl(url) match {
      case Some((owner, repo)) => s"https://raw.githubusercontent.com/$owner/$repo/$branch/$file"
      case None => url
    }
}
