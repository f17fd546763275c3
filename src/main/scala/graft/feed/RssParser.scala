package graft.feed

import java.time.format.DateTimeFormatter
import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}
import graft.dom.Element
import graft.urlx.WUrl
import graft.util.Js

final case class FeedEnclosure(url: String, enclosureType: Option[String], length: Option[Int])
final case class FeedImage(url: String, title: Option[String], link: Option[String])
final case class FeedItem(
    id: String, title: String, link: String,
    description: Option[String], content: Option[String], author: Option[String],
    publishedAt: Option[String], rawPublishedAt: Option[String], updatedAt: Option[String],
    categories: Seq[String], enclosure: Option[FeedEnclosure],
    customFields: Map[String, String])
final case class FeedMetaInfo(
    generator: Option[String], ttl: Option[Int], image: Option[FeedImage], categories: Seq[String])
final case class ParsedFeed(
    format: String, title: String, description: Option[String], link: String,
    next: Option[String], language: Option[String], lastBuildDate: Option[String],
    copyright: Option[String], items: Seq[FeedItem], customFields: Map[String, String])
final case class FeedParserResult(data: ParsedFeed, meta: FeedMetaInfo)

/**
 * K4–K10 — RSS 2.0 / RSS 1.0 (RDF) / Atom 1.0 parser, re-expressing
 * `/root/reference/src/parsers/rss.ts`. Pure per-row function over an XML
 * string column → `ParsedFeed` struct (items as an ordered array column;
 * `explode(items)` is the natural one-to-many downstream).
 *
 * Security semantics preserved: XML mode (no HTML entity table), HTTPS-only
 * link resolution (everything else → ""), dates emitted only as ISO-8601 or
 * absent (never raw).
 */
final class RssParser(customFields: Map[String, String] = Map.empty) {

  def canParse(content: String): Boolean = {
    val lower = content.toLowerCase(java.util.Locale.ROOT)
    lower.contains("<rss") || lower.contains("<feed") || lower.contains("<rdf:rdf")
  }

  def parse(content: String, url: Option[String] = None): FeedParserResult = {
    val root = XmlParser.parse(content)
    if (XmlParser.findFirst(root, "feed").isDefined) parseAtom(root, url)
    else if (XmlParser.findFirst(root, "rdf:RDF").orElse(XmlParser.findFirst(root, "RDF")).isDefined)
      parseRss1(root, url)
    else parseRss2(root, url)
  }

  // ---- RSS 2.0 (rss.ts:67-131) ----
  private def parseRss2(root: Element, baseUrl: Option[String]): FeedParserResult = {
    val channel = XmlParser.findFirst(root, "channel").getOrElse(root)
    val feedLink = XmlParser.childText(channel, "link")
    val resolveBase = baseUrl.filter(_.nonEmpty).getOrElse(feedLink)

    val items = XmlParser.find(root, "item").map { item =>
      val itemLink = XmlParser.findText(item, "link")
      val guid = XmlParser.findText(item, "guid")
      val pubDate = XmlParser.findText(item, "pubDate")
      FeedItem(
        id = if (guid.nonEmpty) guid else itemLink,
        title = XmlParser.findText(item, "title"),
        link = resolveLink(itemLink, guid, resolveBase),
        description = parseText(item, "description"),
        content = parseContentEncoded(item),
        author = nonEmpty(XmlParser.findText(item, "author")).orElse(nonEmpty(XmlParser.findText(item, "dc:creator"))),
        publishedAt = JsDate.toIso(pubDate),
        rawPublishedAt = nonEmpty(pubDate),
        updatedAt = None,
        categories = parseCategories(XmlParser.find(item, "category").map(_.text())),
        enclosure = XmlParser.findFirst(item, "enclosure").flatMap(parseEnclosure(_, resolveBase)),
        customFields = extractCustomFields(item))
    }

    FeedParserResult(
      ParsedFeed(
        format = "rss2",
        title = XmlParser.childText(channel, "title"),
        description = nonEmpty(XmlParser.childText(channel, "description")),
        link = resolveUrl(feedLink, resolveBase),
        next = None,
        language = nonEmpty(XmlParser.childText(channel, "language")),
        lastBuildDate = JsDate.toIso(XmlParser.childText(channel, "lastBuildDate")),
        copyright = nonEmpty(XmlParser.childText(channel, "copyright")),
        items = items,
        customFields = extractCustomFields(channel)),
      FeedMetaInfo(
        generator = nonEmpty(XmlParser.childText(channel, "generator")),
        ttl = XmlParser.children(channel, "ttl").headOption.map(_.text()).flatMap(parseNumber),
        image = XmlParser.children(channel, "image").headOption.flatMap(parseImage(_, resolveBase)),
        categories = parseCategories(XmlParser.children(channel, "category").map(_.text()))))
  }

  // ---- Atom 1.0 (rss.ts:133-195) ----
  private def parseAtom(root: Element, baseUrl: Option[String]): FeedParserResult = {
    val feed = XmlParser.findFirst(root, "feed").getOrElse(root)
    // cheerio `.attr('href')` on 'link[rel="alternate"], link:not([rel])'
    // returns the FIRST matching element in DOCUMENT ORDER (selector-list
    // order does not rank matches) — a no-rel link before the alternate
    // link wins (rss.ts:131,138)
    def linkHref(el: Element): String = {
      val links = XmlParser.children(el, "link")
      links.find(l => l.attr("rel").contains("alternate") || !l.attrs.contains("rel"))
        .flatMap(_.attr("href")).getOrElse("")
    }
    val feedLink = linkHref(feed)
    val nextLink = XmlParser.children(feed, "link").find(_.attr("rel").contains("next")).flatMap(_.attr("href"))
    val resolveBase = baseUrl.filter(_.nonEmpty).getOrElse(feedLink)

    val items = XmlParser.find(root, "entry").map { entry =>
      val links = XmlParser.find(entry, "link")
      // document order, same as linkHref above (rss.ts:138)
      val entryLink = links.find(l => l.attr("rel").contains("alternate") || !l.attrs.contains("rel"))
        .flatMap(_.attr("href")).getOrElse("")
      val entryId = XmlParser.findText(entry, "id")
      val published = XmlParser.findText(entry, "published")
      val updated = XmlParser.findText(entry, "updated")
      FeedItem(
        id = entryId,
        title = XmlParser.findText(entry, "title"),
        link = resolveLink(entryLink, entryId, resolveBase),
        description = parseText(entry, "summary"),
        content = parseText(entry, "content"),
        author = XmlParser.findFirst(entry, "author").map(a => XmlParser.findText(a, "name")).flatMap(nonEmpty),
        publishedAt = JsDate.toIso(published),
        rawPublishedAt = nonEmpty(published).orElse(nonEmpty(updated)),
        updatedAt = JsDate.toIso(updated),
        categories = parseCategories(XmlParser.find(entry, "category").map(_.attr("term").getOrElse(""))),
        enclosure = None,
        customFields = extractCustomFields(entry))
    }

    FeedParserResult(
      ParsedFeed(
        format = "atom",
        title = XmlParser.childText(feed, "title"),
        description = nonEmpty(XmlParser.childText(feed, "subtitle")),
        link = resolveUrl(feedLink, resolveBase),
        next = nextLink.map(resolveUrl(_, resolveBase)),
        language = feed.attr("xml:lang").filter(_.nonEmpty),
        lastBuildDate = JsDate.toIso(XmlParser.childText(feed, "updated")),
        copyright = nonEmpty(XmlParser.childText(feed, "rights")),
        items = items,
        customFields = extractCustomFields(feed)),
      FeedMetaInfo(
        generator = nonEmpty(XmlParser.childText(feed, "generator")),
        ttl = None,
        image = parseAtomImage(feed, resolveBase),
        categories = parseCategories(XmlParser.children(feed, "category").map(_.attr("term").getOrElse("")))))
  }

  // ---- RSS 1.0 / RDF (rss.ts:197-263) ----
  private def parseRss1(root: Element, baseUrl: Option[String]): FeedParserResult = {
    val channel = XmlParser.findFirst(root, "channel").getOrElse(root)
    val feedLink = XmlParser.findText(channel, "link")
    val resolveBase = baseUrl.filter(_.nonEmpty).getOrElse(feedLink)

    val items = XmlParser.find(root, "item").map { item =>
      val itemLink = XmlParser.findText(item, "link")
      val rdfAbout = item.attr("rdf:about").getOrElse("")
      val dcDate = XmlParser.findText(item, "dc:date")
      FeedItem(
        id = if (rdfAbout.nonEmpty) rdfAbout else itemLink,
        title = XmlParser.findText(item, "title"),
        link = resolveLink(itemLink, rdfAbout, resolveBase),
        description = parseText(item, "description"),
        content = parseContentEncoded(item),
        author = nonEmpty(XmlParser.findText(item, "dc:creator")),
        publishedAt = JsDate.toIso(dcDate),
        rawPublishedAt = nonEmpty(dcDate),
        updatedAt = None,
        categories = parseCategories(XmlParser.find(item, "dc:subject").map(_.text())),
        enclosure = None,
        customFields = extractCustomFields(item))
    }

    val rdfImage = XmlParser.findFirst(root, "image")
    val imageUrl = rdfImage.map(i => XmlParser.findText(i, "url")).filter(_.nonEmpty)
      .orElse(rdfImage.flatMap(_.attr("rdf:resource")))

    FeedParserResult(
      ParsedFeed(
        format = "rss1",
        title = XmlParser.findText(channel, "title"),
        description = nonEmpty(XmlParser.findText(channel, "description")),
        link = resolveUrl(feedLink, resolveBase),
        next = None,
        language = nonEmpty(XmlParser.findText(channel, "dc:language")),
        lastBuildDate = JsDate.toIso(XmlParser.findText(channel, "dc:date")),
        copyright = nonEmpty(XmlParser.findText(channel, "dc:rights")),
        items = items,
        customFields = extractCustomFields(channel)),
      FeedMetaInfo(
        generator = XmlParser.findFirst(channel, "admin:generatorAgent").flatMap(_.attr("rdf:resource")),
        ttl = None,
        image = imageUrl.map { u =>
          FeedImage(resolveUrl(u, resolveBase),
            rdfImage.map(i => XmlParser.findText(i, "title")).flatMap(nonEmpty),
            rdfImage.map(i => resolveUrl(XmlParser.findText(i, "link"), resolveBase)).filter(_.nonEmpty))
        },
        categories = parseCategories(XmlParser.find(channel, "dc:subject").map(_.text()))))
  }

  // ---- helpers ----

  private def nonEmpty(s: String): Option[String] = Option(s).filter(_.nonEmpty)

  private def parseText(el: Element, tag: String): Option[String] =
    nonEmpty(Js.trim(XmlParser.findText(el, tag)))

  /** K9 — CDATA text, strip tags. */
  private def parseContentEncoded(el: Element): Option[String] = {
    val raw = Js.trim(XmlParser.findText(el, "content:encoded"))
    if (raw.isEmpty) None
    else nonEmpty(Js.trim(raw.replaceAll("<[^>]+>", "")))
  }

  private def parseCategories(cats: Seq[String]): Seq[String] =
    cats.map(Js.trim).filter(_.nonEmpty)

  /** K8 — HTTPS-only resolution; everything else → "". */
  private def resolveUrl(url: String, base: String): String = {
    if (url == null || Js.trim(url).isEmpty) return ""
    val resolved =
      if (base != null && base.nonEmpty) WUrl.parse(base).flatMap(b => WUrl.resolve(url, b)).orElse(WUrl.parse(url))
      else WUrl.parse(url)
    resolved.filter(_.scheme == "https").map(_.href).getOrElse("")
  }

  private def resolveLink(primaryLink: String, fallbackId: String, base: String): String = {
    if (primaryLink != null && Js.trim(primaryLink).nonEmpty) return resolveUrl(primaryLink, base)
    if (fallbackId != null && Js.trim(fallbackId).nonEmpty) {
      WUrl.parse(fallbackId) match {
        case Some(u) => return if (u.scheme == "https") u.href else ""
        case None    => return resolveUrl(fallbackId, base)
      }
    }
    ""
  }

  private def parseEnclosure(enc: Element, base: String): Option[FeedEnclosure] =
    enc.attr("url").filter(_.nonEmpty).map { url =>
      FeedEnclosure(resolveUrl(url, base), enc.attr("type").filter(_.nonEmpty),
        enc.attr("length").flatMap(parseNumber))
    }

  private def parseImage(img: Element, base: String): Option[FeedImage] = {
    val url = XmlParser.findText(img, "url")
    if (url.isEmpty) None
    else Some(FeedImage(resolveUrl(url, base),
      nonEmpty(XmlParser.findText(img, "title")),
      nonEmpty(resolveUrl(XmlParser.findText(img, "link"), base))))
  }

  private def parseAtomImage(feed: Element, base: String): Option[FeedImage] = {
    val logo = XmlParser.childText(feed, "logo")
    val icon = XmlParser.childText(feed, "icon")
    val url = if (logo.nonEmpty) logo else icon
    if (url.isEmpty) None else Some(FeedImage(resolveUrl(url, base), None, None))
  }

  private def parseNumber(v: String): Option[Int] = {
    val digits = v.takeWhile(c => c.isDigit || c == '-' || c == '+')
    try Some(Integer.parseInt(digits)) catch { case _: Exception => None }
  }

  /** K6 — `selector@attr` custom field extraction. */
  private def extractCustomFields(el: Element): Map[String, String] = {
    if (customFields.isEmpty) return Map.empty
    val out = Map.newBuilder[String, String]
    customFields.foreach { case (key, selectorRaw) =>
      val selector = selectorRaw.replace("\\", "")
      val atIndex = selector.lastIndexOf('@')
      val (tagSel, attr) =
        if (atIndex <= 0 || atIndex == selector.length - 1) (selector, None)
        else {
          val a = selector.substring(atIndex + 1)
          if (a.matches("^[A-Za-z_][\\w:-]*$")) (selector.substring(0, atIndex), Some(a))
          else (selector, None)
        }
      val found = XmlParser.find(el, tagSel)
      val value = attr match {
        case Some(a) => Js.trim(found.headOption.flatMap(_.attr(a)).getOrElse(""))
        case None    => Js.trim(found.map(_.text()).mkString)
      }
      if (value.nonEmpty) out += (key -> value)
    }
    out.result()
  }
}

/** K7 — JS `new Date(str).toISOString()` replication for the feed date
  * formats the fixture corpus uses (RFC 2822 + ISO 8601). */
object JsDate {
  private val isoOut = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").withZone(ZoneOffset.UTC)

  def toIso(raw: String): Option[String] = {
    if (raw == null) return None
    val s = Js.trim(raw)
    if (s.isEmpty) return None
    parseInstant(s).map(isoOut.format)
  }

  private val rfc2822 = java.util.regex.Pattern.compile(
    "^(?:[A-Za-z]{3},\\s*)?(\\d{1,2})\\s+([A-Za-z]{3})\\s+(\\d{2,4})\\s+(\\d{1,2}):(\\d{2})(?::(\\d{2}))?\\s*([A-Za-z]{1,5}|[+-]\\d{4})?$")
  private val months = Map(
    "jan" -> 1, "feb" -> 2, "mar" -> 3, "apr" -> 4, "may" -> 5, "jun" -> 6,
    "jul" -> 7, "aug" -> 8, "sep" -> 9, "oct" -> 10, "nov" -> 11, "dec" -> 12)
  private val zones = Map(
    "UT" -> 0, "GMT" -> 0, "UTC" -> 0, "Z" -> 0,
    "EST" -> -5 * 60, "EDT" -> -4 * 60, "CST" -> -6 * 60, "CDT" -> -5 * 60,
    "MST" -> -7 * 60, "MDT" -> -6 * 60, "PST" -> -8 * 60, "PDT" -> -7 * 60)

  def parseInstant(s: String): Option[Instant] = {
    // ISO 8601 variants
    try return Some(Instant.parse(s)) catch { case _: Exception => }
    try return Some(java.time.OffsetDateTime.parse(s).toInstant) catch { case _: Exception => }
    try return Some(LocalDateTime.parse(s).toInstant(ZoneOffset.UTC)) catch { case _: Exception => }
    try return Some(LocalDate.parse(s).atStartOfDay(ZoneOffset.UTC).toInstant) catch { case _: Exception => }
    // RFC 2822
    val m = rfc2822.matcher(s)
    if (m.matches()) {
      try {
        val day = m.group(1).toInt
        val mon = months.getOrElse(m.group(2).toLowerCase(java.util.Locale.ROOT), return None)
        var year = m.group(3).toInt
        if (year < 100) year += (if (year < 50) 2000 else 1900)
        val h = m.group(4).toInt
        val min = m.group(5).toInt
        val sec = Option(m.group(6)).map(_.toInt).getOrElse(0)
        val offMinutes = Option(m.group(7)) match {
          case Some(z) if z.startsWith("+") || z.startsWith("-") =>
            val sign = if (z.startsWith("-")) -1 else 1
            sign * (z.substring(1, 3).toInt * 60 + z.substring(3, 5).toInt)
          // V8's Date parser rejects non-RFC-2822 zone names (CEST, AEST…)
          // as Invalid Date → the reference emits undefined; silently
          // assuming UTC would fabricate a timestamp the reference never has
          case Some(z) => zones.getOrElse(z.toUpperCase(java.util.Locale.ROOT), return None)
          case None => 0
        }
        return Some(LocalDateTime.of(year, mon, day, h, min, sec)
          .toInstant(ZoneOffset.ofTotalSeconds(offMinutes * 60)))
      } catch { case _: Exception => return None }
    }
    None
  }
}

/** K11–K13 + S3 — feed utilities re-expressing `/root/reference/src/utils/feed.ts`. */
object FeedOps {

  /** S4 — `paginateFeed` (`/root/reference/src/utils/feed.ts:171-191`,
    * RFC 5005): follow Atom `rel="next"` links up to `maxPages` (default 10).
    * A driver-side loop by design — pagination is inherently sequential.
    * `fetch` resolves a feed url to its XML body (a pre-crawled url→xml
    * lookup here; a real fetcher in deployment); `None` ends the walk.
    * Cycles terminate via the maxPages bound, exactly like the reference. */
  def paginateFeed(
      url: String,
      fetch: String => Option[String],
      maxPages: Int = 10): Vector[ParsedFeed] = {
    val out = Vector.newBuilder[ParsedFeed]
    val parser = new RssParser()
    var current: Option[String] = Option(url)
    var pages = 0
    while (current.isDefined && pages < maxPages) {
      fetch(current.get) match {
        case None => current = None
        case Some(xml) =>
          val feed = parser.parse(xml, Some(current.get)).data
          out += feed
          current = feed.next
          pages += 1
      }
    }
    out.result()
  }
  import graft.dom.{HtmlParser, Selector}
  import graft.urlx.UrlOps

  private val feedLinkSel = Selector(
    """link[type="application/rss+xml"], link[type="application/atom+xml"], link[type="application/rdf+xml"], link[rel="alternate"][type*="xml"]""")

  /** K11 — feed autodiscovery from HTML. */
  def discoverFeeds(html: String, baseUrl: String): Vector[String] = {
    val doc = HtmlParser.parse(html)
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    feedLinkSel.findIn(doc.html).foreach { el =>
      el.attr("href").filter(_.nonEmpty).foreach { href =>
        UrlOps.resolveUrl(href, baseUrl).foreach { resolved =>
          if (WUrl.parse(resolved).isDefined) seen += resolved
        }
      }
    }
    seen.toVector
  }

  /** K12 — date-range filter; undated items included by default. */
  def filterByDate(items: Seq[FeedItem], after: Option[Instant], before: Option[Instant],
      includeUndated: Boolean = true): Seq[FeedItem] =
    items.filter { item =>
      item.publishedAt.flatMap(JsDate.parseInstant) match {
        case None => includeUndated
        case Some(d) =>
          !(after.exists(a => d.isBefore(a)) || before.exists(b => d.isAfter(b)))
      }
    }

  /** K13 — deterministic markdown templating. */
  def feedToMarkdown(feed: ParsedFeed, includeContent: Boolean = false, maxItems: Option[Int] = None): String = {
    val lines = scala.collection.mutable.ArrayBuffer(s"# ${feed.title}", "")
    feed.description.foreach { d => lines += d; lines += "" }
    // feed.ts:114 `maxItems ? … : items` — JS falsy zero disables the cap
    val items = maxItems.filter(_ > 0).map(feed.items.take).getOrElse(feed.items)
    items.foreach { item =>
      lines += s"## ${item.title}"
      item.publishedAt.foreach { p => lines += s"*${p.split("T")(0)}*" }
      lines += ""
      if (includeContent && item.content.isDefined) lines += item.content.get
      else item.description.foreach(lines += _)
      if (item.link.nonEmpty) { lines += s"[Read more](${item.link})"; lines += "" }
      else lines += ""
    }
    lines.mkString("\n")
  }

  /** K13 — plain-text concatenation. */
  def feedToText(feed: ParsedFeed, maxItems: Option[Int] = None, separator: String = "\n\n---\n\n"): String = {
    val items = maxItems.filter(_ > 0).map(feed.items.take).getOrElse(feed.items)
    items.map { item =>
      (Seq(item.title) ++ item.description ++ item.content).mkString("\n\n")
    }.mkString(separator)
  }

  /** K10 — normalize one feed item via the block pipeline. */
  def normalizeFeedItem(item: FeedItem, options: graft.content.NormalizeOptions = graft.content.NormalizeOptions()): graft.content.NormalizeResult = {
    val html = item.content.orElse(item.description).getOrElse("")
    val doc = HtmlParser.parse(html)
    var blocks = graft.content.BlockParser.parseBlocks(doc,
      dropSelectors = options.dropSelectors,
      maxBlocks = options.maxBlocks.getOrElse(2000),
      includeHtml = options.includeHtml)
    if (blocks.isEmpty) {
      val fallbackText = Js.trim(doc.html.text())
      if (fallbackText.nonEmpty)
        blocks = Vector(graft.content.ContentBlock("paragraph", fallbackText, None, None, Map.empty, Nil, 0))
    }
    graft.content.Normalizer.normalizeText(blocks, options, Some(item.link).filter(_.nonEmpty))
  }
}
