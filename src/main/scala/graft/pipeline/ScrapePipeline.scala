package graft.pipeline

import graft.content.{BlockParser, ContentBlock, NormalizeOptions, Normalizer}
import graft.dom.HtmlParser
import graft.extract._
import graft.urlx.UrlOps

/** Spark-encodable output row — the reference's `ScrapedData`
  * (`src/core/types.ts:41-97`) plus normalization output. `scrapedAt` /
  * `scrapeTimeMs` are job-level metadata, not row data (SURVEY.md §7.3
  * determinism), and ride as literal columns when needed. */
final case class LinkRow(url: String, text: String, is_external: Boolean)

final case class NormMetaRow(
    char_count: Int, token_estimate: Int, language: String,
    boilerplate_removed: Boolean, classifier_used: Boolean, hash: String,
    blocks_total: Int, blocks_accepted: Int, truncated: Boolean)

final case class ScrapedRow(
    url: String,
    canonical_url: String,
    domain: String,
    title: String,
    description: String,
    image: Option[String],
    favicon: Option[String],
    content: String,
    text_content: String,
    excerpt: String,
    word_count: Int,
    author: Option[String],
    published_at: Option[String],
    modified_at: Option[String],
    site_name: Option[String],
    language: Option[String],
    content_type: String,
    keywords: Seq[String],
    json_ld: Option[Seq[String]],
    links: Seq[LinkRow],
    normalized_text: String,
    norm_hash: String,
    norm_meta: NormMetaRow,
    status: String,          // ok | invalid_url | empty_html | encrypted_pdf | not_docx
    error: Option[String],
    /** `custom?: Record<string,unknown>` (types.ts:83): values from custom
      * extractors / ask() as canonical JSON or plain strings, deep-merged
      * across extractors (context.ts:79-83). */
    custom: Map[String, String] = Map.empty)

/**
 * D1–D4 — the fused per-row extraction fold, re-expressing
 * `/root/reference/src/core/scrape.ts:221-325` (`scrapeHtml`): one DOM parse
 * per row, priority-ordered extractor merge (non-undefined wins), error
 * containment per extractor, then block normalization. Called from
 * `Dataset.mapPartitions` — all state is per-call, nothing crosses rows.
 */
object ScrapePipeline {

  /** Priority-sorted (desc, stable) default extractor chain —
    * `src/extractors/index.ts:19-34`. */
  val defaultExtractors: Vector[Extractor] =
    Vector(MetaExtractor, JsonLdExtractor, FaviconExtractor, ContentExtractor, LinksExtractor)
      .sortBy(-_.priority)

  def scrapeHtml(
      html: String,
      url: String,
      normalizeOptions: NormalizeOptions = NormalizeOptions(),
      extractContent: Boolean = true,
      maxContentLength: Int = 50000,
      extractors: Seq[Extractor] = Nil,
      replaceDefaultExtractors: Boolean = false
  ): ScrapedRow = {
    if (!UrlOps.isValidUrl(url))
      return errorRow(url, "invalid_url", Some("Invalid URL provided"))

    val normalizedUrl = UrlOps.normalizeUrl(url)

    val doc =
      try HtmlParser.parse(html)
      catch { case e: Exception => return errorRow(normalizedUrl, "empty_html", Some(s"parse: ${e.getMessage}")) }

    val ctx = ExtractionContext(normalizedUrl, normalizedUrl, doc, extractContent, maxContentLength)

    // scrape.ts:125-135 — customs APPEND to defaults (or replace them
    // outright with replaceDefaultExtractors), then a stable priority-desc
    // sort: equal priority keeps defaults before customs (JS stable sort)
    val effectiveExtractors: Seq[Extractor] =
      if (extractors.isEmpty && !replaceDefaultExtractors) defaultExtractors
      else {
        val combined = if (replaceDefaultExtractors) extractors.toVector
                       else defaultExtractors ++ extractors
        combined.sortBy(-_.priority)
      }

    var results = Partial()
    effectiveExtractors.foreach { extractor =>
      try {
        results = results.merge(extractor.extract(ctx))
      } catch {
        case e: Exception =>
          val msg = s"${extractor.name}: ${Option(e.getMessage).getOrElse(e.getClass.getSimpleName)}"
          results = results.copy(error = Some(results.error.map(_ + "; " + msg).getOrElse(msg)))
      }
    }

    val domain = UrlOps.extractDomain(normalizedUrl)

    // normalization step (scrape.ts:39-70): parseBlocks → normalizeText
    var normalizedText = ""
    var normHash = ""
    var normMeta = NormMetaRow(0, 0, normalizeOptions.languageHint.getOrElse("unknown"), false, false, "", 0, 0, false)
    try {
      val blocks = BlockParser.parseBlocks(
        doc,
        dropSelectors = normalizeOptions.dropSelectors,
        maxBlocks = normalizeOptions.maxBlocks.getOrElse(2000),
        includeHtml = normalizeOptions.includeHtml)
      val nr = Normalizer.normalizeText(blocks, normalizeOptions, Some(normalizedUrl))
      normalizedText = nr.text
      normHash = nr.meta.hash
      normMeta = NormMetaRow(
        nr.meta.charCount, nr.meta.tokenEstimate, nr.meta.language,
        nr.meta.boilerplateRemoved, nr.meta.classifierUsed, nr.meta.hash,
        nr.meta.blocksTotal, nr.meta.blocksAccepted, nr.meta.truncated)
    } catch {
      case e: Exception =>
        val msg = s"normalize: ${Option(e.getMessage).getOrElse(e.getClass.getSimpleName)}"
        results = results.copy(error = Some(results.error.map(_ + "; " + msg).getOrElse(msg)))
    }

    ScrapedRow(
      url = normalizedUrl,
      canonical_url = results.canonicalUrl.getOrElse(normalizedUrl),
      domain = domain,
      title = results.title.getOrElse(""),
      description = results.description.getOrElse(""),
      image = results.image,
      favicon = results.favicon,
      content = results.content.getOrElse(""),
      text_content = results.textContent.getOrElse(""),
      excerpt = results.excerpt.getOrElse(""),
      word_count = results.wordCount.getOrElse(0),
      author = results.author,
      published_at = results.publishedAt,
      modified_at = results.modifiedAt,
      site_name = results.siteName,
      language = results.language,
      content_type = results.contentType.getOrElse("unknown"),
      keywords = results.keywords.getOrElse(Nil),
      json_ld = results.jsonLd,
      links = results.links.getOrElse(Nil).map(l => LinkRow(l.url, l.text, l.isExternal)),
      normalized_text = normalizedText,
      norm_hash = normHash,
      norm_meta = normMeta,
      status = "ok",
      error = results.error,
      custom = results.custom
    )
  }

  /** PDF route of the fused extraction (round 5; hardened round 6): a
    * Common-Crawl-style corpus mixes content types, so `%PDF` blobs flow
    * through [[graft.sources.PdfParser]] instead of the HTML chain,
    * emitting the SAME ScrapedRow shape — downstream dedup/quality/langid/
    * embedding stages are content-type-agnostic by construction.
    *
    * Round-6 parity with the HTML route (VERDICT r5 #1/#2/#4):
    *  - layout blocks map onto ContentBlocks (heading→heading level 1,
    *    text→paragraph) and run the SAME B2 classifier + B7 normalizeText
    *    gates (maxBlocks/maxChars/minChars), so norm_meta is honest and
    *    exact-dedup keys stay byte-comparable across routes (HTML `<h1>` and
    *    a PDF display heading both normalize to `# …`);
    *  - `content` gets the C3 50k cap with the same truncation marker;
    *  - parser containment bounds (aggregate decode budget, inflate caps,
    *    interpreter guard) surface in norm_meta.truncated — no silent caps;
    *  - encrypted PDFs get their own `encrypted_pdf` status so counters can
    *    distinguish "needs decryption support" from "no text exists". */
  def scrapePdf(
      bytes: Array[Byte],
      url: String,
      normalizeOptions: NormalizeOptions = NormalizeOptions(),
      maxContentLength: Int = 50000): ScrapedRow = {
    if (!UrlOps.isValidUrl(url))
      return errorRow(url, "invalid_url", Some("Invalid URL provided"))
    val normalizedUrl = UrlOps.normalizeUrl(url)
    val res = graft.sources.PdfParser.parseDetailed(bytes, "application/pdf")
    if (res.status == "encrypted")
      return errorRow(normalizedUrl, "encrypted_pdf",
        Some("PDF is encrypted (no decryption support, by design)"))
        .copy(domain = UrlOps.extractDomain(normalizedUrl), content_type = "pdf")
    val blocks = res.blocks
    if (blocks.isEmpty)
      return errorRow(normalizedUrl, "empty_html", Some("PDF yielded no text blocks"))
        .copy(domain = UrlOps.extractDomain(normalizedUrl), content_type = "pdf")
    layoutDocRow(normalizedUrl, blocks, res.meta, res.links, "pdf",
      res.truncated, normalizeOptions, maxContentLength,
      markdownLine = b =>
        if (b.kind == "heading") "# " + b.text.replace("\n", " ")
        else if (b.kind == "field") "- " + b.text // AcroForm field values
        else b.text,
      blockType = {
        case "heading" => "heading"
        case "field" => "list" // short "name: value" rows must survive B2
        case _ => "paragraph"
      },
      // /Outlines bookmarks (round 6): section structure as a custom value
      // ("depth|title" lines) — the PDF analogue of a custom extractor
      custom =
        if (res.outline.isEmpty) Map.empty
        else Map("pdf_outline" -> res.outline.map { case (d, t) =>
          s"$d|${t.replace("\n", " ")}"
        }.mkString("\n")))
  }

  /** RTF route (round 6): `{\rtf` blobs through
    * [[graft.sources.Rtf.parseDetailed]] — one linear control-word pass,
    * `\info` metadata onto the shared meta keys, paragraphs as text blocks
    * (RTF headings are style-table references; honest all-text beats
    * guessed structure), the same shared assembler as PDF/office. */
  def scrapeRtf(
      bytes: Array[Byte],
      url: String,
      normalizeOptions: NormalizeOptions = NormalizeOptions(),
      maxContentLength: Int = 50000): ScrapedRow = {
    if (!UrlOps.isValidUrl(url))
      return errorRow(url, "invalid_url", Some("Invalid URL provided"))
    val normalizedUrl = UrlOps.normalizeUrl(url)
    val res = graft.sources.Rtf.parseDetailed(bytes)
    if (res.blocks.isEmpty)
      return errorRow(normalizedUrl, "empty_html", Some("RTF yielded no text"))
        .copy(domain = UrlOps.extractDomain(normalizedUrl), content_type = "rtf")
    layoutDocRow(normalizedUrl, res.blocks, res.meta, Nil, "rtf",
      res.truncated, normalizeOptions, maxContentLength,
      markdownLine = _.text,
      blockType = _ => "paragraph",
      custom = Map.empty)
  }

  /** The shared layout-route row assembler — scrapePdf and scrapeDocx both
    * produce "ordered layout blocks + Dublin-Core-ish meta + links"; the
    * C3 content cap/marker, the explicit-meta-beats-first-heading title
    * rule, the M4 http(s)/100 link filter, and the B2/B7 normalize chain
    * are route-invariant and live HERE once (a copy per route silently
    * desyncs the cross-route dedup-key equality the specs pin). */
  private def layoutDocRow(
      normalizedUrl: String,
      blocks: Vector[graft.sources.LayoutBlock],
      meta: Map[String, String],
      linkUrls: Seq[String],
      contentType: String,
      parserTruncated: Boolean,
      normalizeOptions: NormalizeOptions,
      maxContentLength: Int,
      markdownLine: graft.sources.LayoutBlock => String,
      blockType: String => String,
      custom: Map[String, String]): ScrapedRow = {
    val textContent = blocks.map(_.text).mkString("\n\n")
    var markdown = blocks.map(markdownLine).mkString("\n\n")
    if (markdown.length > maxContentLength) // C3 parity: same cap + marker
      markdown = markdown.substring(0, maxContentLength) + "\n\n[Content truncated...]"
    // explicit document metadata (PDF /Info, OOXML core.xml) beats the
    // first-heading heuristic, exactly like <meta> beats <h1> on HTML
    val title = meta.get("title")
      .orElse(blocks.find(_.kind == "heading").map(_.text.linesIterator.next()))
      .getOrElse("")
    val contentBlocks = blocks.map { b =>
      ContentBlock(
        blockType = blockType(b.kind),
        text = b.text,
        level = if (b.kind == "heading") Some(1) else None,
        html = None, attrs = Map.empty, parentTags = Seq(contentType), depth = 1)
    }
    val nr = Normalizer.normalizeText(contentBlocks, normalizeOptions, Some(normalizedUrl))
    ScrapedRow(
      url = normalizedUrl,
      canonical_url = normalizedUrl,
      domain = UrlOps.extractDomain(normalizedUrl),
      title = title,
      description = meta.getOrElse("subject", ""),
      image = None,
      favicon = None,
      content = markdown,
      text_content = textContent,
      excerpt = graft.extract.ContentExtractor.createExcerpt(textContent),
      word_count = graft.util.Js.countTokens(textContent),
      author = meta.get("author"),
      published_at = meta.get("created"),
      modified_at = meta.get("modified"),
      site_name = None, language = None,
      content_type = contentType,
      keywords = meta.get("keywords")
        .map(_.split("[,;]").toSeq.map(_.trim).filter(_.nonEmpty)).getOrElse(Nil),
      json_ld = None,
      // M4 parity: http(s) only, deduped by the parser, capped at the
      // same 100 as the HTML route
      links = {
        val domain = UrlOps.extractDomain(normalizedUrl)
        linkUrls.filter(u => u.startsWith("http://") || u.startsWith("https://"))
          .take(100)
          .map(u => LinkRow(u, "", UrlOps.extractDomain(u) != domain))
      },
      normalized_text = nr.text,
      norm_hash = nr.meta.hash,
      norm_meta = NormMetaRow(
        nr.meta.charCount, nr.meta.tokenEstimate, nr.meta.language,
        nr.meta.boilerplateRemoved, nr.meta.classifierUsed, nr.meta.hash,
        nr.meta.blocksTotal, nr.meta.blocksAccepted,
        nr.meta.truncated || parserTruncated),
      status = "ok",
      error = None,
      custom = custom)
  }

  /** DOCX route (round 6 — the office-document leg beside HTML/PDF):
    * [[graft.sources.Docx.parseDetailed]] blocks through the SAME
    * normalize/meta assembly as [[scrapePdf]], so every downstream stage
    * (dedup keys, quality, langid, embedding) is content-type-agnostic.
    * A ZIP that is not a DOCX gets its own `not_docx` error code — the
    * lineage counters must distinguish "unsupported container" from
    * "no text exists" (the encrypted_pdf lesson). */
  def scrapeDocx(
      bytes: Array[Byte],
      url: String,
      normalizeOptions: NormalizeOptions = NormalizeOptions(),
      maxContentLength: Int = 50000): ScrapedRow = {
    if (!UrlOps.isValidUrl(url))
      return errorRow(url, "invalid_url", Some("Invalid URL provided"))
    val normalizedUrl = UrlOps.normalizeUrl(url)
    val res = graft.sources.Docx.parseDetailed(bytes)
    if (res.status == "not_docx")
      return errorRow(normalizedUrl, "not_docx",
        Some("ZIP container without word/document.xml"))
        .copy(domain = UrlOps.extractDomain(normalizedUrl), content_type = "docx")
    if (res.blocks.isEmpty)
      return errorRow(normalizedUrl, "empty_html", Some("document yielded no text blocks"))
        .copy(domain = UrlOps.extractDomain(normalizedUrl), content_type = res.flavor)
    layoutDocRow(normalizedUrl, res.blocks, res.meta, res.links,
      res.flavor /* docx | pptx | xlsx */, res.truncated,
      normalizeOptions, maxContentLength,
      markdownLine = b =>
        if (b.kind == "heading") "# " + b.text.replace("\n", " ")
        else b.text,
      blockType = {
        case "heading" => "heading"
        case "table" => "list" // short cell rows must survive B2, like fields
        case _ => "paragraph"
      },
      custom = Map.empty)
  }

  private def errorRow(url: String, status: String, error: Option[String]): ScrapedRow =
    ScrapedRow(url, url, "", "", "", None, None, "", "", "", 0, None, None, None,
      None, None, "unknown", Nil, None, Nil, "", "",
      NormMetaRow(0, 0, "unknown", false, false, "", 0, 0, false), status, error, Map.empty)
}
