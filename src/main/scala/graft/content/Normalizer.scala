package graft.content

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.text.{Normalizer => JNormalizer}
import java.util.regex.{Matcher, Pattern}
import graft.util.Js

/**
 * B4–B7 — string normalization, truncation, content hash and the block-fold
 * normalizeText, re-expressing `/root/reference/src/content/normalizer.ts`.
 * All pure per-row functions; the only cross-row consumer is dedup on the
 * emitted `hash` column (`dropDuplicates`, SURVEY.md §2.10).
 */
object Normalizer {

  // --- B4 normalizeString (normalizer.ts:22-64) ---

  private val nbspRe = Pattern.compile("&nbsp;")
  private val ampRe = Pattern.compile("&amp;")
  private val ltRe = Pattern.compile("&lt;")
  private val gtRe = Pattern.compile("&gt;")
  private val quotRe = Pattern.compile("&quot;")
  private val decRe = Pattern.compile("&#(\\d+);")
  private val hexRe = Pattern.compile("&#x([0-9a-f]+);", Pattern.CASE_INSENSITIVE)
  private val mdLinkRe = Pattern.compile("\\[([^\\]]+)\\]\\([^)]+\\)")
  private val spaceTabRe = Pattern.compile("[ \\t]+")
  private val threeNlRe = Pattern.compile("\\n{3,}")
  private val anyNlRe = Pattern.compile("\\n+")

  private def replaceAllFn(p: Pattern, s: String)(f: Matcher => String): String = {
    val m = p.matcher(s)
    if (!m.find()) return s
    val sb = new java.lang.StringBuilder
    var last = 0
    do {
      sb.append(s, last, m.start())
      sb.append(f(m))
      last = m.end()
    } while (m.find())
    sb.append(s, last, s.length)
    sb.toString
  }

  def normalizeString(
      text: String,
      decodeEntities: Boolean = true,
      normalizeUnicode: Boolean = true,
      preserveLineBreaks: Boolean = true,
      stripLinks: Boolean = true
  ): String = {
    var result = text

    // every entity pattern requires a literal '&' — one indexOf gates all 7
    // passes (exact: a pass with no possible match returns the input)
    if (decodeEntities && result.indexOf('&') >= 0) {
      result = nbspRe.matcher(result).replaceAll(" ")
      result = ampRe.matcher(result).replaceAll("&")
      result = ltRe.matcher(result).replaceAll("<")
      result = gtRe.matcher(result).replaceAll(">")
      result = quotRe.matcher(result).replaceAll("\"")
      // JS String.fromCharCode quirk: UTF-16 code-unit semantics (ToUint16)
      result = replaceAllFn(decRe, result)(m => Js.fromCharCode(safeParseLong(m.group(1), 10)))
      result = replaceAllFn(hexRe, result)(m => Js.fromCharCode(safeParseLong(m.group(1), 16)))
    }

    if (stripLinks && result.indexOf('[') >= 0)
      result = mdLinkRe.matcher(result).replaceAll("$1")

    if (normalizeUnicode && !JNormalizer.isNormalized(result, JNormalizer.Form.NFC))
      result = JNormalizer.normalize(result, JNormalizer.Form.NFC)

    result = Js.collapseSpaceTab(result) // == replaceAll("[ \t]+", " ")

    result =
      if (preserveLineBreaks) collapseThreeNl(result)
      else collapseAnyNl(result)

    Js.trim(result)
  }

  /** Exact equivalent of `replaceAll("\\n{3,}", "\n\n")`. */
  private def collapseThreeNl(s: String): String = {
    var i = s.indexOf("\n\n\n")
    if (i < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    sb.append(s, 0, i)
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\n' && i + 2 < n && s.charAt(i + 1) == '\n' && s.charAt(i + 2) == '\n') {
        sb.append("\n\n")
        while (i < n && s.charAt(i) == '\n') i += 1
      } else {
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  /** Exact equivalent of `replaceAll("\\n+", " ")`. */
  private def collapseAnyNl(s: String): String = {
    var i = s.indexOf('\n')
    if (i < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    sb.append(s, 0, i)
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\n') {
        sb.append(' ')
        while (i < n && s.charAt(i) == '\n') i += 1
      } else {
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  private def safeParseLong(s: String, radix: Int): Long =
    // take(15): JS parseInt is exact up to 2^53, so 13-15 digit character
    // references must parse in full before fromCharCode's mod-65536 —
    // truncating at 12 produced a different character than the reference
    try java.lang.Long.parseLong(s.take(15), radix)
    catch { case _: NumberFormatException => 0xfffdL }

  // --- B5 truncateText (normalizer.ts:79-109) ---

  def truncateText(text: String, maxChars: Int, strategy: String): (String, Boolean) = {
    if (text.length <= maxChars) return (text, false)
    var truncated = text.substring(0, maxChars)
    strategy match {
      case "sentence" =>
        val lastBoundary = math.max(
          truncated.lastIndexOf(". "),
          math.max(truncated.lastIndexOf("? "), truncated.lastIndexOf("! "))
        )
        if (lastBoundary > maxChars * 0.5) truncated = truncated.substring(0, lastBoundary + 1)
      case "word" =>
        val lastSpace = truncated.lastIndexOf(' ')
        if (lastSpace > maxChars * 0.8) truncated = truncated.substring(0, lastSpace)
      case _ =>
    }
    (Js.trim(truncated), true)
  }

  // --- B6 generateHash (normalizer.ts:115-117) ---

  def generateHash(text: String): String =
    graft.ops.TextOps.sha256Hex(text).substring(0, 32)

  // --- B7 normalizeText (normalizer.ts:140-255) ---

  def normalizeText(
      blocksIn: Seq[ContentBlock],
      options: NormalizeOptions = NormalizeOptions(),
      url: Option[String] = None
  ): NormalizeResult = {
    val classifier: Option[Classifier.BlockClassifier] =
      options.blockClassifier.orElse(if (options.removeBoilerplate) Some(Classifier.default) else None)

    val originalBlocksTotal = blocksIn.length
    var blocksTruncated = false
    // JS falsy-zero (normalizer.ts:161 `maxBlocks && …`): maxBlocks = 0
    // DISABLES the cap rather than truncating to nothing
    val blocks = options.maxBlocks match {
      case Some(mb) if mb > 0 && blocksIn.length > mb => blocksTruncated = true; blocksIn.take(mb)
      case _ => blocksIn
    }

    var classified: Vector[ClassifiedBlock] = classifier match {
      case Some(cl) =>
        val out = Vector.newBuilder[ClassifiedBlock]
        var i = 0
        while (i < blocks.length) {
          val b = blocks(i)
          val ctx = ClassifierContext(i, blocks.length, url, b.parentTags, b.depth)
          val r = cl(b, ctx)
          if (r.accept) out += ClassifiedBlock(b, r.score, r.label)
          i += 1
        }
        out.result()
      case None => blocks.iterator.map(b => ClassifiedBlock(b, None, None)).toVector
    }

    if (options.mode == "summary")
      classified = classified.sortBy(cb => -cb.score.getOrElse(0.5)) // stable, score desc (normalizer.ts:195-197)

    val textParts = classified.map { cb =>
      var t = normalizeString(cb.block.text, options.decodeEntities, options.normalizeUnicode,
        options.preserveLineBreaks, options.stripLinks)
      if (cb.block.blockType == "heading")
        cb.block.level.foreach { l => t = ("#" * l) + " " + t }
      t
    }

    // exact-size join (mkString would double-and-copy through ~2× the bytes)
    var normalizedText = {
      var total = 0
      textParts.foreach(t => total += t.length + 2)
      val sb = new java.lang.StringBuilder(math.max(0, total - 2))
      var first = true
      textParts.foreach { t =>
        if (!first) sb.append("\n\n")
        sb.append(t)
        first = false
      }
      sb.toString
    }
    var truncated = false
    options.maxChars.foreach { mc =>
      // normalizer.ts:212 `maxChars && …` — 0 disables, like maxBlocks
      if (mc > 0 && normalizedText.length > mc) {
        val (t, tr) = truncateText(normalizedText, mc, options.truncate)
        normalizedText = t
        truncated = tr
      }
    }

    val belowMin = options.minChars.exists(normalizedText.length < _)
    if (belowMin) {
      NormalizeResult(
        text = "",
        meta = NormalizationMeta(
          charCount = 0, tokenEstimate = 0,
          language = options.languageHint.getOrElse("unknown"),
          boilerplateRemoved = false, classifierUsed = false, hash = "",
          extractionTimeMs = 0L,
          blocksTotal = originalBlocksTotal, blocksAccepted = 0,
          truncated = blocksTruncated
        ),
        blocks = if (options.debug) Some(Nil) else None
      )
    } else {
      NormalizeResult(
        text = normalizedText,
        meta = NormalizationMeta(
          charCount = normalizedText.length,
          tokenEstimate = math.ceil(normalizedText.length / 4.0).toInt,
          language = options.languageHint.getOrElse("unknown"),
          boilerplateRemoved = options.removeBoilerplate,
          classifierUsed = classifier.isDefined,
          hash = generateHash(normalizedText),
          extractionTimeMs = 0L,
          blocksTotal = originalBlocksTotal,
          blocksAccepted = classified.length,
          truncated = truncated || blocksTruncated
        ),
        blocks = if (options.debug) Some(classified) else None
      )
    }
  }
}
