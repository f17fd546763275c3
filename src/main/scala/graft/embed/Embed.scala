package graft.embed

import java.util.regex.Pattern
import graft.util.Js

final case class TextChunk(text: String, startIndex: Int, endIndex: Int, tokens: Int)

final case class RedactionResult(
    text: String, redacted: Boolean, redactionCount: Int, redactionsByType: Map[String, Int])

final case class InputValidation(
    valid: Boolean, reason: Option[String], text: Option[String], wordCount: Int, charCount: Int)

/**
 * E1–E4 — deterministic embedding-pipeline core, re-expressing
 * `/root/reference/src/embeddings/{chunking,safety,input}.ts`: input
 * selection + cleaning, markdown stripping, PII redaction (ordered patterns,
 * creditCard before phone), sentence/word-boundary chunking with clamped
 * overlap. The provider HTTP calls (E8/E9) are out of the deterministic core
 * (pluggable trait; no network in the sandbox).
 *
 * Per-row functions: chunk explosion (`explode`) and vector aggregation
 * (`groupBy(url)` + element-wise Aggregator) are the only cross-row pieces,
 * in SparkEntry / EmbedAgg.
 */
object Embed {

  // ---- E4 chunking (chunking.ts) ----

  val DefaultChunkSize = 500
  val DefaultOverlap = 50
  val DefaultMaxInputLength = 100000

  def heuristicTokenCount(text: String): Int = math.ceil(text.length / 4.0).toInt

  /** chunking.ts:181-184. */
  def estimateTokens(text: String): Int = heuristicTokenCount(text)

  /** chunking.ts:189-196. */
  def needsChunking(text: String, maxTokens: Int = DefaultChunkSize): Boolean =
    heuristicTokenCount(text) > maxTokens

  final case class ChunkingStats(
      inputLength: Int, estimatedTokens: Int, estimatedChunks: Int, willTruncate: Boolean)

  /** chunking.ts:201-238 — chunk-count estimate without materializing chunks
    * (the planner-side helper: size an embedding job before running it). */
  def getChunkingStats(
      text: String,
      size: Int = DefaultChunkSize,
      overlap: Int = DefaultOverlap,
      maxInputLength: Int = DefaultMaxInputLength): ChunkingStats = {
    val inputLength = text.length
    val willTruncate = inputLength > maxInputLength
    val processedLength = if (willTruncate) maxInputLength else inputLength
    val normalized =
      Js.trim(Js.collapseWsAll(text.substring(0, processedLength)))
    val estimatedTokens = heuristicTokenCount(normalized)
    val estimatedChunks =
      if (estimatedTokens <= size) 1
      else {
        // clamp to [0, size-1] exactly like chunkText — the estimate must
        // agree with the chunker it predicts, including for negative overlap
        val clampedOverlap = math.min(math.max(0, overlap), math.max(0, size - 1))
        val effective = math.max(1, size - clampedOverlap)
        math.ceil((estimatedTokens - clampedOverlap).toDouble / effective).toInt
      }
    ChunkingStats(inputLength, estimatedTokens, estimatedChunks, willTruncate)
  }

  private def tokensToChars(tokens: Int): Int = tokens * 4

  private val sentenceBoundary = Pattern.compile("[.!?。！？][" + Js.wsClass + "]*")

  /** chunking.ts:64-96 — sentence boundary within ±20% of target, else word boundary. */
  private def findBreakPoint(text: String, targetIndex: Int): Int = {
    val searchStart = math.max(0, targetIndex - math.floor(targetIndex * 0.2).toInt)
    val searchEnd = math.min(text.length, targetIndex + math.floor(targetIndex * 0.2).toInt)
    val searchText = text.substring(searchStart, searchEnd)

    var lastSentenceEnd = -1
    val m = sentenceBoundary.matcher(searchText)
    while (m.find()) {
      val absolutePos = searchStart + m.start() + m.group().length
      if (absolutePos <= targetIndex) lastSentenceEnd = absolutePos
    }
    if (lastSentenceEnd != -1) return lastSentenceEnd

    val wordBoundary = text.lastIndexOf(' ', targetIndex)
    if (wordBoundary > searchStart) wordBoundary + 1
    else targetIndex
  }

  /** chunking.ts:100-176. */
  def chunkText(
      text: String,
      size: Int = DefaultChunkSize,
      overlapIn: Int = DefaultOverlap,
      maxInputLength: Int = DefaultMaxInputLength): Vector[TextChunk] = {
    val overlap = math.min(math.max(0, overlapIn), math.max(0, size - 1))
    val processed = if (text.length > maxInputLength) text.substring(0, maxInputLength) else text
    // Js.collapseWsAll is the precompiled-free equivalent of
    // replaceAll("[<JS ws>]+", " ") — the per-row Pattern.compile of the
    // string-concatenated class was a measured hot-path waste
    val normalized = Js.trim(Js.collapseWsAll(processed))
    if (normalized.isEmpty) return Vector.empty

    val totalTokens = heuristicTokenCount(normalized)
    if (totalTokens <= size)
      return Vector(TextChunk(normalized, 0, normalized.length, totalTokens))

    val chunks = Vector.newBuilder[TextChunk]
    val chunkSizeChars = tokensToChars(size)
    val overlapChars = tokensToChars(overlap)
    var startIndex = 0
    var done = false

    while (startIndex < normalized.length && !done) {
      val targetEnd = math.min(startIndex + chunkSizeChars, normalized.length)
      val endIndex =
        if (targetEnd < normalized.length) findBreakPoint(normalized, targetEnd) else targetEnd
      // JS slice semantics (chunking.ts:146): when findBreakPoint lands
      // BEHIND startIndex (a stale sentence boundary in the ±20% window on
      // long punctuation-free stretches), slice(start, end<start) is "" and
      // the loop creeps forward — substring would throw and the whole
      // document would be silently skipped by the never-throws pipeline
      val chunk =
        if (endIndex <= startIndex) ""
        else Js.trim(normalized.substring(startIndex, endIndex))
      if (chunk.nonEmpty)
        chunks += TextChunk(chunk, startIndex, endIndex, heuristicTokenCount(chunk))

      if (endIndex >= normalized.length) done = true
      else {
        val nextStart = endIndex - overlapChars
        startIndex = math.max(nextStart, startIndex + 1)
        if (startIndex < normalized.length) {
          val spaceIndex = normalized.indexOf(' ', startIndex)
          if (spaceIndex != -1 && spaceIndex < startIndex + overlapChars)
            startIndex = spaceIndex + 1
        }
      }
    }
    chunks.result()
  }

  // ---- E3 PII redaction (safety.ts) ----

  private def g(p: String) = Pattern.compile(p)
  // JS \s (safety.ts separators) includes NBSP and the Unicode space
  // separators — Java \s is ASCII-only, which let "(212) 555 1234"
  // style NBSP-separated phone/card numbers escape redaction; the scraped-
  // HTML path produces exactly that via &nbsp;. (The DuckDB oracle regexes
  // keep RE2 \s — identical on the ASCII verification corpus.)
  private val jsWs = "\\s" + Js.wsClass
  val EmailPattern: Pattern = g("\\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Z|a-z]{2,}\\b")
  val PhonePattern: Pattern = g(s"(?:\\+?1[-.$jsWs]?)?\\(?[0-9]{3}\\)?[-.$jsWs]?[0-9]{3}[-.$jsWs]?[0-9]{4}\\b")
  val CreditCardPattern: Pattern = g(
    s"\\b(?:4[0-9]{12}(?:[0-9]{3})?|5[1-5][0-9]{14}|3[47][0-9]{13}|6(?:011|5[0-9]{2})[0-9]{12}|(?:[0-9]{4}[-$jsWs]){3}[0-9]{4}|[0-9]{13,19})\\b")
  val SsnPattern: Pattern = g("\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b")
  val Ipv4Pattern: Pattern = g(
    "\\b(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\.(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\.(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\.(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\b")

  val Redacted = "[REDACTED]"

  final case class PiiConfig(
      creditCard: Boolean = true, email: Boolean = true, phone: Boolean = true,
      ssn: Boolean = true, ipAddress: Boolean = true,
      customPatterns: Seq[Pattern] = Nil)

  /** safety.ts:34-120 — ordered application (creditCard BEFORE phone);
    * counts are taken against the ORIGINAL text per pattern (reference quirk),
    * replacement applied progressively. */
  def redactPii(text: String, config: PiiConfig = PiiConfig()): RedactionResult = {
    val patterns = Seq.newBuilder[(String, Pattern)]
    if (config.creditCard) patterns += ("creditCard" -> CreditCardPattern)
    if (config.email) patterns += ("email" -> EmailPattern)
    if (config.phone) patterns += ("phone" -> PhonePattern)
    if (config.ssn) patterns += ("ssn" -> SsnPattern)
    if (config.ipAddress) patterns += ("ipAddress" -> Ipv4Pattern)
    config.customPatterns.zipWithIndex.foreach { case (p, i) => patterns += (s"custom_$i" -> p) }

    var redactedText = text
    var total = 0
    var byType = Map.empty[String, Int]
    patterns.result().foreach { case (name, pattern) =>
      val m = pattern.matcher(text)
      var matchCount = 0
      while (m.find()) matchCount += 1
      if (matchCount > 0) {
        redactedText = pattern.matcher(redactedText).replaceAll(java.util.regex.Matcher.quoteReplacement(Redacted))
        total += matchCount
        byType += (name -> (byType.getOrElse(name, 0) + matchCount))
      }
    }
    RedactionResult(redactedText, total > 0, total, byType)
  }

  def containsPii(text: String, config: PiiConfig = PiiConfig()): Boolean =
    redactPii(text, config).redacted

  // ---- E1/E2 input selection (input.ts) ----

  final case class InputData(
      normalizedText: Option[String] = None, textContent: Option[String] = None,
      content: Option[String] = None, excerpt: Option[String] = None,
      description: Option[String] = None, title: Option[String] = None,
      summary: Option[String] = None)

  /** input.ts:11-50 (types `textContent` / `title+summary` / `custom`). */
  def selectInput(
      data: InputData,
      inputType: String = "textContent",
      customText: Option[String] = None,
      preferNormalized: Boolean = true): Option[String] = {
    if (preferNormalized && data.normalizedText.exists(t => Js.trim(t).nonEmpty))
      return Some(cleanText(data.normalizedText.get))
    // input.ts:27 truthy check: custom with an EMPTY string falls through
    // to the textContent chain (an empty customText must not cause a skip)
    if (inputType == "custom" && customText.exists(_.nonEmpty))
      return Some(cleanText(customText.get))
    inputType match {
      case "title+summary" => selectTitleSummary(data)
      case _               => selectTextContent(data)
    }
  }

  private def selectTextContent(data: InputData): Option[String] =
    data.textContent.filter(_.nonEmpty).map(cleanText)
      .orElse(data.content.filter(_.nonEmpty).map(c => cleanText(stripMarkdown(c))))
      .orElse(data.excerpt.filter(_.nonEmpty).map(cleanText))
      .orElse(data.description.filter(_.nonEmpty).map(cleanText))

  private def selectTitleSummary(data: InputData): Option[String] = {
    val parts = Vector.newBuilder[String]
    data.title.filter(_.nonEmpty).foreach(parts += _)
    data.summary.filter(_.nonEmpty)
      .orElse(data.excerpt.filter(_.nonEmpty))
      .orElse(data.description.filter(_.nonEmpty))
      .foreach(parts += _)
    val v = parts.result()
    if (v.isEmpty) None else Some(cleanText(v.mkString("\n\n")))
  }

  /** input.ts:111-133 — control-char strip, whitespace collapse, per-line trim. */
  def cleanText(text: String): String = {
    if (text == null || text.isEmpty) return ""
    val stripped = text.replaceAll("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
    Js.trim(
      Js.collapseSpaceTab(stripped)
        .replaceAll("\\n{3,}", "\n\n")
        .split("\n", -1).map(Js.trim).mkString("\n"))
  }

  /** input.ts:139-164. */
  def stripMarkdown(markdown: String): String =
    markdown
      .replaceAll("```[\\s\\S]*?```", "")
      .replaceAll("`[^`]+`", "")
      .replaceAll("\\[([^\\]]+)\\]\\([^)]+\\)", "$1")
      .replaceAll("!\\[([^\\]]*)\\]\\([^)]+\\)", "$1")
      .replaceAll("(?m)^#{1,6}\\s+", "")
      .replaceAll("\\*\\*([^*]+)\\*\\*", "$1")
      .replaceAll("\\*([^*]+)\\*", "$1")
      .replaceAll("__([^_]+)__", "$1")
      .replaceAll("_([^_]+)_", "$1")
      .replaceAll("(?m)^>\\s+", "")
      .replaceAll("(?m)^[-*_]{3,}$", "")
      .replaceAll("(?m)^[\\s]*[-*+]\\s+", "")
      .replaceAll("(?m)^[\\s]*\\d+\\.\\s+", "")

  /** input.ts:169-199 — reject < minLength chars or < 3 words of len > 1. */
  /** input.ts:212-227 — debugging surface: the selected input truncated to
    * `maxLength` with a `...` marker, or the no-input sentinel. */
  def previewInput(
      data: InputData,
      inputType: String = "textContent",
      customText: Option[String] = None,
      maxLength: Int = 200): String =
    selectInput(data, inputType, customText) match {
      case None                                  => "[No input available]"
      case Some(t) if t.length <= maxLength      => t
      case Some(t)                               => t.substring(0, maxLength) + "..."
    }

  def validateInput(text: Option[String], minLength: Int = 10): InputValidation =
    text match {
      case None | Some("") =>
        InputValidation(valid = false, Some("No input text available"), None, 0, 0)
      case Some(t) if t.length < minLength =>
        InputValidation(valid = false, Some(s"Input too short (${t.length} < $minLength characters)"), None, 0, 0)
      case Some(t) =>
        val wordCount = Js.splitWs(t).count(_.length > 1)
        if (wordCount < 3)
          InputValidation(valid = false, Some(s"Input has too few words ($wordCount < 3)"), None, 0, 0)
        else InputValidation(valid = true, None, Some(t), wordCount, t.length)
    }
}
