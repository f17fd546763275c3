package graft.sources

/**
 * From-scratch RTF text extractor — the last text-bearing legacy format a
 * crawl carries in volume. RTF is a brace-grouped control-word stream;
 * extraction is one linear pass:
 *
 *  - destination groups that never hold body text are skipped whole
 *    (`\fonttbl \colortbl \stylesheet \pict \object \*` …), with `\info >
 *    \title/\author/\subject` captured into the shared meta keys instead;
 *  - `\par`/`\line` → newline, `\tab` → tab, `\'hh` → cp1252-ish byte,
 *    `\uN` → unicode scalar honoring the current `\ucN` fallback-skip
 *    count, `\\ \{ \}` → literals; all other control words are formatting
 *    and drop;
 *  - paragraphs (newline-split) become text blocks (RTF has no reliable
 *    structural headings — styles are style-table references; honest
 *    "all text" beats guessed headings).
 *
 * Bounded by construction: one pass over the input (already in memory),
 * group depth capped at [[MaxGroupDepth]] (deeper input is malformed —
 * excess braces are ignored, surfaced as truncated), output capped at
 * [[MaxOutputChars]] (truncated flag). Never throws; a blob without the
 * `{\rtf` magic is `not_rtf`.
 */
object Rtf {

  val MaxGroupDepth: Int = 256
  val MaxOutputChars: Int = 4 << 20

  final case class RtfResult(
      blocks: Vector[LayoutBlock],
      status: String, // ok | not_rtf | empty
      truncated: Boolean,
      meta: Map[String, String])

  def isRtf(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 5 &&
      bytes(0) == '{' && bytes(1) == '\\' && bytes(2) == 'r' &&
      bytes(3) == 't' && bytes(4) == 'f'

  /** Destinations whose content is never body text. `\*` marks "skip if
    * unknown" destinations generically. */
  private val SkipDests = Set(
    "fonttbl", "colortbl", "stylesheet", "pict", "object", "themedata",
    "datastore", "xmlnstbl", "listtable", "listoverridetable", "levelnumbers",
    "header", "footer", "footnote", "generator", "operator", "filetbl")

  /** `\'hh` bytes are ANSI-codepage text; the de-facto crawl default is
    * windows-1252 (0x80–0x9F carries smart quotes/dashes there, vs invisible
    * C1 controls in ISO-8859-1). */
  private val Cp1252 = java.nio.charset.Charset.forName("windows-1252")
  private def cp1252Char(b: Int): Char =
    new String(Array((b & 0xFF).toByte), Cp1252).charAt(0)

  private val MetaDests = Map(
    "title" -> "title", "author" -> "author", "subject" -> "subject",
    "creatim" -> "", "doccomm" -> "")

  def parseDetailed(bytes: Array[Byte]): RtfResult = {
    if (!isRtf(bytes)) return RtfResult(Vector.empty, "not_rtf", truncated = false, Map.empty)
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val n = s.length
    val out = new java.lang.StringBuilder
    val meta = scala.collection.mutable.Map.empty[String, String]
    var truncated = false

    // per-group state: (skipDepth marker, uc fallback count, metaKey)
    var depth = 0
    var skipUntilDepth = -1 // when >= 0: inside a skipped destination
    var metaUntilDepth = -1
    var metaKey = ""
    val metaBuf = new java.lang.StringBuilder
    var ucSkip = 1
    var pendingUcSkip = 0

    def emitChar(c: Char): Unit = {
      if (pendingUcSkip > 0) { pendingUcSkip -= 1; return }
      if (metaUntilDepth >= 0) { metaBuf.append(c); return }
      if (skipUntilDepth >= 0) return
      if (out.length() < MaxOutputChars) out.append(c) else truncated = true
    }

    var i = 0
    var inInfo = false
    var infoDepth = -1
    while (i < n) {
      val c = s.charAt(i)
      c match {
        case '{' =>
          depth += 1
          if (depth > MaxGroupDepth) truncated = true
          i += 1
        case '}' =>
          if (metaUntilDepth >= 0 && depth == metaUntilDepth) {
            if (metaKey.nonEmpty) meta(metaKey) = metaBuf.toString.trim
            metaBuf.setLength(0); metaKey = ""; metaUntilDepth = -1
          }
          if (skipUntilDepth >= 0 && depth == skipUntilDepth) skipUntilDepth = -1
          if (inInfo && depth == infoDepth) { inInfo = false; infoDepth = -1 }
          depth = math.max(0, depth - 1)
          i += 1
        case '\\' if i + 1 < n =>
          val c1 = s.charAt(i + 1)
          if (c1 == '\\' || c1 == '{' || c1 == '}') { emitChar(c1); i += 2 }
          else if (c1 == '\'' && i + 3 < n) {
            val hex = s.substring(i + 2, i + 4)
            try emitChar(cp1252Char(Integer.parseInt(hex, 16)))
            catch { case _: NumberFormatException => }
            i += 4
          } else if (c1 == '~') { emitChar(' '); i += 2 } // nbsp, faithfully
          else if (c1 == '*') {
            // \* introduces an ignorable destination: skip the group unless
            // it is one we capture
            if (skipUntilDepth < 0) skipUntilDepth = depth
            i += 2
          } else if (Character.isLetter(c1)) {
            var j = i + 1
            while (j < n && Character.isLetter(s.charAt(j))) j += 1
            val word = s.substring(i + 1, j)
            var k = j
            var neg = false
            if (k < n && s.charAt(k) == '-') { neg = true; k += 1 }
            var num = 0L
            var hasNum = false
            // consume ALL digits even once the value saturates — leaving
            // trailing digits unconsumed would misalign \binN's raw-byte
            // skip (and scan the payload as body text)
            while (k < n && Character.isDigit(s.charAt(k))) {
              if (num <= Int.MaxValue) num = num * 10 + (s.charAt(k) - '0')
              k += 1; hasNum = true
            }
            if (num > Int.MaxValue) num = Int.MaxValue
            if (k < n && s.charAt(k) == ' ') k += 1 // delimiter space eats
            val value = if (neg) -num else num
            word match {
              case "par" | "line" | "row" => emitChar('\n')
              case "tab" | "cell" => emitChar('\t')
              case "uc" => ucSkip = if (hasNum) value.toInt.max(0) else 1
              case "u" =>
                val cp = if (value < 0) value + 65536 else value
                if (cp > 0 && cp <= 0x10FFFF)
                  Character.toChars(cp.toInt).foreach(emitChar)
                // the NEXT ucSkip chars are the ANSI fallback: drop them
                // even when the codepoint was unrepresentable
                pendingUcSkip = ucSkip
              case "bin" =>
                // \binN is followed by N RAW bytes — not control-word
                // encoded; scanning them as text would inject garbage
                if (hasNum && value > 0) k = math.min(n.toLong, k.toLong + value).toInt
              case "info" => inInfo = true; infoDepth = depth
              case w if inInfo && MetaDests.contains(w) =>
                val key = MetaDests(w)
                if (key.nonEmpty && metaUntilDepth < 0) {
                  metaUntilDepth = depth; metaKey = key
                } else if (skipUntilDepth < 0) skipUntilDepth = depth
              case w if SkipDests.contains(w) =>
                if (skipUntilDepth < 0) skipUntilDepth = depth
              case _ => // formatting word: drop
            }
            i = k
          } else i += 2 // unknown control symbol
        case '\r' | '\n' => i += 1 // raw newlines are NOT text in RTF
        case other =>
          emitChar(other)
          i += 1
      }
    }

    val paras = out.toString.split("\n").iterator.map(_.trim).filter(_.nonEmpty).toVector
    val blocks = paras.zipWithIndex.map { case (p, idx) =>
      LayoutBlock(page = idx / 40, kind = "text", text = p,
        x0 = 0f, y0 = (idx % 40) * 18f, x1 = 612f, y1 = (idx % 40) * 18f + 16f)
    }
    RtfResult(blocks, if (blocks.isEmpty) "empty" else "ok", truncated, meta.toMap)
  }
}
