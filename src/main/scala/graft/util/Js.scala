package graft.util

/**
 * JavaScript string/regex semantics helpers. The reference is TypeScript;
 * byte-identical outputs require matching JS behaviors that differ from
 * Java's (documented per SURVEY.md §7.4 item 4):
 *
 *  - JS `String.prototype.trim` and regex `\s` include U+00A0 (NBSP),
 *    U+FEFF and the Unicode space separators; Java's `String.trim` and
 *    `\s` do not.
 *  - JS `String.fromCharCode(n)` applies ToUint16 (n mod 65536) — astral
 *    code points written as `&#128169;` decode to a *different* BMP char.
 */
object Js {

  /** Character class body matching JS `\s` (WhiteSpace + LineTerminator). */
  val wsClass: String =
    "\\t\\n\\u000b\\f\\r \\u00a0\\u1680\\u2000-\\u200a\\u2028\\u2029\\u202f\\u205f\\u3000\\ufeff"

  def isJsWs(c: Char): Boolean =
    // fast reject for printable ASCII above space — the overwhelmingly common case
    if (c > ' ' && c < '\u00a0') false
    else if (c <= ' ')
      c == ' ' || c == '\t' || c == '\n' || c == '\u000b' || c == '\f' || c == '\r'
    else
      c == '\u00a0' || c == '\u1680' || (c >= '\u2000' && c <= '\u200a') ||
      c == '\u2028' || c == '\u2029' || c == '\u202f' || c == '\u205f' ||
      c == '\u3000' || c == '\ufeff'

  /** JS `String.prototype.trim`. */
  def trim(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && isJsWs(s.charAt(a))) a += 1
    while (b > a && isJsWs(s.charAt(b - 1))) b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  /** JS `String.fromCharCode` — single arg, ToUint16 semantics. */
  def fromCharCode(code: Long): String = ((code % 65536 + 65536) % 65536).toChar.toString

  private val wsRunPattern = java.util.regex.Pattern.compile("[" + wsClass + "]+")

  /** Split on JS `/\s+/` (like `"a b".split(/\s+/)`) — no trailing empties,
    * but a leading empty element when the string starts with whitespace,
    * matching JS split semantics. (Precompiled — `String.split` with a
    * multi-char regex recompiles the pattern on every call, which JFR showed
    * in the extraction hot path.) */
  def splitWs(s: String): Array[String] =
    if (s.isEmpty) Array("")
    else wsRunPattern.split(s, -1)

  /** Exact hand-rolled equivalent of `replaceAll("[<JS \\s>]{2,}", " ")`:
    * runs of ≥2 JS-whitespace chars collapse to one ASCII space; single
    * whitespace chars are left untouched. This is Readability's innerText
    * normalizer — the hottest regex in the extraction profile (the
    * char-class union predicate alone was 18.5% of executor samples). */
  def collapseWsRuns(s: String): String = {
    var i = 0
    val n = s.length
    // fast path: scan for the first 2-run; most strings have none
    var first = -1
    while (first < 0 && i < n - 1) {
      if (isJsWs(s.charAt(i)) && isJsWs(s.charAt(i + 1))) first = i
      i += 1
    }
    if (first < 0) return s
    val sb = new java.lang.StringBuilder(n)
    sb.append(s, 0, first)
    i = first
    while (i < n) {
      val c = s.charAt(i)
      if (isJsWs(c) && i + 1 < n && isJsWs(s.charAt(i + 1))) {
        sb.append(' ')
        i += 1
        while (i < n && isJsWs(s.charAt(i))) i += 1
      } else {
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  /** Exact equivalent of `splitWs(s).count(_.nonEmpty)` — the number of
    * non-whitespace runs — without materializing the token array. */
  def countTokens(s: String): Int = {
    var count = 0
    var inTok = false
    var i = 0
    while (i < s.length) {
      if (isJsWs(s.charAt(i))) inTok = false
      else if (!inTok) { count += 1; inTok = true }
      i += 1
    }
    count
  }

  /** Exact equivalent of `replaceAll("[<JS \\s>]+", " ")` — every run
    * (including single chars) becomes one ASCII space. */
  def collapseWsAll(s: String): String = {
    var i = 0
    val n = s.length
    var dirty = false
    while (!dirty && i < n) {
      val c = s.charAt(i)
      if (isJsWs(c) && (c != ' ' || (i + 1 < n && isJsWs(s.charAt(i + 1))))) dirty = true
      i += 1
    }
    if (!dirty) return s
    val sb = new java.lang.StringBuilder(n)
    i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (isJsWs(c)) {
        sb.append(' ')
        i += 1
        while (i < n && isJsWs(s.charAt(i))) i += 1
      } else {
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  /** Exact equivalent of Java `replaceAll("[ \\t]+", " ")`. */
  def collapseSpaceTab(s: String): String = {
    var i = 0
    val n = s.length
    var dirty = false
    while (!dirty && i < n) {
      val c = s.charAt(i)
      if (c == '\t' || (c == ' ' && i + 1 < n && (s.charAt(i + 1) == ' ' || s.charAt(i + 1) == '\t'))) dirty = true
      i += 1
    }
    if (!dirty) return s
    val sb = new java.lang.StringBuilder(n)
    i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t') {
        sb.append(' ')
        i += 1
        while (i < n && { val d = s.charAt(i); d == ' ' || d == '\t' }) i += 1
      } else {
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }
}
