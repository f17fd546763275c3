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

  private def isJsWs(c: Char): Boolean =
    c == '\t' || c == '\n' || c == '\u000b' || c == '\f' || c == '\r' || c == ' ' ||
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

  /** Split on JS `/\s+/` (like `"a b".split(/\s+/)`) — no trailing empties,
    * but a leading empty element when the string starts with whitespace,
    * matching JS split semantics. */
  def splitWs(s: String): Array[String] =
    if (s.isEmpty) Array("")
    else s.split("[" + wsClass + "]+", -1)
}
