package graft.dom

/**
 * HTML character-reference decoding for the tokenizer (text + attribute
 * values), following the HTML5 rules the corpus exercises: named references,
 * decimal/hex numeric references with the windows-1252 remap for 0x80–0x9F,
 * U+FFFD for NUL/surrogates/out-of-range, legacy semicolon-less forms for
 * the classic HTML4 set.
 *
 * NOTE: this is the *parser's* decoder. The normalizer's entity decode
 * (reference `src/content/normalizer.ts:33-41`) is a separate, deliberately
 * quirky JS replication living in `graft.content.Normalizer`.
 */
object Entities {

  /** Common named entities (HTML5 subset; extend as corpus demands). */
  val named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "copy" -> "©", "reg" -> "®", "trade" -> "™",
    "mdash" -> "—", "ndash" -> "–", "hellip" -> "…",
    "lsquo" -> "‘", "rsquo" -> "’", "ldquo" -> "“", "rdquo" -> "”",
    "laquo" -> "«", "raquo" -> "»", "middot" -> "·", "bull" -> "•",
    "sect" -> "§", "para" -> "¶", "deg" -> "°", "plusmn" -> "±",
    "times" -> "×", "divide" -> "÷", "frac12" -> "½", "frac14" -> "¼",
    "sup2" -> "²", "sup3" -> "³", "micro" -> "µ", "cent" -> "¢",
    "pound" -> "£", "yen" -> "¥", "euro" -> "€", "curren" -> "¤",
    "iexcl" -> "¡", "iquest" -> "¿", "szlig" -> "ß",
    "agrave" -> "à", "aacute" -> "á", "acirc" -> "â", "atilde" -> "ã",
    "auml" -> "ä", "aring" -> "å", "aelig" -> "æ", "ccedil" -> "ç",
    "egrave" -> "è", "eacute" -> "é", "ecirc" -> "ê", "euml" -> "ë",
    "igrave" -> "ì", "iacute" -> "í", "icirc" -> "î", "iuml" -> "ï",
    "ntilde" -> "ñ", "ograve" -> "ò", "oacute" -> "ó", "ocirc" -> "ô",
    "otilde" -> "õ", "ouml" -> "ö", "oslash" -> "ø",
    "ugrave" -> "ù", "uacute" -> "ú", "ucirc" -> "û", "uuml" -> "ü",
    "yacute" -> "ý", "yuml" -> "ÿ",
    "Agrave" -> "À", "Aacute" -> "Á", "Auml" -> "Ä", "Eacute" -> "É",
    "Ouml" -> "Ö", "Uuml" -> "Ü", "Ntilde" -> "Ñ", "Ccedil" -> "Ç",
    "larr" -> "←", "uarr" -> "↑", "rarr" -> "→", "darr" -> "↓",
    "harr" -> "↔", "dagger" -> "†", "Dagger" -> "‡", "permil" -> "‰",
    "prime" -> "′", "Prime" -> "″", "minus" -> "−", "lowast" -> "∗",
    "infin" -> "∞", "ne" -> "≠", "le" -> "≤", "ge" -> "≥",
    "sum" -> "∑", "prod" -> "∏", "radic" -> "√", "asymp" -> "≈",
    "alpha" -> "α", "beta" -> "β", "gamma" -> "γ", "delta" -> "δ",
    "epsilon" -> "ε", "lambda" -> "λ", "mu" -> "μ", "pi" -> "π",
    "sigma" -> "σ", "omega" -> "ω", "Omega" -> "Ω", "Delta" -> "Δ",
    // HTML5 capital-letter references are DISTINCT entries, not case
    // variants ("Pi;" → Π while "NBSP;" is not a reference at all)
    "Alpha" -> "Α", "Beta" -> "Β", "Gamma" -> "Γ", "Epsilon" -> "Ε",
    "Lambda" -> "Λ", "Mu" -> "Μ", "Pi" -> "Π", "Sigma" -> "Σ",
    "AMP" -> "&", "GT" -> ">", "LT" -> "<", "QUOT" -> "\"",
    "COPY" -> "©", "REG" -> "®", "TRADE" -> "™",
    "shy" -> "­", "ensp" -> " ", "emsp" -> " ", "thinsp" -> " ",
    "zwnj" -> "‌", "zwj" -> "‍", "lrm" -> "‎", "rlm" -> "‏",
    "sbquo" -> "‚", "bdquo" -> "„", "dollar" -> "$", "percnt" -> "%",
    "num" -> "#", "ast" -> "*", "commat" -> "@", "sol" -> "/", "bsol" -> "\\",
    "colon" -> ":", "semi" -> ";", "equals" -> "=", "quest" -> "?", "excl" -> "!",
    "lpar" -> "(", "rpar" -> ")", "lbrack" -> "[", "rbrack" -> "]",
    "lbrace" -> "{", "rbrace" -> "}", "vert" -> "|", "tilde" -> "~", "grave" -> "`",
    "oelig" -> "œ", "OElig" -> "Œ", "scaron" -> "š", "Scaron" -> "Š",
    "fnof" -> "ƒ", "circ" -> "ˆ", "tilde2" -> "˜"
  )

  /** Legacy HTML4 names valid without a trailing semicolon. */
  private val legacyNoSemi: Set[String] = Set(
    "amp", "lt", "gt", "quot", "nbsp", "copy", "reg",
    "agrave", "aacute", "auml", "eacute", "ouml", "uuml", "szlig", "ntilde",
    "Agrave", "Aacute", "Auml", "Eacute", "Ouml", "Uuml", "Ntilde", "Ccedil",
    "ccedil", "pound", "yen", "cent", "sect", "para", "middot", "laquo", "raquo",
    "iexcl", "iquest", "deg", "plusmn", "micro", "times", "divide", "shy",
    "frac12", "frac14", "sup2", "sup3", "curren"
  )

  /** windows-1252 remap for numeric refs in 0x80–0x9F (HTML5 §13.2.5.80). */
  private val cp1252: Map[Int, Int] = Map(
    0x80 -> 0x20ac, 0x82 -> 0x201a, 0x83 -> 0x0192, 0x84 -> 0x201e, 0x85 -> 0x2026,
    0x86 -> 0x2020, 0x87 -> 0x2021, 0x88 -> 0x02c6, 0x89 -> 0x2030, 0x8a -> 0x0160,
    0x8b -> 0x2039, 0x8c -> 0x0152, 0x8e -> 0x017d, 0x91 -> 0x2018, 0x92 -> 0x2019,
    0x93 -> 0x201c, 0x94 -> 0x201d, 0x95 -> 0x2022, 0x96 -> 0x2013, 0x97 -> 0x2014,
    0x98 -> 0x02dc, 0x99 -> 0x2122, 0x9a -> 0x0161, 0x9b -> 0x203a, 0x9c -> 0x0153,
    0x9e -> 0x017e, 0x9f -> 0x0178
  )

  /**
   * Decode character references in `s`. `inAttribute` applies the HTML5 rule
   * that `&name=`-style runs inside attribute values are left verbatim.
   */
  def decode(s: String, inAttribute: Boolean = false): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    val n = s.length
    var i = 0
    while (i < n) {
      if (s.charAt(i) == '&') {
        val consumed = decodeOne(s, i, inAttribute, sb)
        if (consumed == 0) { sb.append('&'); i += 1 } else i += consumed
      } else {
        var next = s.indexOf('&', i)
        if (next < 0) next = n
        sb.append(s, i, next)
        i = next
      }
    }
    sb.toString
  }

  /** Try to decode one reference at s(start)=='&'; returns chars consumed (0 = literal '&'). */
  private def decodeOne(s: String, start: Int, inAttribute: Boolean, sb: java.lang.StringBuilder): Int = {
    val n = s.length
    var i = start + 1
    if (i >= n) return 0
    val c = s.charAt(i)
    if (c == '#') {
      i += 1
      if (i >= n) return 0
      var hex = false
      if (s.charAt(i) == 'x' || s.charAt(i) == 'X') { hex = true; i += 1 }
      val digStart = i
      while (i < n && isDigitOf(s.charAt(i), hex)) i += 1
      if (i == digStart) return 0
      var cp = 0L
      var j = digStart
      while (j < i) {
        cp = cp * (if (hex) 16 else 10) + Character.digit(s.charAt(j), if (hex) 16 else 10)
        if (cp > 0x7fffffffL) cp = 0x7fffffffL
        j += 1
      }
      if (i < n && s.charAt(i) == ';') i += 1
      var code = cp.toInt
      if (cp1252.contains(code)) code = cp1252(code)
      else if (code == 0 || code > 0x10ffff || (code >= 0xd800 && code <= 0xdfff)) code = 0xfffd
      sb.appendCodePoint(code)
      i - start
    } else if (Character.isLetterOrDigit(c)) {
      val nameStart = i
      while (i < n && Character.isLetterOrDigit(s.charAt(i))) i += 1
      val name = s.substring(nameStart, i)
      val hasSemi = i < n && s.charAt(i) == ';'
      if (hasSemi) {
        // CASE-SENSITIVE only: the HTML5 named-reference table distinguishes
        // case ("Pi;" → Π vs "pi;" → π; "NBSP;" is not a reference and stays
        // literal) — the former blanket lowercase fallback decoded invalid
        // casings and collided case-distinct pairs; the valid uppercase
        // forms (AMP;, COPY;, Greek capitals…) are explicit table entries
        named.get(name) match {
          case Some(v) => sb.append(v); i + 1 - start
          case None    => 0
        }
      } else {
        // legacy semicolon-less: longest matching prefix from the legacy set
        var k = name.length
        while (k > 1) {
          val pre = name.substring(0, k)
          if (legacyNoSemi.contains(pre) || legacyNoSemi.contains(pre.toLowerCase)) {
            // in attributes, &name followed by '=' or alnum stays literal
            val after = nameStart + k
            if (inAttribute && after < n && (s.charAt(after) == '=' || Character.isLetterOrDigit(s.charAt(after)))) return 0
            sb.append(named.getOrElse(pre, named(pre.toLowerCase)))
            return nameStart + k - start
          }
          k -= 1
        }
        0
      }
    } else 0
  }

  private def isDigitOf(c: Char, hex: Boolean): Boolean =
    if (hex) (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
    else c >= '0' && c <= '9'
}
