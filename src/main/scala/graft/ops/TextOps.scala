package graft.ops

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/**
 * Text-analysis and dedup primitives for large-scale training-data pipelines
 * (builder-prompt first-class components): language-ID (stopword/char n-gram
 * heuristic), quality scoring (length/punct/stopword ratios), token counting
 * (whitespace + BPE-ish regex), rolling-hash fingerprinting, MinHash and
 * SimHash signatures, n-gram shingles for Jaccard.
 *
 * All pure per-row functions; the cross-row parts (LSH band bucketing,
 * groupBy joins) are plain Spark ops in SparkEntry. Deterministic — no
 * wall-clock, no per-JVM randomness (hash seeds are compile-time constants).
 */
object TextOps {

  // ---- language ID (tiny stopword-profile heuristic) ----

  /** Tie-break order for the stopword tier (exposed for the DuckDB replay
    * oracle). */
  private[graft] val profileOrder: Vector[String] =
    Vector("en", "de", "fr", "es", "it", "pt")

  private[graft] val profiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "as", "his", "on", "be", "at", "by", "this"),
    "de" -> Set("der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "nicht", "ein", "eine", "auf", "für", "im", "dem"),
    "fr" -> Set("le", "la", "les", "et", "de", "des", "un", "une", "est", "dans", "que", "qui", "pour", "pas", "sur", "avec"),
    "es" -> Set("el", "la", "los", "las", "de", "que", "y", "en", "un", "una", "es", "por", "con", "para", "del", "se"),
    "it" -> Set("il", "la", "di", "che", "e", "un", "una", "per", "con", "del", "non", "sono", "nel", "alla"),
    "pt" -> Set("o", "a", "os", "as", "de", "que", "e", "do", "da", "em", "um", "uma", "para", "com", "não", "por")
  )

  /** Returns (lang, confidence). "und" when nothing matches.
    * Two tiers: a Unicode-script scan first (CJK with kana/hangul
    * discrimination, Cyrillic, Arabic, Devanagari, Greek, Hebrew, Thai — the
    * scripts stopword profiles cannot see), then the Latin stopword-profile
    * vote. Script detection samples the first 2000 chars. */
  def detectLanguage(text: String): (String, Double) = {
    if (text == null || text.isEmpty) return ("und", 0.0)

    // tier 1: script scan
    val n = math.min(text.length, 2000)
    var letters = 0
    var han = 0; var kana = 0; var hangul = 0
    var cyr = 0; var arab = 0; var deva = 0; var greek = 0; var hebrew = 0; var thai = 0
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (Character.isLetter(c)) {
        letters += 1
        val cp: Int = c
        if ((cp >= 0x4e00 && cp <= 0x9fff) || (cp >= 0x3400 && cp <= 0x4dbf)) han += 1
        else if (cp >= 0x3040 && cp <= 0x30ff) kana += 1
        else if ((cp >= 0xac00 && cp <= 0xd7af) || (cp >= 0x1100 && cp <= 0x11ff)) hangul += 1
        else if (cp >= 0x0400 && cp <= 0x04ff) cyr += 1
        else if (cp >= 0x0600 && cp <= 0x06ff) arab += 1
        else if (cp >= 0x0900 && cp <= 0x097f) deva += 1
        else if (cp >= 0x0370 && cp <= 0x03ff) greek += 1
        else if (cp >= 0x0590 && cp <= 0x05ff) hebrew += 1
        else if (cp >= 0x0e00 && cp <= 0x0e7f) thai += 1
      }
      i += 1
    }
    if (letters > 0) {
      val cjk = han + kana + hangul
      def conf(k: Int) = k.toDouble / letters
      if (conf(cjk) > 0.3) {
        // kana ⇒ Japanese (Japanese text always mixes kana in); hangul ⇒
        // Korean; Han alone ⇒ Chinese
        if (kana.toDouble / math.max(1, cjk) > 0.05) return ("ja", conf(cjk))
        if (hangul.toDouble / math.max(1, cjk) > 0.5) return ("ko", conf(cjk))
        return ("zh", conf(cjk))
      }
      if (conf(cyr) > 0.5) return ("ru", conf(cyr))
      if (conf(arab) > 0.5) return ("ar", conf(arab))
      if (conf(deva) > 0.5) return ("hi", conf(deva))
      if (conf(greek) > 0.5) return ("el", conf(greek))
      if (conf(hebrew) > 0.5) return ("he", conf(hebrew))
      if (conf(thai) > 0.5) return ("th", conf(thai))
    }

    // tier 2: Latin stopword profiles
    val words = NonLetterSplit.split(text.toLowerCase(java.util.Locale.ROOT))
      .iterator.filter(_.nonEmpty).take(500).toArray
    if (words.isEmpty) return ("und", 0.0)
    var bestLang = "und"
    var bestHits = 0
    // DECLARED tie-break order (first max wins) — iterating the Map would
    // tie-break by HashMap internals, which a JVM/Scala upgrade could
    // silently reshuffle; the DuckDB oracle replays this exact order
    profileOrder.foreach { lang =>
      val stops = profiles(lang)
      var hits = 0
      var i = 0
      while (i < words.length) { if (stops.contains(words(i))) hits += 1; i += 1 }
      if (hits > bestHits) { bestHits = hits; bestLang = lang }
    }
    if (bestHits == 0) ("und", 0.0) else (bestLang, bestHits.toDouble / words.length)
  }

  // ---- quality scoring ----

  final case class Quality(
      nChars: Int, nWords: Int, meanWordLen: Double,
      punctRatio: Double, stopwordRatio: Double, upperRatio: Double,
      digitRatio: Double, score: Double)

  def quality(text: String): Quality = {
    if (text == null || text.isEmpty) return Quality(0, 0, 0, 0, 0, 0, 0, 0)
    val n = text.length
    var punct = 0; var upper = 0; var digit = 0
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (c == '.' || c == ',' || c == '!' || c == '?' || c == ';' || c == ':') punct += 1
      if (Character.isUpperCase(c)) upper += 1
      if (Character.isDigit(c)) digit += 1
      i += 1
    }
    val words = WsSplit.split(text.toLowerCase(java.util.Locale.ROOT)).filter(_.nonEmpty)
    val nWords = words.length
    val meanWordLen = if (nWords == 0) 0.0 else words.map(_.length).sum.toDouble / nWords
    val en = profiles("en")
    val stopHits = words.count(w => en.contains(NonLetter.matcher(w).replaceAll("")))
    val stopRatio = if (nWords == 0) 0.0 else stopHits.toDouble / nWords
    val punctRatio = punct.toDouble / n
    val upperRatio = upper.toDouble / n
    val digitRatio = digit.toDouble / n
    // heuristic composite in [0,1]: long enough, sane word lengths, some
    // stopwords, not shouty, not digit soup
    val lenScore = math.min(1.0, nWords / 100.0)
    val wordLenScore = if (meanWordLen >= 3 && meanWordLen <= 10) 1.0 else 0.3
    val stopScore = math.min(1.0, stopRatio / 0.25)
    val shoutPenalty = if (upperRatio > 0.3) 0.3 else 1.0
    val digitPenalty = if (digitRatio > 0.3) 0.3 else 1.0
    val score = lenScore * 0.3 + wordLenScore * 0.2 + stopScore * 0.3 + 0.2 * shoutPenalty * digitPenalty
    Quality(n, nWords, meanWordLen, punctRatio, stopRatio, upperRatio, digitRatio, score)
  }

  // ---- token counting ----

  /** Whitespace token count. */
  def wsTokens(text: String): Int =
    if (text == null || text.isEmpty) 0 else WsSplit.split(text).count(_.nonEmpty)

  private val bpePattern = java.util.regex.Pattern.compile(
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+")

  /** BPE-ish token count (GPT-2-style pre-tokenizer regex, public). */
  def bpeTokens(text: String): Int = {
    if (text == null || text.isEmpty) return 0
    val m = bpePattern.matcher(text)
    var c = 0
    while (m.find()) if (!m.group().forall(Character.isWhitespace)) c += 1
    c
  }

  // ---- hashing / fingerprints ----

  private val hexChars = "0123456789abcdef".toCharArray

  def sha256Hex(text: String): String = {
    val md = MessageDigest.getInstance("SHA-256")
    val bytes = md.digest(text.getBytes(StandardCharsets.UTF_8))
    val out = new Array[Char](64)
    var i = 0
    while (i < 32) {
      out(2 * i) = hexChars((bytes(i) & 0xf0) >> 4)
      out(2 * i + 1) = hexChars(bytes(i) & 0x0f)
      i += 1
    }
    new String(out)
  }

  /** Karp–Rabin rolling-hash document fingerprint: min-sampled k of the
    * rolling window hashes (winnowing-style, deterministic). */
  def fingerprint(text: String, window: Int = 16, k: Int = 8): Array[Long] = {
    if (text == null || text.length < window) return Array(fnv64(text))
    val n = text.length
    val B = 1000003L
    var pow = 1L
    var i = 0
    while (i < window - 1) { pow *= B; i += 1 }
    var h = 0L
    val hashes = new Array[Long](n - window + 1)
    i = 0
    while (i < n) {
      if (i >= window) h -= pow * text.charAt(i - window)
      h = h * B + text.charAt(i)
      if (i >= window - 1) hashes(i - window + 1) = mix64(h)
      i += 1
    }
    java.util.Arrays.sort(hashes)
    hashes.distinct.take(k)
  }

  def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    if (s == null) return h
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  // ---- shingles / MinHash / SimHash ----

  // precompiled split/strip patterns — String.split(regex) and
  // String.replaceAll recompile the pattern on EVERY call, and these run
  // per document (often per word) on the hot dedup/quality paths
  private val NonWordSplit = java.util.regex.Pattern.compile("[^\\p{L}\\p{N}]+")
  private val NonLetterSplit = java.util.regex.Pattern.compile("[^\\p{L}]+")
  private val NonLetter = java.util.regex.Pattern.compile("[^\\p{L}]")
  private val WsSplit = java.util.regex.Pattern.compile("\\s+")

  /** Lowercased word n-gram shingles (the usual 5-gram dedup setting). */
  def shingles(text: String, n: Int = 5): Array[String] = {
    val words = NonWordSplit.split(text.toLowerCase(java.util.Locale.ROOT)).filter(_.nonEmpty)
    if (words.length < n) {
      if (words.isEmpty) Array.empty else Array(words.mkString(" "))
    } else
      (0 to words.length - n).map(i => words.slice(i, i + n).mkString(" ")).toArray
  }

  /** FNV-1a 64 over the words `[from, until)` joined by single spaces —
    * bit-identical to `fnv64(words.slice(from, until).mkString(" "))`
    * without materializing the joined string. */
  private def fnvWords(words: Array[String], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var w = from
    while (w < until) {
      if (w > from) { h ^= ' '; h *= 0x100000001b3L }
      val s = words(w)
      var i = 0
      while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
      w += 1
    }
    h
  }

  /** Fused shingle front half of the MinHash dedup chains: returns
    * `(sortedDistinctShingleHashes, minhashSignature)` — bit-identical to
    * `(shingleHashes(shingles(text, n)), minHash(shingles(text, n), k))`
    * (TextOpsSpec pins the equivalence on a seeded sweep) but with ONE
    * word split, no shingle-string materialization (the r7 form built and
    * garbage-collected one ~40-char string per shingle) and one FNV pass
    * per shingle instead of two (guide §1.2 step 2: per-task work). */
  def shingleHashSig(text: String, n: Int, k: Int): (Array[Long], Array[Long]) = {
    val words = NonWordSplit.split(text.toLowerCase(java.util.Locale.ROOT)).filter(_.nonEmpty)
    val sig = Array.fill(k)(Long.MaxValue)
    if (words.isEmpty) return (Array.emptyLongArray, sig)
    val short = words.length < n
    val nSh = if (short) 1 else words.length - n + 1
    val hashes = new Array[Long](nSh)
    var i = 0
    while (i < nSh) {
      val base = fnvWords(words, i, if (short) words.length else i + n)
      hashes(i) = base
      var j = 0
      while (j < k) {
        val h = mix64(base ^ (0x9e3779b97f4a7c15L * (j + 1)))
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    java.util.Arrays.sort(hashes)
    // in-place dedup of the sorted array (same as shingleHashes)
    var w = 0
    i = 0
    while (i < hashes.length) {
      if (w == 0 || hashes(i) != hashes(w - 1)) { hashes(w) = hashes(i); w += 1 }
      i += 1
    }
    (if (w == hashes.length) hashes else java.util.Arrays.copyOf(hashes, w), sig)
  }

  /** MinHash signature of k permutations via k seeded mixes of one base hash. */
  def minHash(shingleSet: Array[String], k: Int = 64): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < shingleSet.length) {
      val base = fnv64(shingleSet(i))
      var j = 0
      while (j < k) {
        val h = mix64(base ^ (0x9e3779b97f4a7c15L * (j + 1)))
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    sig
  }

  /** LSH band keys: group `bandSize` signature slots per band → one 64-bit key each. */
  def lshBands(sig: Array[Long], bandSize: Int = 4): Array[Long] = {
    val nBands = sig.length / bandSize
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var h = 0xcbf29ce484222325L ^ b
      var j = 0
      while (j < bandSize) { h = mix64(h ^ sig(b * bandSize + j)); j += 1 }
      out(b) = h
      b += 1
    }
    out
  }

  def jaccard(a: Array[String], b: Array[String]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    val sa = a.toSet; val sb = b.toSet
    val inter = sa.intersect(sb).size
    val union = sa.size + sb.size - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  /** Distinct, sorted 64-bit hashes of the shingle set — 8 bytes per shingle
    * instead of ~40-char strings when shipped through a shuffle. Jaccard over
    * these equals string-set Jaccard modulo 64-bit collisions (~n²/2⁶⁵). */
  def shingleHashes(sh: Array[String]): Array[Long] = {
    val out = new Array[Long](sh.length)
    var i = 0
    while (i < sh.length) { out(i) = fnv64(sh(i)); i += 1 }
    java.util.Arrays.sort(out)
    // in-place dedup of the sorted array
    var w = 0
    i = 0
    while (i < out.length) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    if (w == out.length) out else java.util.Arrays.copyOf(out, w)
  }

  /** Exact Jaccard over two distinct-sorted hash arrays (sort-merge, no sets). */
  def jaccardSorted(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    val union = a.length + b.length - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  def minHashSimilarity(a: Array[Long], b: Array[Long]): Double = {
    var same = 0
    var i = 0
    while (i < a.length) { if (a(i) == b(i)) same += 1; i += 1 }
    same.toDouble / a.length
  }

  /** 64-bit SimHash over word features. */
  def simHash(text: String): Long = {
    val words = NonWordSplit.split(text.toLowerCase(java.util.Locale.ROOT)).filter(_.nonEmpty)
    if (words.isEmpty) return 0L
    val v = new Array[Int](64)
    words.foreach { w =>
      val h = mix64(fnv64(w))
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) v(bit) += 1 else v(bit) -= 1
        bit += 1
      }
    }
    var out = 0L
    var bit = 0
    while (bit < 64) { if (v(bit) > 0) out |= (1L << bit); bit += 1 }
    out
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
