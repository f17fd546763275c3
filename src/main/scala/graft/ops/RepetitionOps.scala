package graft.ops

import scala.collection.mutable

/**
 * Repetition and quality-filter signals for training-data curation, per the
 * published web-corpus filter heuristics (Gopher's quality/repetition rules
 * — Rae et al. 2021, appendix A1.1 — and C4-style symbol/line filters,
 * Raffel et al. 2020). Beyond-reference surface: scrapex has no corpus
 * filtering; these are the operators a 100 TB training pipeline runs after
 * extraction.
 *
 * All pure per-row functions over one document's text — no cross-row state,
 * no shuffle; the corpus pass is a narrow `mapPartitions`. Exact integer
 * counts are emitted (chars/occurrences), never pre-divided ratios, so the
 * driver's DuckDB oracle can reproduce every column exactly and downstream
 * thresholds stay tunable.
 *
 * Precise definitions (every count is deterministic):
 *  - words: `trim` then split on `\s+`; empty text → no words.
 *  - lines: split on `\n`, each trimmed, empties dropped. A line's
 *    duplicate excess = occurrences beyond its first; `dupLines` /
 *    `dupLineChars` sum excess occurrences / their chars.
 *  - paragraphs: split on `\n{2,}`, trimmed, empties dropped; same
 *    excess-occurrence accounting.
 *  - word n-grams are adjacent (sliding window, overlapping), exact tokens
 *    (no case folding — run after the pipeline's own normalization).
 *    `topNCount` = occurrences of the most frequent n-gram;
 *    `topNChars` = max over n-grams occurring MORE THAN ONCE of
 *    occurrences × gram word-chars (spaces excluded) — the repetition
 *    "characters covered" numerator over denominator `wordChars`; 0 when
 *    no n-gram repeats, so short texts don't trip the ratio rules.
 *  - `dupNChars` (n = 5..10): word positions covered by ANY n-gram that
 *    occurs more than once are marked (union, so overlapping repeats are
 *    not double-counted); the value is the summed length of marked words.
 *  - `alphaWords`: words containing at least one ASCII letter `[A-Za-z]`
 *    (ASCII by choice: keeps the DuckDB oracle byte-equal; script-aware
 *    language handling lives in [[TextOps.detectLanguage]]).
 *  - `stopHits`: how many of the 8 Gopher stop words
 *    {the, be, to, of, and, that, have, with} occur in the word set.
 *  - symbols: `nHash` = '#' chars; `nEllipsis` = non-overlapping "..."
 *    occurrences; `bulletLines` = trimmed lines starting "- ", "* " or
 *    "•"; `ellipsisLines` = trimmed lines ending "..." or "…".
 *  - docs longer than [[MaxProfileWords]] words are profiled on the prefix
 *    and flagged `truncated` — never a silent cap (such docs already fail
 *    the 100k max-word rule).
 */
object RepetitionOps {

  /** Word-count bound for a single profile pass (memory guard for the
    * n-gram maps; 2× the Gopher max-words reject threshold). */
  val MaxProfileWords = 200000

  final case class Profile(
      nWords: Int, nDistinctWords: Int, wordChars: Long,
      topWordCount: Int,
      top2Count: Int, top3Count: Int, top4Count: Int,
      top2Chars: Long, top3Chars: Long, top4Chars: Long,
      dup5Chars: Long, dup6Chars: Long, dup7Chars: Long,
      dup8Chars: Long, dup9Chars: Long, dup10Chars: Long,
      nLines: Int, dupLines: Int, lineChars: Long, dupLineChars: Long,
      nParas: Int, dupParas: Int, paraChars: Long, dupParaChars: Long,
      alphaWords: Int, stopHits: Int,
      nHash: Int, nEllipsis: Int,
      bulletLines: Int, ellipsisLines: Int,
      truncated: Boolean) {
    def dupNChars(n: Int): Long = n match {
      case 5 => dup5Chars; case 6 => dup6Chars; case 7 => dup7Chars
      case 8 => dup8Chars; case 9 => dup9Chars; case 10 => dup10Chars
      case _ => throw new IllegalArgumentException(s"dupNChars: n=$n not in 5..10")
    }
  }

  private[graft] val StopWords =
    Set("the", "be", "to", "of", "and", "that", "have", "with")

  // precompiled: String.split(regex) recompiles the pattern per call, and
  // profile() runs per document on every quality/curation path
  private val WsSplit = java.util.regex.Pattern.compile("\\s+")
  private val ParaSplit = java.util.regex.Pattern.compile("\n{2,}")

  /** One-pass (per structure) repetition/quality profile of a document.
    * `maxWords` overrides the [[MaxProfileWords]] guard (tests). */
  def profile(text: String, maxWords: Int = MaxProfileWords): Profile = {
    val t = if (text == null) "" else text

    // ---- words ----
    val trimmed = t.trim
    val allWords: Array[String] =
      if (trimmed.isEmpty) Array.empty else WsSplit.split(trimmed)
    val truncated = allWords.length > maxWords
    val words = if (truncated) allWords.take(maxWords) else allWords
    val nWords = words.length
    var wordChars = 0L
    var alphaWords = 0
    // word -> dense int id; counts indexed by id (the id sequence also
    // backs the allocation-free n-gram hashing below)
    val wordIdOf = new mutable.HashMap[String, Int]()
    val ids = new Array[Int](nWords)
    val idCounts = new mutable.ArrayBuffer[Int]()
    var i = 0
    while (i < nWords) {
      val w = words(i)
      wordChars += w.length
      var hasAlpha = false
      var j = 0
      while (j < w.length && !hasAlpha) {
        val c = w.charAt(j)
        hasAlpha = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
        j += 1
      }
      if (hasAlpha) alphaWords += 1
      val id = wordIdOf.getOrElseUpdate(w, { idCounts += 0; idCounts.length - 1 })
      idCounts(id) += 1
      ids(i) = id
      i += 1
    }
    val topWordCount = if (idCounts.isEmpty) 0 else idCounts.max
    val stopHits = StopWords.count(wordIdOf.contains)

    // prefix word-length sums so gram char-lengths are O(1)
    val prefix = new Array[Long](nWords + 1)
    i = 0
    while (i < nWords) { prefix(i + 1) = prefix(i) + words(i).length; i += 1 }
    @inline def gramChars(start: Int, n: Int): Long = prefix(start + n) - prefix(start)

    // Exact repeated n-grams in two allocation-lean phases (the naive
    // string-key-per-window version dominated the corpus-pass cost): phase
    // 1 counts a 64-bit FNV-style hash of the id window in a primitive
    // LongMap; phase 2 revisits only windows whose hash repeats and groups
    // them by EXACT id-sequence equality (each start compared against the
    // few distinct grams in its hash bucket), so hash collisions cost
    // work, never correctness. Returns the groups (window-start lists) of
    // size >= 2.
    @inline def gramHash(s: Int, n: Int): Long = {
      var h = -3750763034362895579L // FNV-1a 64 offset basis
      var k = s
      while (k < s + n) { h = (h ^ ids(k)) * 1099511628211L; k += 1 }
      h
    }
    @inline def sameGram(a: Int, b: Int, n: Int): Boolean = {
      var k = 0
      while (k < n && ids(a + k) == ids(b + k)) k += 1
      k == n
    }
    def repeatedGroups(n: Int): mutable.ArrayBuffer[mutable.ArrayBuffer[Int]] = {
      val out = new mutable.ArrayBuffer[mutable.ArrayBuffer[Int]]()
      if (nWords < n) return out
      val hashCounts = new mutable.LongMap[Int]()
      var s = 0
      while (s + n <= nWords) {
        val h = gramHash(s, n)
        hashCounts.put(h, hashCounts.getOrElse(h, 0) + 1)
        s += 1
      }
      // groups keyed by hash bucket; within a bucket, one entry per
      // distinct exact gram (first-start representative)
      val buckets = new mutable.LongMap[mutable.ArrayBuffer[mutable.ArrayBuffer[Int]]]()
      s = 0
      while (s + n <= nWords) {
        val h = gramHash(s, n)
        if (hashCounts(h) > 1) {
          val groups = buckets.getOrElseUpdate(h, new mutable.ArrayBuffer[mutable.ArrayBuffer[Int]](1))
          var g = 0
          while (g < groups.length && !sameGram(groups(g).head, s, n)) g += 1
          if (g < groups.length) groups(g) += s
          else { val nb = new mutable.ArrayBuffer[Int](2); nb += s; groups += nb }
        }
        s += 1
      }
      buckets.valuesIterator.foreach(_.foreach(g => if (g.length > 1) out += g))
      out
    }

    // top-n-gram stats (n = 2, 3, 4): occurrences of the most frequent
    // gram (1 when nothing repeats but windows exist), and max over
    // repeated grams of occurrences x gram chars
    def topGram(n: Int): (Int, Long) = {
      if (nWords < n) return (0, 0L)
      var bestCount = 1
      var bestChars = 0L
      repeatedGroups(n).foreach { g =>
        if (g.length > bestCount) bestCount = g.length
        val covered = g.length.toLong * gramChars(g.head, n)
        if (covered > bestChars) bestChars = covered
      }
      (bestCount, bestChars)
    }
    val (top2Count, top2Chars) = topGram(2)
    val (top3Count, top3Chars) = topGram(3)
    val (top4Count, top4Chars) = topGram(4)

    // duplicated-n-gram coverage (n = 5..10): mark word positions covered
    // by any gram occurring >1 time; sum marked word lengths (no double
    // count across overlapping repeats)
    def dupGramChars(n: Int): Long = {
      if (nWords < n) return 0L
      val marked = new Array[Boolean](nWords)
      repeatedGroups(n).foreach { g =>
        g.foreach { st =>
          var k = st
          while (k < st + n) { marked(k) = true; k += 1 }
        }
      }
      var sum = 0L
      var k = 0
      while (k < nWords) { if (marked(k)) sum += words(k).length; k += 1 }
      sum
    }
    val dupChars = (5 to 10).map(dupGramChars).toArray

    // ---- lines / paragraphs (excess-occurrence accounting) ----
    def segStats(segs: Array[String]): (Int, Int, Long, Long) = {
      val kept = segs.iterator.map(_.trim).filter(_.nonEmpty).toArray
      val counts = new mutable.HashMap[String, Int]()
      kept.foreach(l => counts.update(l, counts.getOrElse(l, 0) + 1))
      var dup = 0; var dupCh = 0L; var total = 0L
      counts.foreach { case (l, c) =>
        total += c.toLong * l.length
        if (c > 1) { dup += c - 1; dupCh += (c - 1).toLong * l.length }
      }
      (kept.length, dup, total, dupCh)
    }
    val lines = t.split("\n", -1)
    val (nLines, dupLines, lineChars, dupLineChars) = segStats(lines)
    val (nParas, dupParas, paraChars, dupParaChars) = segStats(ParaSplit.split(t, -1))

    // ---- symbols / line shapes ----
    var nHash = 0
    i = 0
    while (i < t.length) { if (t.charAt(i) == '#') nHash += 1; i += 1 }
    var nEllipsis = 0
    var pos = t.indexOf("...")
    while (pos >= 0) { nEllipsis += 1; pos = t.indexOf("...", pos + 3) }
    var bulletLines = 0
    var ellipsisLines = 0
    lines.foreach { raw =>
      val l = raw.trim
      if (l.nonEmpty) {
        if (l.startsWith("- ") || l.startsWith("* ") || l.startsWith("•")) bulletLines += 1
        if (l.endsWith("...") || l.endsWith("…")) ellipsisLines += 1
      }
    }

    Profile(
      nWords, wordIdOf.size, wordChars, topWordCount,
      top2Count, top3Count, top4Count, top2Chars, top3Chars, top4Chars,
      dupChars(0), dupChars(1), dupChars(2), dupChars(3), dupChars(4), dupChars(5),
      nLines, dupLines, lineChars, dupLineChars,
      nParas, dupParas, paraChars, dupParaChars,
      alphaWords, stopHits, nHash, nEllipsis, bulletLines, ellipsisLines,
      truncated)
  }

  // -------------------------------------------------------------------
  // Gopher-rule filter verdict
  // -------------------------------------------------------------------

  /** Published Gopher quality-filter thresholds (Rae et al. 2021, A1.1);
    * every field overridable. Ratio rules with a zero denominator pass. */
  final case class Thresholds(
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      maxBulletLineFrac: Double = 0.9,
      maxEllipsisLineFrac: Double = 0.3,
      minAlphaWordFrac: Double = 0.8,
      minStopHits: Int = 2,
      maxDupLineFrac: Double = 0.30,
      maxDupParaFrac: Double = 0.30,
      maxDupLineCharFrac: Double = 0.20,
      maxDupParaCharFrac: Double = 0.20,
      maxTop2CharFrac: Double = 0.20,
      maxTop3CharFrac: Double = 0.18,
      maxTop4CharFrac: Double = 0.16,
      // n = 5..10 ladder: 0.15 down to 0.10
      maxDupNCharFrac: Seq[Double] = Seq(0.15, 0.14, 0.13, 0.12, 0.11, 0.10)) {
    require(maxDupNCharFrac.length == 6,
      s"maxDupNCharFrac needs exactly 6 entries (n = 5..10), got ${maxDupNCharFrac.length}")
  }

  final case class Verdict(keep: Boolean, reasons: Vector[String])

  /** Evaluate every rule (no short-circuit — all failing reasons surface,
    * stable order, snake_case codes). */
  def gopherFilter(p: Profile, th: Thresholds = Thresholds()): Verdict = {
    val reasons = Vector.newBuilder[String]
    @inline def frac(num: Long, den: Long): Double =
      if (den == 0L) 0.0 else num.toDouble / den

    if (p.nWords < th.minWords) reasons += "too_few_words"
    if (p.nWords > th.maxWords) reasons += "too_many_words"
    val meanLen = frac(p.wordChars, p.nWords)
    if (p.nWords > 0 && (meanLen < th.minMeanWordLen || meanLen > th.maxMeanWordLen))
      reasons += "mean_word_length"
    if (frac(p.nHash + p.nEllipsis, p.nWords) > th.maxSymbolRatio)
      reasons += "symbol_ratio"
    if (frac(p.bulletLines, p.nLines) > th.maxBulletLineFrac)
      reasons += "bullet_lines"
    if (frac(p.ellipsisLines, p.nLines) > th.maxEllipsisLineFrac)
      reasons += "ellipsis_lines"
    if (p.nWords > 0 && frac(p.alphaWords, p.nWords) < th.minAlphaWordFrac)
      reasons += "alpha_words"
    if (p.stopHits < th.minStopHits) reasons += "stopwords"
    if (frac(p.dupLines, p.nLines) > th.maxDupLineFrac) reasons += "dup_lines"
    if (frac(p.dupParas, p.nParas) > th.maxDupParaFrac) reasons += "dup_paras"
    if (frac(p.dupLineChars, p.lineChars) > th.maxDupLineCharFrac)
      reasons += "dup_line_chars"
    if (frac(p.dupParaChars, p.paraChars) > th.maxDupParaCharFrac)
      reasons += "dup_para_chars"
    if (frac(p.top2Chars, p.wordChars) > th.maxTop2CharFrac) reasons += "top_2gram"
    if (frac(p.top3Chars, p.wordChars) > th.maxTop3CharFrac) reasons += "top_3gram"
    if (frac(p.top4Chars, p.wordChars) > th.maxTop4CharFrac) reasons += "top_4gram"
    var n = 5
    while (n <= 10) {
      if (frac(p.dupNChars(n), p.wordChars) > th.maxDupNCharFrac(n - 5))
        reasons += s"dup_${n}gram"
      n += 1
    }
    val r = reasons.result()
    Verdict(r.isEmpty, r)
  }
}
