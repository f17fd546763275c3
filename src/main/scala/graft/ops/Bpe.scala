package graft.ops

/**
 * From-scratch byte-level BPE — the published GPT-2 tokenization algorithm
 * (Radford et al. 2019; Sennrich et al. 2016 for the merge learner). A
 * training pipeline budgets sequences in REAL subword tokens, not
 * whitespace runs: packing to a 512-token budget with whitespace counts
 * under-fills every sequence by the subword expansion factor. This module
 * provides the three published pieces:
 *
 *  - the byte↔unicode table (`bytes_to_unicode`): every byte 0-255 maps to
 *    a printable codepoint (printable ASCII/latin-1 to itself, the rest to
 *    U+0100+n), so merges operate on visible "characters" and any byte
 *    sequence round-trips losslessly — no unknown tokens by construction;
 *  - the pre-tokenizer: GPT-2's contraction/word/number/punct/space regex,
 *    with ONE documented deviation — the `\s+(?!\S)` lookahead term is
 *    dropped so the identical pattern runs under RE2 (DuckDB's engine) for
 *    the cross-engine oracle; trailing-space attachment differs only for
 *    runs of 2+ spaces before a word, never for single-space English text;
 *  - the encoder: per pre-token, bytes → symbols, then repeatedly merge
 *    the LOWEST-RANK adjacent pair present (all its occurrences, leftmost
 *    first, non-overlapping) until no ranked pair remains — the exact
 *    GPT-2 `bpe()` loop.
 *
 * The merge table ("vocab") is data, not code: [[learn]] derives one from
 * a corpus with the published count-and-merge-most-frequent loop
 * (deterministic: frequency ties break lexicographically; a candidate
 * whose concatenation collides with an existing symbol is skipped so every
 * merge output is unique — which also makes rank-order sequential replay
 * equivalent to the min-rank loop, the property the DuckDB oracle's
 * chained-replace replay relies on). [[FixtureMerges]] is the frozen
 * fixture table used by the `doc_tokens_bpe` / `bpe_fixture` oracles.
 *
 * Scale shape: tokenization is a narrow per-row map; the merge table is a
 * few KB broadcast inside the expression ([[graft.plans.BpeTokenCount]]
 * ships it as a foldable literal and codegen references the parsed ranks
 * object). A per-JVM word→length cache exploits Zipfian word repetition.
 */
object Bpe {

  /** GPT-2 `bytes_to_unicode`: byte → printable char. */
  val byteToChar: Array[Char] = {
    val printable = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val out = new Array[Char](256)
    var shift = 0
    var b = 0
    while (b < 256) {
      if (printable(b)) out(b) = b.toChar
      else { out(b) = (256 + shift).toChar; shift += 1 }
      b += 1
    }
    out
  }

  /** GPT-2 pre-tokenizer minus the RE2-incompatible lookahead (see class
    * doc). Identical semantics in java.util.regex and RE2 for this
    * pattern: leftmost-first alternation, \p{L}/\p{N} Unicode classes. */
  val PretokenPattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"
  private val pretokenRe = java.util.regex.Pattern.compile(PretokenPattern)

  /** Parsed merge table: pair → rank (lower merges first). Serializable —
    * the Catalyst expression ships it to executors inside the codegen
    * references array; the word cache is transient (rebuilt per JVM). */
  final class Ranks private[Bpe] (
      private[Bpe] val rank: java.util.HashMap[String, Integer],
      val spec: String) extends Serializable {
    @transient private[Bpe] lazy val cache =
      new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    def size: Int = rank.size
    private[Bpe] def of(a: String, b: String): Int = {
      val r = rank.get(a + "\u0000" + b)
      if (r == null) Int.MaxValue else r.intValue()
    }
  }

  /** Serialize merges for shipping as a SQL/Column literal: `left right`
    * pairs joined by `\n`. Both delimiters are PROVABLY absent from every
    * symbol: [[byteToChar]] maps the non-printable bytes 0x20 (space) and
    * 0x0A (newline) into the U+0100+ range, so no byte-unicode symbol can
    * ever contain a raw ' ' or '\n'. (An earlier `;` delimiter was wrong —
    * 0x3B is printable, maps to itself, and a learner CAN emit merges whose
    * symbols contain it, e.g. (";", ";") on semicolon-run text.) */
  def mergesSpec(merges: Seq[(String, String)]): String = {
    merges.foreach { case (a, b) =>
      require(!a.contains(' ') && !b.contains(' ') &&
        !a.contains('\n') && !b.contains('\n'),
        s"merge symbols must not contain the spec delimiters: '$a' '$b'")
    }
    merges.map { case (a, b) => s"$a $b" }.mkString("\n")
  }

  def parseMerges(spec: String): Seq[(String, String)] =
    if (spec == null || spec.isEmpty) Seq.empty
    else spec.split("\n").toIndexedSeq.map { s =>
      val i = s.indexOf(' ')
      require(i > 0 && i < s.length - 1, s"bad merge entry: '$s'")
      (s.substring(0, i), s.substring(i + 1))
    }

  private val ranksCache =
    new java.util.concurrent.ConcurrentHashMap[String, Ranks]()

  /** Parse-once (per JVM) rank table for a merges spec string. */
  def ranksFor(spec: String): Ranks =
    ranksCache.computeIfAbsent(if (spec == null) "" else spec, { s =>
      val m = new java.util.HashMap[String, Integer]()
      parseMerges(s).zipWithIndex.foreach { case ((a, b), i) =>
        m.put(a + "\u0000" + b, Integer.valueOf(i))
      }
      new Ranks(m, s)
    })

  /** One pre-token's byte-unicode rendering. */
  private[ops] def toByteChars(tok: String): String = {
    val bytes = tok.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) { sb.append(byteToChar(bytes(i) & 0xFF)); i += 1 }
    sb.toString
  }

  /** The GPT-2 `bpe()` loop over ONE pre-token (already byte-unicode
    * mapped): min-rank pair, merge all occurrences leftmost-first, repeat. */
  private[ops] def encodeWord(word: String, ranks: Ranks): Array[String] = {
    if (word.isEmpty) return Array.empty
    var syms = new Array[String](word.length)
    var i = 0
    while (i < word.length) { syms(i) = String.valueOf(word.charAt(i)); i += 1 }
    while (syms.length > 1) {
      var best = Int.MaxValue
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.of(syms(j), syms(j + 1))
        if (r < best) best = r
        j += 1
      }
      if (best == Int.MaxValue) return syms
      val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
      j = 0
      while (j < syms.length) {
        if (j < syms.length - 1 && ranks.of(syms(j), syms(j + 1)) == best) {
          out += syms(j) + syms(j + 1); j += 2
        } else { out += syms(j); j += 1 }
      }
      syms = out.toArray
    }
    syms
  }

  /** Subword token count of one pre-token, cached (Zipf: corpus words
    * repeat; the cache is bounded to stay executor-safe). */
  private def wordTokenCount(word: String, ranks: Ranks): Int = {
    val hit = ranks.cache.get(word)
    if (hit != null) return hit.intValue()
    val n = encodeWord(toByteChars(word), ranks).length
    if (ranks.cache.size < 65536) ranks.cache.put(word, Integer.valueOf(n))
    n
  }

  /** BPE token count of a text: pre-tokenize, encode each pre-token, sum. */
  def countTokens(text: String, ranks: Ranks): Int = {
    if (text == null || text.isEmpty) return 0
    val m = pretokenRe.matcher(text)
    var n = 0
    while (m.find()) n += wordTokenCount(m.group(), ranks)
    n
  }

  /** Full token-string encoding (inspection/tests; the count path never
    * materializes this). */
  def encode(text: String, ranks: Ranks): Seq[String] = {
    if (text == null || text.isEmpty) return Seq.empty
    val m = pretokenRe.matcher(text)
    val out = Seq.newBuilder[String]
    while (m.find()) out ++= encodeWord(toByteChars(m.group()), ranks)
    out.result()
  }

  /** Published BPE merge learner (Sennrich et al.): count adjacent symbol
    * pairs across the corpus' pre-tokens, merge the most frequent
    * (lexicographic tiebreak — deterministic on any machine), repeat.
    * Candidates whose concatenation equals an already-produced symbol are
    * skipped (unique outputs ⇒ rank-order replay ≡ min-rank loop). */
  def learn(corpus: Seq[String], numMerges: Int): Seq[(String, String)] = {
    // word frequency over pre-tokens, words as symbol vectors
    val wordFreq = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    corpus.foreach { text =>
      val m = pretokenRe.matcher(if (text == null) "" else text)
      while (m.find()) {
        val w = toByteChars(m.group())
        wordFreq(w) = wordFreq.getOrElse(w, 0L) + 1L
      }
    }
    var words: Vector[(Array[String], Long)] = wordFreq.toVector.map {
      case (w, f) => (w.toCharArray.map(String.valueOf), f)
    }
    val produced = scala.collection.mutable.HashSet.empty[String]
    val merges = Seq.newBuilder[(String, String)]
    var k = 0
    while (k < numMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      val viable = counts.filter { case ((a, b), c) =>
        c > 1 && !produced.contains(a + b)
      }
      if (viable.isEmpty) k = numMerges
      else {
        val ((a, b), _) = viable.maxBy { case ((x, y), c) => (c, x, y) }(
          Ordering.Tuple3(Ordering.Long, Ordering.String.reverse,
            Ordering.String.reverse))
        merges += ((a, b))
        produced += (a + b)
        words = words.map { case (syms, f) =>
          val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              out += a + b; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toArray, f)
        }
        k += 1
      }
    }
    merges.result()
  }

  /** Frozen fixture corpus: the synthetic documents vocabulary plus the
    * pre-tokenizer's edge shapes (contractions, digits, punct runs, multi-
    * space). Merges learned from it actually FIRE on the test corpus. */
  val FixtureCorpus: Seq[String] = Seq(
    "the fast key order sort table scan merge part window small hash scan " +
      "join order batch batch batch stream spark window window dup",
    "the table the window the stream the batch the spark the scan the hash",
    "sort merge join scan order batch stream window table spark hash dup " +
      "key part small fast the the the the",
    "it's can't we're i've i'm we'll i'd 123 456 !! ?? ,, end")

  /** The frozen fixture merge table (learned once, deterministic). */
  val FixtureMerges: Seq[(String, String)] = learn(FixtureCorpus, 24)

  /** Its spec-string form — the literal the oracles and the `tokenizer =
    * "bpe"` training path ship. */
  val FixtureSpec: String = mergesSpec(FixtureMerges)
}
