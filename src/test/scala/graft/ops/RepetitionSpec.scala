package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Unit coverage for the Gopher/C4-style repetition signals: hand-computed
  * small cases (independent of the fixture corpus), edge shapes, the
  * truncation guard, and invariant properties. */
class RepetitionSpec extends AnyFunSuite {

  /** scalatestplus isn't resolvable offline — sample generators directly
    * with fixed seeds (deterministic, 100 cases per property). */
  private def forAll[A](gen: Gen[A])(f: A => Unit): Unit =
    (0 until 100).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  test("word counts, chars, alpha and stop hits on a hand-computed case") {
    val p = RepetitionOps.profile("the cat 42 sat with the cat")
    assert(p.nWords == 7)
    assert(p.nDistinctWords == 5)      // the, cat, 42, sat, with
    assert(p.wordChars == 3 + 3 + 2 + 3 + 4 + 3 + 3)
    assert(p.topWordCount == 2)        // "the" and "cat" both twice
    assert(p.alphaWords == 6)          // "42" has no letter
    assert(p.stopHits == 2)            // the, with
  }

  test("top n-gram: count is raw max; chars only counts repeated grams") {
    // "a b" occurs twice (positions 0,2); all other bigrams once
    val p = RepetitionOps.profile("a b a b c")
    assert(p.top2Count == 2)
    assert(p.top2Chars == 2L * 2)      // 2 occurrences x ("a"+"b").length
    // no trigram repeats -> count 1, chars 0
    assert(p.top3Count == 1 && p.top3Chars == 0L)
  }

  test("dup n-gram marking does not double count overlapping repeats") {
    // the 5-gram "a b c d e" occurs twice, overlapping nothing; all ten
    // word positions marked once each
    val p = RepetitionOps.profile("a b c d e x y a b c d e")
    assert(p.dup5Chars == 10L)         // 10 marked single-char words
    assert(p.dup6Chars == 0L)
    // fully repetitive text: every position marked exactly once
    val q = RepetitionOps.profile(("z " * 30).trim)
    assert(q.dup5Chars == 30L && q.dup10Chars == 30L)
  }

  test("line and paragraph excess-occurrence accounting") {
    val p = RepetitionOps.profile("aa\nbb\naa\n\naa\ncc\n\n  \ndd")
    // lines: aa, bb, aa, aa, cc, dd -> 6 kept; "aa" x3 -> 2 excess, 4 chars
    assert(p.nLines == 6 && p.dupLines == 2 && p.dupLineChars == 4L)
    assert(p.lineChars == 12L)
    // paras (split \n{2,}): "aa\nbb\naa", "aa\ncc", "dd" -> distinct
    assert(p.nParas == 3 && p.dupParas == 0)
  }

  test("symbols and line shapes") {
    val p = RepetitionOps.profile("# one...\n- two\n* three\n• four\nfive…\n....")
    assert(p.nHash == 1)
    assert(p.nEllipsis == 2)           // "one..." and "....": non-overlapping scan
    assert(p.bulletLines == 3)
    assert(p.ellipsisLines == 3)       // "one...", "five…", "...."
  }

  test("empty and null text profile to zeros") {
    for (t <- Seq("", "   ", null)) {
      val p = RepetitionOps.profile(t)
      assert(p.nWords == 0 && p.wordChars == 0L && p.topWordCount == 0)
      assert(p.nLines == 0 && p.nParas == 0 && !p.truncated)
    }
  }

  test("profile word cap marks truncated and bounds work") {
    val p = RepetitionOps.profile("w1 w2 w3 w4 w5 w6", maxWords = 4)
    assert(p.truncated && p.nWords == 4)
    val q = RepetitionOps.profile("w1 w2 w3 w4", maxWords = 4)
    assert(!q.truncated)
  }

  test("gopherFilter: clean long text keeps; each rule fires alone") {
    val clean = (1 to 60).map(i => s"word$i").mkString(" ") + " the and"
    assert(RepetitionOps.gopherFilter(RepetitionOps.profile(clean)).keep)
    val short = RepetitionOps.gopherFilter(RepetitionOps.profile("the and tiny"))
    assert(!short.keep && short.reasons == Vector("too_few_words"))
    // zero denominators pass their ratio rules (empty: only the two
    // count-based rules fire)
    val empty = RepetitionOps.gopherFilter(RepetitionOps.profile(""))
    assert(empty.reasons == Vector("too_few_words", "stopwords"))
  }

  test("gopherFilter reasons are emitted in stable rule order") {
    val spam = ("### " * 30).trim // symbols, few words, no stopwords, repetitive
    val v = RepetitionOps.gopherFilter(RepetitionOps.profile(spam))
    assert(v.reasons == Vector("too_few_words", "symbol_ratio", "alpha_words",
      "stopwords", "top_2gram", "top_3gram", "top_4gram", "dup_5gram",
      "dup_6gram", "dup_7gram", "dup_8gram", "dup_9gram", "dup_10gram"))
  }

  test("property: dup/top char counts never exceed total word chars") {
    val wordGen = Gen.oneOf("a", "bb", "ccc", "the", "and", "data", "flow")
    val textGen = Gen.listOfN(40, wordGen).map(_.mkString(" "))
    forAll(textGen) { t =>
      val p = RepetitionOps.profile(t)
      assert(p.top2Chars <= p.wordChars && p.top3Chars <= p.wordChars && p.top4Chars <= p.wordChars)
      (5 to 10).foreach(n => assert(p.dupNChars(n) <= p.wordChars))
      assert(p.dupLineChars <= p.lineChars && p.dupParaChars <= p.paraChars)
      assert(p.alphaWords <= p.nWords && p.nDistinctWords <= p.nWords)
      // marking is monotone: an (n+1)-gram repeat implies an n-gram repeat
      (5 until 10).foreach(n => assert(p.dupNChars(n) >= p.dupNChars(n + 1)))
    }
  }

  test("fixture expected rows match live profiles (guards fixture drift)") {
    graft.pipeline.RepetitionFixture.docs.foreach { case (name, text) =>
      val got = graft.pipeline.RepetitionFixture.rowFor(name, text)
      val want = graft.pipeline.RepetitionFixture.expectedRows.find(_.test_case == name).get
      assert(got == want, s"fixture row drift for $name")
    }
  }

  test("Thresholds rejects a wrong-length dup-n-gram ladder at construction") {
    intercept[IllegalArgumentException] {
      RepetitionOps.Thresholds(maxDupNCharFrac = Seq(0.15, 0.14, 0.13))
    }
  }
}
