package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Pins the hand-rolled literal-alternation matchers and comma counter to
  * the original case-insensitive regexes they replaced (kept in
  * `Readability` as test oracles). The generators bias hard toward near-miss
  * fragments of the actual literals, mixed case, and boundary placements. */
class ReadabilityFastPathSpec extends AnyFunSuite {

  private def sample[A](gen: Gen[A], n: Int)(f: A => Unit): Unit =
    (0 until n).foreach(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f))

  private val fragments = Seq(
    "ad", "-ad-", "AD-BREAK", "banner", "Comment", "COMBX", "hid", "hidden",
    "hId", " hid ", "hid ", " hid", "share", "sharedaddy", "author", "byline",
    "p-author", "content", "article", "h-entry", "hentry", "main", "pag",
    "pagination", "rss", "menu", "sidebar", "social", "story", "tags",
    "widget", "meta", "media", "com-", "contact", "x", " ", "_")

  private val classIdGen: Gen[String] =
    Gen.listOfN(4, Gen.frequency(
      6 -> Gen.oneOf(fragments),
      2 -> Gen.alphaNumStr.map(_.take(6)),
      1 -> Gen.const(" ")
    )).map(_.mkString(Gen.const("").sample.getOrElse("")))

  test("unlikelyAlt / okMaybeAlt / positiveAlt / negativeFind / bylineAlt == regex oracles") {
    sample(classIdGen, 400) { s =>
      val l = Readability.asciiLower(s)
      assert(Readability.unlikelyAlt.findIn(l) == Readability.unlikelyCandidatesRe.matcher(s).find(), s"unlikely '$s'")
      assert(Readability.okMaybeAlt.findIn(l) == Readability.okMaybeItsACandidateRe.matcher(s).find(), s"okMaybe '$s'")
      assert(Readability.positiveAlt.findIn(l) == Readability.positiveRe.matcher(s).find(), s"positive '$s'")
      assert(Readability.negativeFind(l) == Readability.negativeRe.matcher(s).find(), s"negative '$s'")
      assert(Readability.bylineAlt.findIn(l) == Readability.bylineRe.matcher(s).find(), s"byline '$s'")
    }
    // targeted hid boundary cases
    for (s <- Seq("hid", "hid x", "x hid", "a hid b", "hidx", "xhid", "HID", " hid", "hid ", "rehid done")) {
      val l = Readability.asciiLower(s)
      assert(Readability.negativeFind(l) == Readability.negativeRe.matcher(s).find(), s"negative hid '$s'")
    }
  }

  test("commaCount == commasRe.split(_, -1).length") {
    val commaGen = Gen.listOf(Gen.frequency(
      5 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(',', '،', '﹐', '︐', '︑', '⹁', '⸴', '⸲', '，'),
      1 -> Gen.const(' ')
    )).map(_.mkString)
    sample(commaGen, 300) { s =>
      assert(Readability.commaCount(s) == Readability.commasRe.split(s, -1).length, s"'$s'")
    }
    assert(Readability.commaCount("") == 1)
  }

  test("asciiLower folds A-Z only (regex CASE_INSENSITIVE semantics, no UNICODE_CASE)") {
    assert(Readability.asciiLower("AbC-Def_01") == "abc-def_01")
    assert(Readability.asciiLower("ÄÖÜK") == "ÄÖÜK") // non-ASCII untouched (incl. Kelvin sign)
    assert(Readability.asciiLower("already lower") == "already lower")
  }
}
