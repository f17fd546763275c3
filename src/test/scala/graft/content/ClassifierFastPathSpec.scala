package graft.content

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Pins BoundaryAlt (word-boundary literal search) to the original
  * `\b(alt|...)\b` regexes it replaced. Inputs are lowercased first, exactly
  * as the classifier lowercases before matching. */
class ClassifierFastPathSpec extends AnyFunSuite {

  private def sample[A](gen: Gen[A], n: Int)(f: A => Unit): Unit =
    (0 until n).foreach(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f))

  private val frag = Seq(
    "subscribe", "subscribed", "resubscribe", "sign up", "signup", "comment",
    "comments", "commentary", "advertise", "advertisement", "advertising",
    "advertis", "read more", "read morex", "share on", "share only",
    "photo by", "image:", "image:x", "image: x", "credit:", "source:",
    "pin it", "pinit", "cookie policy", "all rights reserved", "x", ".", ":",
    "_", " ", "1")

  private val textGen: Gen[String] =
    Gen.listOfN(5, Gen.frequency(
      5 -> Gen.oneOf(frag),
      2 -> Gen.alphaNumStr.map(_.take(5)),
      1 -> Gen.oneOf(" ", ". ", "! ", "_")
    )).map(_.mkString(" ")).map(_.toLowerCase(java.util.Locale.ROOT))

  test("boilerplateAlt == fused boilerplate regex") {
    sample(textGen, 500) { s =>
      assert(Classifier.boilerplateAlt.findIn(s) == Classifier.boilerplateRe.matcher(s).find(), s"'$s'")
    }
  }

  test("mediaCreditAlt == media-credit regex (incl. trailing-colon boundary quirk)") {
    sample(textGen, 500) { s =>
      assert(Classifier.mediaCreditAlt.findIn(s) == Classifier.mediaCreditPattern.matcher(s).find(), s"'$s'")
    }
    // `\b` after ':' needs a following word char — "image:" at end must NOT match
    assert(!Classifier.mediaCreditAlt.findIn("image:"))
    assert(!Classifier.mediaCreditPattern.matcher("image:").find())
    assert(Classifier.mediaCreditAlt.findIn("image:x"))
    assert(Classifier.mediaCreditPattern.matcher("image:x").find())
    assert(!Classifier.mediaCreditAlt.findIn("image: x"))
  }

  test("countTokens == splitWs.count(_.nonEmpty)") {
    val g = Gen.listOf(Gen.frequency(4 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', '\t', '\n', ' ', '　'))).map(_.mkString)
    sample(g, 300) { s =>
      assert(graft.util.Js.countTokens(s) == graft.util.Js.splitWs(s).count(_.nonEmpty), s.map(_.toInt))
    }
  }
}
