package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.content.Normalizer
import graft.ops.{TextOps, VectorOps}
import graft.urlx.UrlOps

/** Property tests (SURVEY.md §5.4): idempotence / bound invariants of the
  * per-row operators that the cluster-scale invariants lean on. */
class PropertySpec extends AnyFunSuite {

  /** scalatestplus isn't resolvable offline — sample generators directly
    * with fixed seeds (deterministic, 100 cases per property). */
  private def forAll[A](gen: Gen[A])(f: A => Unit): Unit =
    (0 until 100).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private def forAll[A, B](genA: Gen[A], genB: Gen[B])(f: (A, B) => Unit): Unit =
    (0 until 100).foreach { i =>
      for {
        a <- genA.apply(Gen.Parameters.default, Seed(i.toLong))
        b <- genB.apply(Gen.Parameters.default, Seed(i.toLong + 1000))
      } f(a, b)
    }

  private val textGen: Gen[String] = Gen.listOf(Gen.frequency(
    8 -> Gen.alphaNumChar, 3 -> Gen.const(' '), 1 -> Gen.const('\n'),
    1 -> Gen.oneOf('&', '<', '#', '[', ']', '(', ')', '.', '!', '?'),
    1 -> Gen.oneOf('é', 'ü', '中', '。')
  )).map(_.mkString)

  test("normalizeString is idempotent") {
    forAll(textGen) { s =>
      val once = Normalizer.normalizeString(s)
      val twice = Normalizer.normalizeString(once)
      assert(once == twice)
    }
  }

  test("truncateText output length ≤ maxChars and truncation flag") {
    forAll(textGen, Gen.chooseNum(1, 200)) { (s, max) =>
      for (strategy <- Seq("sentence", "word", "char")) {
        val (out, truncated) = Normalizer.truncateText(s, max, strategy)
        assert(out.length <= max)
        assert(truncated == (s.length > max))
      }
    }
  }

  test("generateHash is 32 lowercase hex chars and stable") {
    forAll(textGen) { s =>
      val h = Normalizer.generateHash(s)
      assert(h.length == 32 && h.forall(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')))
      assert(h == Normalizer.generateHash(s))
    }
  }

  test("normalizeUrl is idempotent") {
    val urlGen = for {
      host <- Gen.oneOf("example.com", "WWW.Example.COM", "sub.site.org")
      path <- Gen.oneOf("", "/", "/a/b", "/a/b/")
      q <- Gen.oneOf("", "?a=1", "?utm_source=x&a=1", "?ref=r")
    } yield s"https://$host$path$q"
    forAll(urlGen) { u =>
      val once = UrlOps.normalizeUrl(u)
      assert(UrlOps.normalizeUrl(once) == once)
    }
  }

  test("minhash similarity of identical sets is 1; signature deterministic") {
    forAll(Gen.nonEmptyListOf(Gen.alphaStr.suchThat(_.nonEmpty))) { words =>
      val sh = words.toArray
      val a = TextOps.minHash(sh, 32)
      val b = TextOps.minHash(sh, 32)
      assert(a.sameElements(b))
      assert(TextOps.minHashSimilarity(a, b) == 1.0)
    }
  }

  test("simhash hamming distance to self is 0; quality score in [0,1]") {
    forAll(textGen) { s =>
      assert(TextOps.hamming64(TextOps.simHash(s), TextOps.simHash(s)) == 0)
      val q = TextOps.quality(s)
      assert(q.score >= 0.0 && q.score <= 1.0)
    }
  }

  test("vector aggregate average/max dims and normalize unit norm") {
    val vecGen = Gen.chooseNum(1, 8).flatMap(d =>
      Gen.nonEmptyListOf(Gen.listOfN(d, Gen.chooseNum(-10.0f, 10.0f)).map(_.toArray)))
    forAll(vecGen) { vs =>
      val avg = VectorOps.aggregate(vs, "average")
      val mx = VectorOps.aggregate(vs, "max")
      assert(avg.length == vs.head.length && mx.length == vs.head.length)
      (0 until mx.length).foreach(i => assert(mx(i) == vs.map(_(i)).max))
      val n = VectorOps.normalize(vs.head)
      val nn = VectorOps.norm(n)
      if (VectorOps.norm(vs.head) > 1e-3) assert(math.abs(nn - 1.0) < 1e-3)
    }
  }

  // ---- hand-rolled whitespace loops vs their regex oracles (perf rewrites) ----

  private val wsHeavyGen: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaNumChar,
    4 -> Gen.oneOf(' ', '\t', '\n', '\r', '\u000b', '\f'),
    2 -> Gen.oneOf('\u00a0', '\u2003', '\u2028', '\u3000', '\ufeff'),
    1 -> Gen.oneOf('.', '!', '?', '-', '+', '=', '#', '>', '~', '0', '5')
  )).map(_.mkString)

  test("Js.collapseWsRuns == replaceAll(\"[ws]{2,}\", \" \")") {
    val re = java.util.regex.Pattern.compile("[" + graft.util.Js.wsClass + "]{2,}")
    forAll(wsHeavyGen) { s =>
      assert(graft.util.Js.collapseWsRuns(s) == re.matcher(s).replaceAll(" "), s"input=${s.map(_.toInt)}")
    }
  }

  test("Js.collapseWsAll == replaceAll(\"[ws]+\", \" \")") {
    val re = java.util.regex.Pattern.compile("[" + graft.util.Js.wsClass + "]+")
    forAll(wsHeavyGen) { s =>
      assert(graft.util.Js.collapseWsAll(s) == re.matcher(s).replaceAll(" "), s"input=${s.map(_.toInt)}")
    }
  }

  test("Js.collapseSpaceTab == replaceAll(\"[ \\t]+\", \" \")") {
    forAll(wsHeavyGen) { s =>
      assert(graft.util.Js.collapseSpaceTab(s) == s.replaceAll("[ \\t]+", " "), s"input=${s.map(_.toInt)}")
    }
  }
}
