package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level BPE: the published GPT-2 pieces (byte↔unicode table,
  * pre-tokenizer, min-rank merge loop) plus the learner, the sequential-
  * replay equivalence the DuckDB oracle relies on, and determinism. */
class BpeSpec extends AnyFunSuite {

  private val ranks = Bpe.ranksFor(Bpe.FixtureSpec)

  test("bytes_to_unicode: printables map to themselves, the rest shift") {
    assert(Bpe.byteToChar('a'.toInt) == 'a')
    assert(Bpe.byteToChar('!'.toInt) == '!')
    assert(Bpe.byteToChar(0x20) == 'Ġ') // space → Ġ (chr(288))
    assert(Bpe.byteToChar(0x00) == 'Ā')
    assert(Bpe.byteToChar(0x0A) == ('Ā' + 10).toChar)
    // total injectivity: 256 distinct outputs
    assert(Bpe.byteToChar.distinct.length == 256)
  }

  test("pre-tokenizer: contractions, leading-space words, digits, punct") {
    def pre(s: String): Seq[String] = {
      val m = java.util.regex.Pattern.compile(Bpe.PretokenPattern).matcher(s)
      val out = Seq.newBuilder[String]
      while (m.find()) out += m.group()
      out.result()
    }
    assert(pre("it's fine") == Seq("it", "'s", " fine"))
    assert(pre("we'll go 123!") == Seq("we", "'ll", " go", " 123", "!"))
    assert(pre("a  b") == Seq("a", "  ", "b")) // documented no-lookahead form
    assert(pre("") == Seq.empty)
  }

  test("min-rank loop: hand-checked encodings over the fixture merges") {
    assert(Bpe.encode("the", ranks) == Seq("t", "he"))
    assert(Bpe.encode(" the", ranks) == Seq("Ġthe"))
    assert(Bpe.encode("the the", ranks) == Seq("t", "he", "Ġthe"))
    assert(Bpe.countTokens("", ranks) == 0)
    assert(Bpe.countTokens(null, ranks) == 0)
    // no ranked pair present → one token per byte
    assert(Bpe.countTokens("zzz", ranks) == 3)
  }

  test("encoding round-trips: concatenated tokens reproduce the byte text") {
    for (t <- Bpe.FixtureCorpus :+ "it's  batch?? 99 the window") {
      val joined = Bpe.encode(t, ranks).mkString
      assert(joined == Bpe.toByteChars(t).replace(" ", ""), s"lossy: '$t'")
    }
  }

  test("sequential rank-order replay equals the min-rank loop (oracle contract)") {
    // the DuckDB oracle applies merges once each, in rank order; valid
    // learned tables with unique outputs make that equal to GPT-2's loop
    def sequential(word: String): Int = {
      var syms = Bpe.toByteChars(word).toCharArray.map(String.valueOf).toVector
      Bpe.parseMerges(Bpe.FixtureSpec).foreach { case (a, b) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
            out += a + b; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms.length
    }
    val words = (Bpe.FixtureCorpus.flatMap(_.split(" ")) ++
      Seq("thewindow", "batchbatch", "scans", "windowed", "sparkhash"))
      .flatMap(w => Seq(w, " " + w))
    words.foreach { w =>
      assert(Bpe.encodeWord(Bpe.toByteChars(w), ranks).length == sequential(w),
        s"replay divergence on '$w'")
    }
  }

  test("learner: deterministic, unique outputs, merges actually fire") {
    val again = Bpe.learn(Bpe.FixtureCorpus, 24)
    assert(again == Bpe.FixtureMerges)
    assert(Bpe.FixtureMerges.nonEmpty)
    val outputs = Bpe.FixtureMerges.map { case (a, b) => a + b }
    assert(outputs.distinct.length == outputs.length)
    // compression on in-vocab text: far fewer tokens than bytes
    val t = "the window the window the window"
    assert(Bpe.countTokens(t, ranks) < t.length / 2)
  }

  test("spec round-trip and delimiter guard") {
    assert(Bpe.parseMerges(Bpe.FixtureSpec) == Bpe.FixtureMerges)
    assert(Bpe.parseMerges("") == Seq.empty)
    // the delimiters are ' ' and '\n' — both provably absent from
    // byte-unicode symbols; the guard is a backstop against hand-built pairs
    intercept[IllegalArgumentException](Bpe.mergesSpec(Seq(("a b", "c"))))
    intercept[IllegalArgumentException](Bpe.mergesSpec(Seq(("a\nb", "c"))))
    // ';' IS a legal symbol char (0x3B is printable, maps to itself): a
    // learner can emit (";", ";") and the spec must round-trip it
    val semis = Seq((";", ";"), (";;", ";"))
    assert(Bpe.parseMerges(Bpe.mergesSpec(semis)) == semis)
  }

  test("learn on semicolon-run text produces a shippable spec (the ';' " +
       "delimiter regression)") {
    val corpus = Seq("a;; b;; c;;", "d;; e;; f;;", "g;; h;;")
    val merges = Bpe.learn(corpus, 4)
    assert(merges.exists { case (a, b) => (a + b).contains(";") },
      s"expected a ';' merge from semicolon runs, got $merges")
    val spec = Bpe.mergesSpec(merges) // must NOT throw
    assert(Bpe.parseMerges(spec) == merges)
  }
}
