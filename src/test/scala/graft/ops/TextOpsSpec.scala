package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Text-analysis primitives: language-ID tiers, shingle hashing. */
class TextOpsSpec extends AnyFunSuite {

  test("langid: Latin stopword profiles") {
    assert(TextOps.detectLanguage("the quick brown fox is on the hill and it was fine")._1 == "en")
    assert(TextOps.detectLanguage("der Hund und die Katze sind nicht auf dem Tisch mit einem Ball")._1 == "de")
    assert(TextOps.detectLanguage("le chat et les chiens sont dans la maison avec une souris")._1 == "fr")
    assert(TextOps.detectLanguage("")._1 == "und")
    assert(TextOps.detectLanguage("12345 67890 ???")._1 == "und")
  }

  test("langid: script tier — CJK with kana/hangul discrimination") {
    assert(TextOps.detectLanguage("機械学習は人工知能の一分野であり、データから学習します。")._1 == "ja")
    assert(TextOps.detectLanguage("机器学习是人工智能的一个分支，它从数据中学习模式。")._1 == "zh")
    assert(TextOps.detectLanguage("기계 학습은 인공 지능의 한 분야이며 데이터에서 학습합니다.")._1 == "ko")
  }

  test("langid: script tier — Cyrillic, Arabic, Devanagari, Greek") {
    assert(TextOps.detectLanguage("машинное обучение является областью искусственного интеллекта")._1 == "ru")
    assert(TextOps.detectLanguage("التعلم الآلي هو فرع من فروع الذكاء الاصطناعي")._1 == "ar")
    assert(TextOps.detectLanguage("मशीन लर्निंग कृत्रिम बुद्धिमत्ता की एक शाखा है")._1 == "hi")
    assert(TextOps.detectLanguage("η μηχανική μάθηση είναι κλάδος της τεχνητής νοημοσύνης")._1 == "el")
  }

  test("langid: mixed text falls back to the dominant tier") {
    // mostly English with a few CJK chars: script share below threshold
    val mixed = "the model is trained on the data and it was evaluated 好"
    assert(TextOps.detectLanguage(mixed)._1 == "en")
  }

  test("shingleHashSig: bit-identical to the unfused shingleHashes/minHash composition") {
    // the r8 fused front half (one split, incremental FNV, single pass)
    // must reproduce the r7 composition EXACTLY — the dedup oracles hash
    // these values
    val rnd = new scala.util.Random(2026)
    val lexicon = Array("alpha", "beta", "Gamma", "δέλτα", "42", "naïve",
      "x", "", "foo-bar", "line\nbreak", "tab\tsep", "ünïcode", "日本語",
      "punct...", "MiXeD")
    val cases = Seq("", " ", "one", "one two", "one two three four") ++
      (0 until 200).map { _ =>
        (0 until rnd.nextInt(60)).map(_ => lexicon(rnd.nextInt(lexicon.length)))
          .mkString(Seq(" ", "  ", ", ", "! ")(rnd.nextInt(4)))
      }
    for (t <- cases; n <- Seq(3, 5); k <- Seq(8, 64)) {
      val sh = TextOps.shingles(t, n)
      val expHashes = TextOps.shingleHashes(sh)
      val expSig = TextOps.minHash(sh, k)
      val (gotHashes, gotSig) = TextOps.shingleHashSig(t, n, k)
      assert(gotHashes.sameElements(expHashes), s"hashes diverge for n=$n: '$t'")
      assert(gotSig.sameElements(expSig), s"sig diverges for n=$n k=$k: '$t'")
    }
  }

  test("shingleHashes: distinct + sorted; jaccardSorted equals string jaccard") {
    val a = TextOps.shingles("the quick brown fox jumps over the lazy dog entirely", 3)
    val b = TextOps.shingles("the quick brown fox jumps over a lazy dog entirely", 3)
    val ha = TextOps.shingleHashes(a)
    val hb = TextOps.shingleHashes(b)
    assert(ha.sorted.sameElements(ha))
    assert(ha.distinct.length == ha.length)
    assert(math.abs(TextOps.jaccardSorted(ha, hb) - TextOps.jaccard(a, b)) < 1e-12)
    assert(TextOps.jaccardSorted(ha, ha) == 1.0)
    assert(TextOps.jaccardSorted(Array.empty[Long], Array.empty[Long]) == 1.0)
  }
}
