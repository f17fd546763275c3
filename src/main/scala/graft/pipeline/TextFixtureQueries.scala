package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.TextOps

/**
 * Fixture-anchored driver oracles for the three text-analysis operators that
 * were rows-only until round 4 (VERDICT r3 #4): language-ID, quality
 * scoring, and winnowing fingerprints, over hand-constructed inputs whose
 * expected cells are INDEPENDENTLY derivable:
 *
 *  - langid: stopword-hit counts and script-character fractions counted by
 *    hand from the case texts (e.g. 8 of 12 words of `en_simple` are in the
 *    English stopword profile → ("en", 8/12));
 *  - quality: every ratio recomputed by hand from the case text (char,
 *    word, punct, upper, digit counts and the documented score formula);
 *  - fingerprint: short (< window) texts reduce to a single FNV-1a 64 hash
 *    — the oracle values were cross-checked against an independent Python
 *    implementation of the published FNV-1a parameters; long texts pin
 *    structural consequences of winnowing that follow from the definition
 *    (a single repeated character has ONE distinct window hash; min-k
 *    sampling is length-invariant for it).
 *
 * The corpus-scale `langid_pages` / `quality_pages` / `fingerprint_pages`
 * queries remain the rows-only scale counterparts.
 */
object TextFixtureQueries {

  private def r4(x: Double): String = (math.round(x * 10000) / 10000.0).toString

  // ---- language ID ----

  private val langCases: Seq[(String, String)] = Seq(
    // 12 words; en stopword hits: the,on,the,and,it,was,with,this = 8 → 8/12
    "en_simple" -> "The cat sat on the mat and it was happy with this.",
    // 10 words; de hits: der,und,die,nicht,mit,dem = 6 → 6/10
    "de_simple" -> "Der Hund und die Katze sind nicht mit dem Mann.",
    // 12 words; fr hits: le,est,dans,la,avec,les,pour,la = 8 → 8/12
    "fr_simple" -> "Le chat est dans la maison avec les amis pour la fête.",
    // 13 words; es hits: el,es,un,que,en,la,con,los = 8 → 8/13
    "es_simple" -> "El perro es un animal que vive en la casa con los niños.",
    // every letter is Han → script tier: ("zh", 1.0)
    "zh_script" -> "这是一个中文测试文档的内容",
    // kana + Han mix, kana fraction > 5% → ("ja", 1.0)
    "ja_script" -> "これは日本語のテストです",
    // every letter Cyrillic → ("ru", 1.0)
    "ru_script" -> "Это русский текст для проверки",
    // no text at all → ("und", 0.0)
    "empty" -> "",
    // digits are not letters and not words → ("und", 0.0)
    "digits_only" -> "12345 67890")

  def langidFixture(s: SparkSession): DataFrame =
    FixtureSupport.fixtureDf(s, langCases.map(_._1)) { name =>
      val text = langCases.toMap.apply(name)
      val (lang, conf) = TextOps.detectLanguage(text)
      Seq("lang" -> lang, "conf" -> r4(conf))
    }

  val langidOracle: String = FixtureSupport.valuesOracle(Seq(
    ("de_simple", "conf", "0.6"), ("de_simple", "lang", "de"),
    ("digits_only", "conf", "0.0"), ("digits_only", "lang", "und"),
    ("empty", "conf", "0.0"), ("empty", "lang", "und"),
    ("en_simple", "conf", "0.6667"), ("en_simple", "lang", "en"),
    ("es_simple", "conf", "0.6154"), ("es_simple", "lang", "es"),
    ("fr_simple", "conf", "0.6667"), ("fr_simple", "lang", "fr"),
    ("ja_script", "conf", "1.0"), ("ja_script", "lang", "ja"),
    ("ru_script", "conf", "1.0"), ("ru_script", "lang", "ru"),
    ("zh_script", "conf", "1.0"), ("zh_script", "lang", "zh")))

  // ---- quality scoring ----

  private val qualityCases: Seq[(String, String)] = Seq(
    // n=23 chars, 6 words [the,cat,sat,on,the,mat.], mean len 18/6=3.0,
    // 1 punct, 1 upper, 0 digits, 3 stopword hits (the,on,the) → ratio 0.5;
    // score = 0.3·(6/100) + 0.2·1 + 0.3·min(1, 0.5/0.25) + 0.2·1·1 = 0.718
    "simple" -> "The cat sat on the mat.",
    // n=23, 5 words [call,555,now!!!,999,888] mean len 19/5=3.8, 3 punct,
    // 7 upper (>0.3 → shout 0.3), 9 digits (>0.3 → digit 0.3), 0 stopwords;
    // score = 0.3·0.05 + 0.2·1 + 0 + 0.2·0.3·0.3 = 0.233
    "shouty_digits" -> "CALL 555 NOW!!! 999 888",
    // all-zero record
    "empty" -> "")

  def qualityFixture(s: SparkSession): DataFrame =
    FixtureSupport.fixtureDf(s, qualityCases.map(_._1)) { name =>
      val q = TextOps.quality(qualityCases.toMap.apply(name))
      Seq(
        "n_chars" -> q.nChars.toString,
        "n_words" -> q.nWords.toString,
        "mean_word_len" -> r4(q.meanWordLen),
        "punct_ratio" -> r4(q.punctRatio),
        "stopword_ratio" -> r4(q.stopwordRatio),
        "upper_ratio" -> r4(q.upperRatio),
        "digit_ratio" -> r4(q.digitRatio),
        "score" -> r4(q.score))
    }

  val qualityOracle: String = FixtureSupport.valuesOracle(Seq(
    ("empty", "digit_ratio", "0.0"), ("empty", "mean_word_len", "0.0"),
    ("empty", "n_chars", "0"), ("empty", "n_words", "0"),
    ("empty", "punct_ratio", "0.0"), ("empty", "score", "0.0"),
    ("empty", "stopword_ratio", "0.0"), ("empty", "upper_ratio", "0.0"),
    ("shouty_digits", "digit_ratio", "0.3913"),       // 9/23
    ("shouty_digits", "mean_word_len", "3.8"),        // 19/5
    ("shouty_digits", "n_chars", "23"), ("shouty_digits", "n_words", "5"),
    ("shouty_digits", "punct_ratio", "0.1304"),       // 3/23
    ("shouty_digits", "score", "0.233"),
    ("shouty_digits", "stopword_ratio", "0.0"),
    ("shouty_digits", "upper_ratio", "0.3043"),       // 7/23
    ("simple", "digit_ratio", "0.0"),
    ("simple", "mean_word_len", "3.0"),               // 18/6
    ("simple", "n_chars", "23"), ("simple", "n_words", "6"),
    ("simple", "punct_ratio", "0.0435"),              // 1/23
    ("simple", "score", "0.718"),
    ("simple", "stopword_ratio", "0.5"),              // 3/6
    ("simple", "upper_ratio", "0.0435")))             // 1/23

  // ---- fingerprinting ----

  /** Short texts (< 16-char window) fingerprint to [fnv64(text)]; the
    * expected values below are the published FNV-1a 64 constants applied by
    * an independent Python reimplementation (offset 0xcbf29ce484222325,
    * prime 0x100000001b3, signed-64 wraparound). Long texts pin structural
    * winnowing facts: a single repeated char has exactly ONE distinct
    * rolling-window hash at any length (so min-k keeps 1 and is
    * length-invariant); a 50/50 two-char text has 1 + (window−1) + 1 = 17
    * distinct hashes, capped at k = 8. */
  def fingerprintFixture(s: SparkSession): DataFrame = {
    val cases = Seq("short_abc", "short_hello", "short_empty",
      "long_repeat", "long_two_blocks")
    FixtureSupport.fixtureDf(s, cases) { name =>
      name match {
        case "short_abc" =>
          Seq("fp0" -> TextOps.fingerprint("abc").head.toString)
        case "short_hello" =>
          Seq("fp0" -> TextOps.fingerprint("hello world").head.toString)
        case "short_empty" =>
          Seq("fp0" -> TextOps.fingerprint("").head.toString)
        case "long_repeat" =>
          val fp100 = TextOps.fingerprint("a" * 100)
          val fp200 = TextOps.fingerprint("a" * 200)
          Seq("n_fp" -> fp100.length.toString,
            "scale_invariant" -> (fp100.toSeq == fp200.toSeq).toString)
        case "long_two_blocks" =>
          val fp = TextOps.fingerprint("a" * 50 + "b" * 50)
          Seq("n_fp" -> fp.length.toString,
            "distinct" -> (fp.distinct.length == fp.length).toString)
      }
    }
  }

  val fingerprintOracle: String = FixtureSupport.valuesOracle(Seq(
    ("long_repeat", "n_fp", "1"),
    ("long_repeat", "scale_invariant", "true"),
    ("long_two_blocks", "distinct", "true"),
    ("long_two_blocks", "n_fp", "8"),
    // fnv1a_64("abc"), cross-checked in Python
    ("short_abc", "fp0", "-1792535898324117685"),
    // fnv1a_64("") = the offset basis as a signed long
    ("short_empty", "fp0", "-3750763034362895579"),
    // fnv1a_64("hello world")
    ("short_hello", "fp0", "8618312879776256743")))
}
