package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, length, sum}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Operator-level curation coverage beyond the fixture oracle: the
  * near-dup stage toggle, ledger completeness (every input id exactly
  * once), empty input, and custom thresholds. */
class CurateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("graft-test")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("ledger carries every input id exactly once, any config") {
    val s = spark; import s.implicits._
    val input = CurateFixture.docs.toDF("doc", "body")
    for (cfg <- Seq(Curate.Config(), Curate.Config(nearDup = false))) {
      val out = Curate.curate(input, "doc", "body", cfg).collect()
      assert(out.map(_.getString(0)).sorted.toSeq == CurateFixture.docs.map(_._1).sorted)
    }
  }

  test("nearDup=false keeps the near-dup pair and still drops the rest") {
    val s = spark; import s.implicits._
    val input = CurateFixture.docs.toDF("doc", "body")
    val out = Curate.curate(input, "doc", "body", Curate.Config(nearDup = false))
      .collect().map(r => r.getString(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
    assert(out("c2") == ((true, "")))   // near-dup stage disabled
    assert(out("a2") == ((false, "exact_dup")))
    assert(out("b")._2 == "quality" && out("f")._2 == "quality")
  }

  test("empty input yields an empty ledger") {
    val s = spark; import s.implicits._
    val input = Seq.empty[(String, String)].toDF("doc", "body")
    assert(Curate.curate(input, "doc", "body").count() == 0)
  }

  test("custom thresholds flow through to the quality stage") {
    val s = spark; import s.implicits._
    // with minWords raised past every doc, everything fails quality before
    // any dedup stage can fire
    val input = CurateFixture.docs.toDF("doc", "body")
    val cfg = Curate.Config(
      thresholds = graft.ops.RepetitionOps.Thresholds(minWords = 1000))
    val out = Curate.curate(input, "doc", "body", cfg).collect()
    assert(out.forall(r => !r.getBoolean(1) && r.getString(2) == "quality"))
  }

  test("stratifiedSample: rates honored within binomial noise; deterministic") {
    val s = spark; import s.implicits._
    val docs = (1 to 4000).map(i =>
      (i.toLong, s"document body number $i with unique content",
       if (i % 2 == 0) "en" else "fr")).toDF("doc", "body", "lang")
    val rates = Map("en" -> 0.5, "fr" -> 0.125)
    val out = Curate.stratifiedSample(docs, "body", "lang", rates, 0.0)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 2000 per stratum: en expect ~1000 (±150), fr ~250 (±80)
    assert(byLang("en") > 850 && byLang("en") < 1150, s"en: ${byLang("en")}")
    assert(byLang("fr") > 170 && byLang("fr") < 330, s"fr: ${byLang("fr")}")
    // deterministic across partitioning
    val again = Curate.stratifiedSample(docs.repartition(13), "body", "lang", rates, 0.0)
      .select("doc").collect().map(_.getLong(0)).sorted.toSeq
    assert(again == out.select("doc").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("stratifiedSample: rate 1.0 keeps all, rate 0.0 keeps none, default applies") {
    val s = spark; import s.implicits._
    val docs = (1 to 300).map(i =>
      (i.toLong, s"text $i", Seq("a", "b", "c")(i % 3))).toDF("doc", "body", "st")
    val out = Curate.stratifiedSample(docs, "body", "st",
      Map("a" -> 1.0, "b" -> 0.0), defaultRate = 1.0)
    val byStratum = out.groupBy("st").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStratum.getOrElse("a", 0L) == 100L)   // rate 1.0: every row
    assert(!byStratum.contains("b"))               // rate 0.0: none
    assert(byStratum.getOrElse("c", 0L) == 100L)   // default 1.0
    // identical texts sample identically: duplicate of a kept doc is kept
    val dup = (1 to 100).map(i => (i.toLong, "same body", "a"))
      .toDF("doc", "body", "st")
    val kept = Curate.stratifiedSample(dup, "body", "st", Map("a" -> 0.5), 0.0).count()
    assert(kept == 0L || kept == 100L, "a dup family must sample atomically")
    // NULL text follows its stratum's rate (sha2(NULL) is NULL and a NULL
    // filter predicate would silently drop the row even at rate 1.0)
    val withNull = Seq((1L, "real text", "a"), (2L, null.asInstanceOf[String], "a"))
      .toDF("doc", "body", "st")
    assert(Curate.stratifiedSample(withNull, "body", "st", Map("a" -> 1.0), 0.0)
      .count() == 2L, "rate 1.0 must keep null-text rows too")
  }

  test("trainingSet: full config — ledger total, stage precedence, packed = kept") {
    val s = spark; import s.implicits._
    // three DISTINCT ~60-word bodies: a shared 5-gram anywhere would
    // cross-contaminate, so no two share any five consecutive words
    def body(theme: String): String =
      (0 until 60).map { i =>
        if (i % 7 == 0) "the"
        else if (i % 7 == 3) "and"
        else s"$theme${('a' + i / 26).toChar}${('a' + i % 26).toChar}"
      }.mkString(" ")
    val docs = Seq(
      (1L, body("harbour"), "en"),
      (2L, body("harbour"), "en"),   // exact dup of 1
      (3L, body("leaked"), "en"),    // identical to the benchmark passage
      (4L, "tiny", "en"),            // quality: too_few_words
      (5L, body("orchard"), "fr"))
      .toDF("doc_id", "text", "lang")
    val bench = Seq(Tuple1(body("leaked"))).toDF("text")
    val cfg = Curate.TrainingConfig(
      curate = Curate.Config(nearDup = false),
      decontamN = 5, mixRates = Map.empty, defaultRate = 1.0,
      packBudget = 16, numShards = 2)
    val r = Curate.trainingSet(docs, "doc_id", "text", "lang",
      Some(bench.select(org.apache.spark.sql.functions.monotonically_increasing_id().as("bid"),
        col("text"))), cfg)
    val led = r.ledger.collect()
      .map(x => x.getString(0) -> ((x.getBoolean(1), x.getString(2)))).toMap
    assert(led.size == 5, "every input id exactly once")
    assert(led("1") == ((true, "")))
    assert(led("2") == ((false, "exact_dup")))
    assert(led("3") == ((false, "contaminated")))
    assert(led("4")._2 == "quality" && !led("4")._1)
    assert(led("5") == ((true, "")))
    // packed carries exactly the kept ids, each with positive tokens
    val packed = r.packed.collect().map(x => x.getLong(0) -> x.getLong(3)).toMap
    assert(packed.keySet == Set(1L, 5L))
    assert(packed.values.forall(_ > 0))
  }

  test("trainingSet: tokenizer=bpe budgets the pack in subword tokens (round 7)") {
    val s = spark; import s.implicits._
    // the full-config test's proven quality-passing body shape; "the"/"and"
    // hit fixture merges, so the BPE count diverges from the whitespace one
    def body(theme: String): String =
      (0 until 60).map { i =>
        if (i % 7 == 0) "the"
        else if (i % 7 == 3) "and"
        else s"$theme${('a' + i / 26).toChar}${('a' + i % 26).toChar}"
      }.mkString(" ")
    val docs = Seq(
      (1L, body("harbour"), "en"),
      (2L, body("quarry"), "en"),
      (3L, body("orchard"), "en"))
      .toDF("doc_id", "text", "lang")
    val ranks = graft.ops.Bpe.ranksFor(graft.ops.Bpe.FixtureSpec)
    val expect = docs.collect()
      .map(r => r.getLong(0) -> graft.ops.Bpe.countTokens(r.getString(1), ranks).toLong)
      .toMap
    val cfg = Curate.TrainingConfig(
      curate = Curate.Config(nearDup = false), packBudget = 8, numShards = 2,
      tokenizer = "bpe")
    val r = Curate.trainingSet(docs, "doc_id", "text", "lang", None, cfg)
    val packed = r.packed.collect().map(x => x.getLong(0) -> x.getLong(3)).toMap
    assert(packed == expect, s"packed token budgets must be BPE counts: $packed vs $expect")
    // whitespace counts differ on this corpus — the parameter really changes the unit
    val rw = Curate.trainingSet(docs, "doc_id", "text", "lang", None,
      cfg.copy(tokenizer = "whitespace"))
    val packedW = rw.packed.collect().map(x => x.getLong(0) -> x.getLong(3)).toMap
    assert(packedW != packed)
    intercept[IllegalArgumentException](
      Curate.trainingSet(docs, "doc_id", "text", "lang", None,
        cfg.copy(tokenizer = "nope")))
  }

  test("census → ratesForBudget → sample: sampled mass lands near the targets") {
    val s = spark; import s.implicits._
    // two strata with known char mass: en 2000 docs × 40 chars = 80k,
    // fr 1000 docs × 40 chars = 40k
    val docs = ((1 to 2000).map(i => (i.toLong, f"en document body padded $i%017d", "en")) ++
      (1 to 1000).map(i => (i.toLong + 10000, f"fr document body padded $i%017d", "fr")))
      .toDF("doc_id", "text", "lang")
    val census = graft.ops.Census.exact(docs, Seq("lang"))
    val rates = Curate.ratesForBudget(census, "lang", "sum_chars",
      Map("en" -> 20000.0, "fr" -> 999999.0)) // fr target above available
    assert(rates("fr") == 1.0, "cannot mint data: rate caps at 1.0")
    val avail = census.collect()
      .map(r => r.getString(0) -> r.getLong(2).toDouble).toMap // sum_chars
    assert(math.abs(rates("en") - 20000.0 / avail("en")) < 1e-12)
    val sampled = Curate.stratifiedSample(docs, "text", "lang", rates, 0.0)
    val mass = sampled.groupBy("lang")
      .agg(sum(length(col("text"))).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mass("fr").toDouble == avail("fr")) // rate 1.0 keeps everything
    assert(mass("en") > 12000 && mass("en") < 28000,
      s"en mass ${mass("en")} vs target 20000") // binomial noise window
  }
}
