package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Custom Catalyst surface: native expression inside whole-stage codegen and
  * the typed element-wise vector Aggregator. */
class PlansSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("graft-plans-test")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("token_count native expression: SQL-registered, matches split semantics") {
    val sp = spark
    import sp.implicits._
    val df = Seq("hello world", "  leading and trailing  ", "", "one", "a\tb\nc  d").toDF("s")
    df.createOrReplaceTempView("toks")
    val got = spark.sql("SELECT s, token_count(s) AS n FROM toks").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got("hello world") == 2)
    assert(got("  leading and trailing  ") == 3)
    assert(got("") == 0)
    assert(got("one") == 1)
    assert(got("a\tb\nc  d") == 4)
    // equivalence with the split-based formulation on non-degenerate input
    val eq = spark.sql(
      """SELECT count(*) AS bad FROM toks
        |WHERE length(trim(s)) > 0
        |  AND token_count(s) != size(split(trim(s), '\\s+'))""".stripMargin).first().getLong(0)
    assert(eq == 0)
  }

  test("token_count participates in whole-stage codegen") {
    GraftExtensions.register(spark)
    // literal-only projections plan as LocalTableScan; use a codegen'd scan
    val df = spark.range(100).selectExpr("token_count(concat('a b ', CAST(id AS STRING))) AS n")
    // the `*(1)` prefix in the plan string = WholeStageCodegen stage 1; assert on the node type
    val codegenned = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenned.nonEmpty, df.queryExecution.executedPlan.toString)
    assert(df.agg(org.apache.spark.sql.functions.sum("n")).first().getLong(0) == 300L)
  }

  test("bpe_token_count native expression: SQL parity with the core, codegen (round 7)") {
    GraftExtensions.register(spark)
    val sp = spark
    import sp.implicits._
    val ranks = graft.ops.Bpe.ranksFor(graft.ops.Bpe.FixtureSpec)
    val texts = Seq("the fast table scan", "it's we'll", "", "zzz qqq",
      "the the the window window spark")
    val df = texts.toDF("s")
    df.createOrReplaceTempView("bpe_in")
    val spec = graft.ops.Bpe.FixtureSpec.replace("'", "''")
    val got = spark.sql(
        s"SELECT s, bpe_token_count(s, '$spec') AS n FROM bpe_in").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    texts.foreach { t =>
      assert(got(t) == graft.ops.Bpe.countTokens(t, ranks), s"mismatch on '$t'")
    }
    // stays inside whole-stage codegen (addReferenceObj path)
    val plan = spark.range(50)
      .selectExpr(s"bpe_token_count(concat('the ', CAST(id AS STRING)), '$spec') AS n")
    val codegenned = plan.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenned.nonEmpty, plan.queryExecution.executedPlan.toString)
    assert(plan.count() == 50)
    // non-constant merges argument is rejected at analysis
    val err = intercept[Exception](
      spark.sql("SELECT bpe_token_count(s, s) FROM bpe_in").collect())
    assert(err.getMessage.contains("constant"), err.getMessage)
  }

  test("cosine_sim native expression: matches VectorOps.cosine, codegen, nulls") {
    val sp = spark
    import sp.implicits._
    import graft.ops.{TextOps, VectorOps}
    def rnd(seed: Long, i: Int): Float = {
      val h = TextOps.mix64(seed ^ (i.toLong * 0x9e3779b97f4a7c15L))
      (((h >>> 11) * 1.1102230246251565e-16) * 2 - 1).toFloat
    }
    val vecs = (0 until 50).map(s => Array.tabulate(16)(d => rnd(s, d)))
    val pairs = (for (a <- vecs; b <- vecs.take(5)) yield (a, b)) :+
      ((Array.fill(16)(0f), vecs.head)) // zero-norm side → 0.0 like VectorOps
    val df = pairs.toDF("a", "b")
    val got = df.selectExpr("cosine_sim(a, b) AS c").collect().map(_.getDouble(0))
    val want = pairs.map { case (a, b) => VectorOps.cosine(a, b) }
    got.zip(want).foreach { case (g, w) => assert(g == w, s"$g != $w") }

    // inside whole-stage codegen: a plain local relation plans as
    // LocalTableScan (no codegen stage) and AQE materializes its final plan
    // only after execution — repartition to force a real stage, run, then
    // inspect the adaptive FINAL plan
    val q = df.repartition(2).selectExpr("cosine_sim(a, b) AS c")
    q.collect()
    val finalPlan = q.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // AQE nests the codegen stage inside a QueryStageExec whose plan is not
    // in `children`, so match the `*(n)` whole-stage marker on the
    // projection instead of collecting the node
    assert(finalPlan.toString.matches("(?s).*\\*\\(\\d+\\) Project \\[cosine_sim.*"),
      finalPlan.toString)

    // null propagation
    val n = Seq((Option.empty[Array[Float]], Option(Array(1f))))
      .toDF("a", "b").selectExpr("cosine_sim(a, b)").first()
    assert(n.isNullAt(0))

    // cosine_sim5 = Math.round semantics, byte-identical to the scalar
    // scoring path used across the ANN queries (NOT floor(x+0.5), which
    // double-rounds across integer boundaries)
    val got5 = df.selectExpr("cosine_sim5(a, b) AS c").collect().map(_.getDouble(0))
    val want5 = pairs.map { case (a, b) => math.round(VectorOps.cosine(a, b) * 100000) / 100000.0 }
    got5.zip(want5).foreach { case (g, w) => assert(g == w, s"$g != $w") }
    assert(Math.round(0.49999999999999994) == 0L) // the JDK fix the helper relies on
  }

  test("VectorAvgAggregator: distributed element-wise average with map-side combine") {
    val sp = spark
    import sp.implicits._
    val ds = Seq(
      ("a", Array(1f, 2f)), ("a", Array(3f, 4f)),
      ("b", Array(10f, 20f)), ("b", Array(30f, 40f)), ("b", Array(50f, 60f))
    ).toDS()
    val out = ds.groupByKey(_._1)
      .mapValues(_._2)
      .agg(VectorAvgAggregator.toColumn.name("avg_vec"))
      .collect().toMap
      .map { case (k, v) => k -> v.toSeq }
    assert(out("a") == Seq(2f, 3f))
    assert(out("b") == Seq(30f, 40f))
  }

  test("extract_page struct UDF: one DOM parse per row from pure SQL") {
    val sp = spark
    import sp.implicits._
    val html = """<html><head><title>The Title</title>
      |<meta property="og:title" content="OG Title">
      |<meta name="description" content="Desc here"></head>
      |<body><article><p>Some body content for the page that is long enough.</p></article></body></html>""".stripMargin
    Seq((html, "https://example.com/a?utm_source=x")).toDF("html", "url").createOrReplaceTempView("pages_sql")
    val row = spark.sql(
      """SELECT r.title, r.description, r.url, r.word_count
        |FROM (SELECT extract_page(html, url) AS r FROM pages_sql)""".stripMargin).first()
    assert(row.getString(0) == "OG Title")          // og:title beats <title>
    assert(row.getString(1) == "Desc here")
    assert(row.getString(2) == "https://example.com/a") // tracking param stripped
    assert(row.getInt(3) > 0)
  }

  test("extract_doc binary UDF routes HTML and PDF (incl. encrypted) from pure SQL (round 6)") {
    GraftExtensions.register(spark)
    val sp = spark
    import sp.implicits._
    val rows = Seq(
      ("https://sql.example.com/p.html",
        "<html><body><h1>Sql Page</h1><p>Body content long enough to keep.</p></body></html>"
          .getBytes("UTF-8")),
      ("https://sql.example.com/d.pdf", graft.sources.PdfGen.fixtureDocs.toMap.apply("plain")),
      ("https://sql.example.com/e.pdf", graft.sources.PdfGen.rc4EncryptedPdf()))
    rows.toDF("url", "blob").createOrReplaceTempView("docs_sql")
    val out = spark.sql(
      """SELECT r.url, r.content_type, r.status, r.title
        |FROM (SELECT extract_doc(blob, url) AS r FROM docs_sql)
        |ORDER BY r.url""".stripMargin).collect()
    assert(out.map(r => (r.getString(1), r.getString(2))).toSeq ==
      Seq(("pdf", "ok"), ("pdf", "ok"), ("unknown", "ok")))
    assert(out(0).getString(3) == "Annual Report")   // d.pdf
  }

  test("text-analysis scalars are reachable from plain SQL") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT detect_lang('the quick brown fox is on the hill and it was fine'),
        |       quality_score('A reasonable sentence with the usual words in it.'),
        |       simhash64('alpha beta gamma'),
        |       content_hash32('hello'),
        |       pii_redact('mail me at a@b.com now'),
        |       normalize_url('HTTPS://Example.COM/x?utm_source=a&k=1')""".stripMargin).first()
    assert(row.getString(0) == "en")
    assert(row.getDouble(1) > 0)
    assert(row.getLong(2) == graft.ops.TextOps.simHash("alpha beta gamma"))
    assert(row.getString(3) == graft.content.Normalizer.generateHash("hello"))
    assert(row.getString(4) == "mail me at [REDACTED] now")
    assert(row.getString(5) == "https://example.com/x?k=1")
  }

  test("quality_verdict struct UDF gates spam and passes clean text from SQL") {
    GraftExtensions.register(spark)
    val clean = (1 to 60).map(i => s"word$i").mkString(" ") + " the and"
    val rows = spark.sql(
      s"""SELECT id, quality_verdict(t).keep AS keep, quality_verdict(t).reasons AS reasons
         |FROM VALUES ('clean', '$clean'), ('spam', repeat('click here ', 40)) AS v(id, t)
         |ORDER BY id""".stripMargin).collect()
    assert(rows(0).getString(0) == "clean" && rows(0).getBoolean(1)
      && rows(0).getString(2) == "")
    assert(rows(1).getString(0) == "spam" && !rows(1).getBoolean(1)
      && rows(1).getString(2).contains("top_2gram"))
  }
}
