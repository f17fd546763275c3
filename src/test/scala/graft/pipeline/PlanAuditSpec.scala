package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Physical-plan audits: the plans we ship must be the plans we designed —
  * broadcasts where a side is bounded, no cartesian products in any LSH
  * path, column pruning reaching the scans, partial aggregation before
  * shuffles. Asserted on `.explain` output so a regression (e.g. a join
  * silently degrading to BroadcastNestedLoopJoin) fails the build instead of
  * surfacing as a 100 TB incident. */
class PlanAuditSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("graft-plan-audit")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("robots gate joins the side table by broadcast, not shuffle") {
    val pages = PagesGen.generate(spark, 100)
    val robots = PagesGen.robotsTable(spark, pages)
    val p = plan(ExtractJob.robotsGate(pages, robots).toDF())
    assert(p.contains("BroadcastHashJoin"), s"robots side table must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), "host join must not shuffle the corpus")
  }

  test("LSH candidate pairs: equi-join on bucket keys, never a cartesian product") {
    val s = spark
    import s.implicits._
    val bands = (0 until 200).map(i => (s"u$i", i % 3, (i % 7).toLong))
      .toDF("url", "band_idx", "band_key")
    val p = plan(graft.ops.DedupOps.candidatePairs(bands, Seq("band_idx", "band_key"), "url"))
    assert(!p.contains("CartesianProduct"), s"cartesian in LSH path:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested-loop join in LSH path:\n$p")
  }

  test("extraction shuffles only (url, html): pruned columns never ride the exchange") {
    val dir = java.nio.file.Files.createTempDirectory("graft_plan").toString
    PagesGen.generate(spark, 50).write.mode("overwrite").parquet(dir)
    val s = spark
    import s.implicits._
    val pages = spark.read.parquet(dir).as[PageRow]
    val p = plan(ExtractJob.extract(pages, 4).toDF())
    // the parquet scan feeding the exchange must read only url + html
    val readSchemas = "ReadSchema: [^\n]+".r.findAllIn(p).toList
    val mainScan = readSchemas.find(_.contains("html")).getOrElse(fail(s"no html scan in:\n$p"))
    assert(!mainScan.contains("warc_ts") && !mainScan.contains("text") && !mainScan.contains("lang"),
      s"unused columns not pruned from the shuffled scan: $mainScan")
    // (the mega-host pre-pass runs as its own eager job — its url-only
    // pruning is asserted by SparkJobSpec's plan-hygiene test)
  }

  test("embed cache join is an equi-join on cache_key (hash-partitionable)") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a document with plenty of words to be valid")).toDF("doc_id", "text")
    val cache = graft.embed.EmbedPipeline.toCacheRows(
      graft.embed.EmbedPipeline.embedDocuments(spark, docs, None, new graft.embed.HashStubProvider(8)))
    val p = plan(graft.embed.EmbedPipeline.embedDocuments(
      spark, docs, Some(cache), new graft.embed.HashStubProvider(8)).toDF())
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"cache join degraded:\n$p")
  }

  test("dedup group-bys partial-aggregate before the shuffle (map-side combine)") {
    val s = spark
    import s.implicits._
    val df = (0 until 100).map(i => (s"h$i", i.toLong)).toDF("hash", "v")
      .groupBy("hash").agg(count("*").as("n"))
    val p = plan(df)
    // HashAggregate appears twice: partial before the exchange, final after
    assert("HashAggregate".r.findAllIn(p).length >= 2, s"no partial agg:\n$p")
  }
}
