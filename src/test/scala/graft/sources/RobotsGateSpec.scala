package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.pipeline.{ExtractJob, PagesGen}

/** S2 wired into the pipeline: the broadcast `(host, robots_txt)` side table
  * gates pages BEFORE extraction, with robots.ts:26-167 precedence semantics
  * applied end-to-end (not just in the unit-tested matcher). */
class RobotsGateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("graft-robots-gate-test")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("robotsGate drops exactly the urls the scalar matcher forbids") {
    val pages = PagesGen.generate(spark, 300)
    val robots = PagesGen.robotsTable(spark, pages)

    val gated = ExtractJob.robotsGate(pages, robots).collect().map(_.url).toSet

    // scalar oracle: same matcher applied per row without Spark
    val expected = (0 until 300).map(i => PagesGen.makePage(i.toLong)).filter { p =>
      val host = graft.urlx.UrlOps.extractDomain(p.url)
      Robots.isAllowed(PagesGen.robotsFor(host), p.url)
    }.map(_.url).toSet

    assert(gated == expected)
    assert(expected.size < 300, "some variant must actually disallow pages")
    assert(expected.nonEmpty)
  }

  test("hosts missing from the side table fail open") {
    val s = spark
    import s.implicits._
    val pages = PagesGen.generate(spark, 20)
    val emptyRobots = Seq.empty[(String, String)].toDF("host", "robots_txt")
    assert(ExtractJob.robotsGate(pages, emptyRobots).count() == 20)
  }

  test("gated pages flow into extraction unchanged") {
    val pages = PagesGen.generate(spark, 60)
    val robots = PagesGen.robotsTable(spark, pages)
    val gated = ExtractJob.robotsGate(pages, robots)
    val rows = ExtractJob.extract(gated, 4).collect()
    assert(rows.length == gated.count())
    assert(rows.forall(r => Robots.isAllowed(
      PagesGen.robotsFor(graft.urlx.UrlOps.extractDomain(r.url)), r.url)))
  }
}
