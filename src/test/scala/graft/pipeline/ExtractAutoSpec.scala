package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Byte-ratio auto plan selection (BASELINE.md plan-order note, VERDICT r3
  * #6): markup-heavy corpora must pick extract_first (the extracted side
  * shuffles fewer bytes), dense-text corpora shuffle_first — and the chosen
  * plan must produce the same rows as the explicit plans. */
class ExtractAutoSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("graft-extract-auto-test")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("dense-text corpus (extracted > html) chooses shuffle_first") {
    // the synthetic default corpus: extracted row (content md + text +
    // normalized) is LARGER than its html (measured, BASELINE.md) — the
    // smaller shuffle side is the raw html
    assert(ExtractJob.chooseVariant(PagesGen.generate(spark, 200)) == "shuffle_first")
  }

  test("markup-heavy corpus (real-web ratio) chooses extract_first") {
    // the heavy variant inflates boilerplate markup ~10x while extraction
    // strips it — the extracted side is now far smaller than the html
    assert(ExtractJob.chooseVariant(PagesGen.generateHeavy(spark, 200)) == "extract_first")
  }

  test("extractAuto returns the chosen variant's rows (row-identity with explicit plans)") {
    val pages = PagesGen.generate(spark, 120)
    val (variant, auto) = ExtractJob.extractAuto(pages, numPartitions = 4)
    assert(variant == "shuffle_first")
    val autoRows = auto.collect().map(r => (r.url, r.norm_hash)).toSet
    val explicitRows = ExtractJob.extract(pages, 4).collect().map(r => (r.url, r.norm_hash)).toSet
    assert(autoRows == explicitRows)
    assert(autoRows.size == 120)
  }
}
