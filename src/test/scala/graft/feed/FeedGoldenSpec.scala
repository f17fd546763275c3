package graft.feed

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import scala.io.Source

/** Frozen feed goldens (VERDICT r2 next-round #9): the parsed + normalized
  * form of every item across the 11 vendored feed fixtures, byte-pinned in
  * `feed_goldens.tsv` (same contract as the 103 page goldens) and reproduced
  * identically through Spark at two parallelism levels. */
class FeedGoldenSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("graft-feed-golden")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private lazy val goldens: Seq[String] = {
    val in = getClass.getResourceAsStream("/feed_goldens.tsv")
    try Source.fromInputStream(in, "UTF-8").getLines().toVector finally in.close()
  }

  test("scalar feed parse + normalize reproduces the frozen goldens byte-for-byte") {
    val got = FeedGoldenGen.allLines
    assert(got.length == goldens.length, s"golden line count ${got.length} != ${goldens.length}")
    got.zip(goldens).zipWithIndex.foreach { case ((g, e), i) =>
      assert(g == e, s"feed golden drift at line $i")
    }
  }

  test("Spark-distributed feed parse matches the goldens at 2 and 8 partitions") {
    val sp = spark
    import sp.implicits._
    for (parts <- Seq(2, 8)) {
      val got = sp.createDataset(FeedGoldenGen.Fixtures)
        .repartition(parts)
        .flatMap(name => FeedGoldenGen.lines(name))
        .collect().toSet
      assert(got == goldens.toSet, s"distributed feed goldens diverged at parts=$parts")
    }
  }

  test("goldens cover all 11 fixtures with parsed items") {
    val fixtures = goldens.map(_.split("\t")(0)).distinct
    assert(fixtures.length == 11)
    // every fixture parses into a feed (no UNPARSEABLE/ERROR markers frozen)
    assert(!goldens.exists(l => l.contains("UNPARSEABLE") || l.contains("\tERROR:")))
    // item lines exist for every format family
    assert(goldens.exists(_.startsWith("atom.xml\t0")))
    assert(goldens.exists(_.startsWith("rss1-basic.xml\t0")))
    assert(goldens.exists(_.startsWith("rss2-basic.xml\t0")))
    assert(goldens.exists(_.startsWith("podcast-itunes.xml\t0")))
  }
}
