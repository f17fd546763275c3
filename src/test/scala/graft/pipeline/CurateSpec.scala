package graft.pipeline

import org.apache.spark.sql.SparkSession
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
}
