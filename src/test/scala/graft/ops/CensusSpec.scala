package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Census tiers: the approx (HLL++) census must sit inside its error bound
  * of the exact tier per stratum and must plan STRICTLY fewer exchanges —
  * the reason it exists (exact count_distinct shuffles a row-level hash per
  * document; the sketch merges map-side). */
class CensusSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def docsDf = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("approx census within rsd bound of exact; other columns identical") {
    val exact = Census.exact(docsDf, Seq("lang")).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = Census.approx(docsDf, Seq("lang"), rsd = 0.02).collect()
    assert(approx.length == exact.size)
    approx.foreach { r =>
      val e = exact(r.getString(0))
      assert(r.getLong(1) == e.getLong(1)) // n_docs exact in both
      assert(r.getLong(2) == e.getLong(2)) // sum_chars exact in both
      val (est, exa) = (r.getLong(3).toDouble, e.getLong(3).toDouble)
      assert(math.abs(est - exa) <= math.max(3.0, 5 * 0.02 * exa),
        s"lang ${r.getString(0)}: approx $est vs exact $exa")
      assert(r.getLong(4) == e.getLong(4) && r.getLong(5) == e.getLong(5))
    }
  }

  test("approx census plans fewer exchanges than exact (no row-level distinct shuffle)") {
    def nExchanges(df: org.apache.spark.sql.DataFrame): Int =
      "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).length
    val ex = nExchanges(Census.exact(docsDf, Seq("lang", "source")))
    val ap = nExchanges(Census.approx(docsDf, Seq("lang", "source")))
    assert(ap < ex, s"approx must shuffle less: approx=$ap exact=$ex")
  }
}
