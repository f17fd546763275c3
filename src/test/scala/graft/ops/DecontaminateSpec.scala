package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** n-gram-overlap decontamination on planted cases (the corpus-scale
  * semantics are cross-engine-checked by the doc_decontaminate DuckDB
  * oracle). */
class DecontaminateSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("flags exact benchmark substrings; counts distinct shared grams") {
    val s = spark; import s.implicits._
    val bench = Seq("the quick brown fox jumps over the lazy dog").toDF("text")
    val train = Seq(
      // contains "quick brown fox" -> 1 shared trigram
      ("t1", "a very quick brown fox ran away today"),
      // full benchmark copy -> all 7 trigrams shared
      ("t2", "the quick brown fox jumps over the lazy dog"),
      ("t3", "completely unrelated sentences about winter harvest seasons"),
      ("t4", "too short"),
      ("t5", "")).toDF("doc", "body")
    val out = Decontaminate.flag(train, bench, "doc", "body", "text", n = 3)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out("t1") == ((1L, true)))
    assert(out("t2") == ((7L, true)))
    assert(out("t3") == ((0L, false)))
    assert(out("t4") == ((0L, false)))
    assert(out("t5") == ((0L, false)))
  }

  test("repeated shared gram in one doc counts once") {
    val s = spark; import s.implicits._
    val bench = Seq("alpha beta gamma").toDF("text")
    val train = Seq(("t", "alpha beta gamma delta alpha beta gamma")).toDF("doc", "body")
    val out = Decontaminate.flag(train, bench, "doc", "body", "text", n = 3)
      .collect().head
    assert(out.getLong(1) == 1L && out.getBoolean(2))
  }
}
