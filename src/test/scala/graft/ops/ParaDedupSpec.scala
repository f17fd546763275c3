package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Operator-level coverage for cross-document paragraph dedup: document
  * frequency counts distinct docs (not occurrences), every occurrence of
  * boilerplate drops, order is preserved on reassembly, paragraph-less
  * docs survive, and the threshold is honored. */
class ParaDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def run(docs: Seq[(String, String)], minDocFreq: Int) = {
    val s = spark; import s.implicits._
    val out = ParaDedup.dedupParagraphs(
      docs.toDF("doc_id", "body"), "doc_id", "body", minDocFreq)
    out.collect().map(r => r.getString(0) ->
      ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
  }

  test("df counts distinct docs; repeated occurrence within one doc is one df") {
    // "bp" sits in 3 docs (one of them twice): df = 3 -> dropped at threshold 3
    val docs = Seq(
      "a" -> "bp\n\nunique alpha",
      "b" -> "bp\n\nbp\n\nunique beta",
      "c" -> "unique gamma\n\nbp",
      "d" -> "unique delta")
    val out = run(docs, 3)
    assert(out("a") == (("unique alpha", 2L, 1L, 2L)))
    assert(out("b") == (("unique beta", 3L, 2L, 4L)))   // both occurrences drop
    assert(out("c") == (("unique gamma", 2L, 1L, 2L)))
    assert(out("d") == (("unique delta", 1L, 0L, 0L)))
  }

  test("below-threshold shared paragraphs are kept; order preserved") {
    val docs = Seq(
      "a" -> "shared\n\nmiddle a\n\ntail a",
      "b" -> "head b\n\nshared")
    val out = run(docs, 3) // df(shared)=2 < 3
    assert(out("a")._1 == "shared\n\nmiddle a\n\ntail a")
    assert(out("b")._1 == "head b\n\nshared")
    assert(out.values.forall(_._3 == 0L))
  }

  test("whitespace-only and empty docs survive with zero counts") {
    val out = run(Seq("a" -> "", "b" -> "   \n\n  ", "c" -> "real para"), 2)
    assert(out("a") == (("", 0L, 0L, 0L)))
    assert(out("b") == (("", 0L, 0L, 0L)))
    assert(out("c") == (("real para", 1L, 0L, 0L)))
  }

  test("paragraphs are trimmed before hashing so indentation variants match") {
    val docs = Seq(
      "a" -> "  same boilerplate  \n\nkeep a",
      "b" -> "same boilerplate\n\nkeep b",
      "c" -> "\tsame boilerplate\n\nkeep c")
    val out = run(docs, 3)
    assert(out("a")._1 == "keep a" && out("b")._1 == "keep b" && out("c")._1 == "keep c")
  }

  test("all-boilerplate doc comes back empty but accounted") {
    val docs = Seq("a" -> "bp", "b" -> "bp", "c" -> "bp", "d" -> "bp\n\nbp")
    val out = run(docs, 3)
    assert(out("d") == (("", 2L, 2L, 4L)))
    assert(out("a") == (("", 1L, 1L, 2L)))
  }

  test("segmentation runs once: both consumers scan the persisted segs (round 7)") {
    val s = spark; import s.implicits._
    val docs = (0 until 40).map(i => (s"d$i", s"shared line\n\nunique $i"))
      .toDF("doc_id", "body")
    val toRelease = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.DataFrame]
    val out = ParaDedup.dedupParagraphs(docs, "doc_id", "body", 3,
      toRelease = toRelease)
    val p = out.queryExecution.executedPlan.toString
    // doc-freq aggregate + mark join both read the cached segmentation —
    // the flatMap split/hash runs once, not once per consumer
    assert("InMemoryTableScan".r.findAllIn(p).length >= 2,
      s"segs not reused from cache:\n${p.take(3000)}")
    assert(out.count() == 40)
    assert(toRelease.size == 1)
    toRelease.foreach(_.unpersist(false))
  }
}
