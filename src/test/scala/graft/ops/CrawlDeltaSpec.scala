package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Snapshot-diff and fetch-history classification on planted cases (the
  * corpus-scale semantics are cross-engine-checked by the doc_crawl_delta
  * / doc_fetch_history DuckDB oracles). */
class CrawlDeltaSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("diff classifies added, removed, changed, unchanged") {
    val s = spark; import s.implicits._
    val prev = Seq(("a", "h1"), ("b", "h2"), ("c", "h3")).toDF("url", "hash")
    val curr = Seq(("b", "h2"), ("c", "hX"), ("d", "h4")).toDF("url", "hash")
    val out = CrawlDelta.diff(prev, curr).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(out == Map("a" -> "removed", "b" -> "unchanged", "c" -> "changed", "d" -> "added"))
  }

  test("fetchHistory: first capture is new, equal hash is unstored revisit") {
    val s = spark; import s.implicits._
    val hist = Seq(
      ("u", 1L, "h1"), ("u", 2L, "h1"), ("u", 3L, "h2"), ("u", 4L, "h2"),
      ("v", 7L, "x1")).toDF("url", "fetch_seq", "hash")
    val out = CrawlDelta.fetchHistory(hist)
      .orderBy("url", "fetch_seq").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(4), r.getBoolean(5)))
    assert(out.toSeq == Seq(
      ("u", 1L, "new", true), ("u", 2L, "revisit", false),
      ("u", 3L, "changed", true), ("u", 4L, "revisit", false),
      ("v", 7L, "new", true)))
  }

  test("fetchHistory orders by fetch_seq within url, not input order") {
    val s = spark; import s.implicits._
    val hist = Seq(("u", 3L, "h2"), ("u", 1L, "h1"), ("u", 2L, "h1"))
      .toDF("url", "fetch_seq", "hash")
    val out = CrawlDelta.fetchHistory(hist).orderBy("fetch_seq").collect()
      .map(r => (r.getLong(1), r.getString(4)))
    assert(out.toSeq == Seq((1L, "new"), (2L, "revisit"), (3L, "changed")))
  }

  test("null hashes: presence decided by join side, comparison null-safe") {
    val s = spark; import s.implicits._
    val prev = Seq(("u1", null.asInstanceOf[String]), ("u2", "h")).toDF("url", "hash")
    val curr = Seq(("u1", "h1"), ("u2", null.asInstanceOf[String]), ("u3", null.asInstanceOf[String]))
      .toDF("url", "hash")
    val out = CrawlDelta.diff(prev, curr).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    // u1 present both sides (prev hash missing) -> changed, not added
    // u2 present both sides (curr hash missing) -> changed, not removed
    // u3 genuinely new -> added
    assert(out == Map("u1" -> "changed", "u2" -> "changed", "u3" -> "added"))
    val hist = Seq(("u", 1L, null.asInstanceOf[String]), ("u", 2L, "h"), ("u", 3L, "h"))
      .toDF("url", "fetch_seq", "hash")
    val h = CrawlDelta.fetchHistory(hist).orderBy("fetch_seq").collect()
      .map(r => (r.getLong(1), r.getString(4)))
    // first capture is "new" even with a null hash; null != "h" -> changed
    assert(h.toSeq == Seq((1L, "new"), (2L, "changed"), (3L, "revisit")))
  }
}
