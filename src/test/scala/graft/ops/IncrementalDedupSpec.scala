package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Incremental-dedup operator properties beyond the fixture oracle: the
  * index grows append-only with accepted docs, a later batch deduplicates
  * against batch-1 survivors (not raw batch-1 input), and every batch id
  * gets exactly one ledger row. */
class IncrementalDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("index contains exactly the accepted docs; dropped docs never index") {
    val s = spark; import s.implicits._
    val b1 = Seq(("a", "one two three"), ("b", "one two three"), ("c", "four five six"))
      .toDF("doc", "body")
    val (led, idx) = IncrementalDedup.dedupeBatch(b1, "doc", "body",
      IncrementalDedup.emptyIndex(spark))
    assert(led.count() == 3)
    val kept = led.filter("kept").select("id").as[String].collect().toSet
    assert(kept == Set("a", "c")) // b is an exact dup of a
    assert(idx.hashes.select("id").as[String].collect().toSet == Set("a", "c"))
    assert(idx.sigs.select("id").as[String].collect().toSet == Set("a", "c"))
  }

  test("batch 3 dedups against survivors accumulated across earlier batches") {
    val s = spark; import s.implicits._
    val empty = IncrementalDedup.emptyIndex(spark)
    val (_, i1) = IncrementalDedup.dedupeBatch(
      Seq(("a", "alpha beta gamma delta")).toDF("doc", "body"), "doc", "body", empty)
    val (_, i2) = IncrementalDedup.dedupeBatch(
      Seq(("b", "epsilon zeta eta theta")).toDF("doc", "body"), "doc", "body", i1)
    val (led3, i3) = IncrementalDedup.dedupeBatch(
      Seq(("c", "alpha beta gamma delta"), ("d", "epsilon zeta eta theta"),
          ("e", "iota kappa lambda mu")).toDF("doc", "body"), "doc", "body", i2)
    val rows = led3.collect().map(r => r.getString(0) -> ((r.getString(2), r.getString(3)))).toMap
    assert(rows("c") == (("exact_dup_hist", "a")))
    assert(rows("d") == (("exact_dup_hist", "b")))
    assert(rows("e") == (("", "")))
    assert(i3.hashes.count() == 3) // a, b, e
  }

  test("empty batch against a populated index is a no-op") {
    val s = spark; import s.implicits._
    val (_, i1) = IncrementalDedup.dedupeBatch(
      Seq(("a", "alpha beta gamma delta")).toDF("doc", "body"), "doc", "body",
      IncrementalDedup.emptyIndex(spark))
    val (led, i2) = IncrementalDedup.dedupeBatch(
      Seq.empty[(String, String)].toDF("doc", "body"), "doc", "body", i1)
    assert(led.count() == 0 && i2.hashes.count() == 1 && i2.sigs.count() == 1)
  }
}
