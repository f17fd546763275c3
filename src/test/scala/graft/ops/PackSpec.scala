package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Concat-and-chunk packing on hand-computed cases (the corpus-scale
  * window arithmetic is cross-engine-checked by the doc_pack oracle). */
class PackSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("chunk spans, straddling, and zero-token docs — hand-computed") {
    val s = spark; import s.implicits._
    // one shard (numShards=1), budget 10; docs in id order with tokens:
    // id 1: 4  -> [0,4)   chunk 0
    // id 2: 6  -> [4,10)  chunk 0 (exactly fills; last token index 9)
    // id 3: 0  -> sits at position 10 -> chunk 1, no span
    // id 4: 15 -> [10,25) chunks 1..2, straddles
    // id 5: 5  -> [25,30) chunk 2
    val docs = Seq((1L, 4L), (2L, 6L), (3L, 0L), (4L, 15L), (5L, 5L))
      .toDF("doc", "toks")
    val out = Pack.concatChunk(docs, "doc", "toks", budget = 10, numShards = 1)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(out.toSeq == Seq(
      (1L, 0L, 0L, 0L, false),
      (2L, 4L, 0L, 0L, false),
      (3L, 10L, 1L, 1L, false),
      (4L, 10L, 1L, 2L, true),
      (5L, 25L, 2L, 2L, false)))
  }

  test("chunk arithmetic stays exact past 2^53 cumulative tokens") {
    val s = spark; import s.implicits._
    // doc 1 pushes cum_before to 2^53 + 511 — not double-representable, so
    // floor((cum+...)/budget) through true division would round to 2^53+512
    // and assign doc 2 first_chunk 2^44 + 1; integer DIV keeps it at 2^44
    val big = (1L << 53) + 511L
    val docs = Seq((1L, big), (2L, 1L)).toDF("doc", "toks")
    val out = Pack.concatChunk(docs, "doc", "toks", budget = 512, numShards = 1)
      .orderBy("id").collect()
    val doc2 = out(1)
    assert(doc2.getLong(3) == big)           // cum_before exact (long sum)
    assert(doc2.getLong(4) == (1L << 44))    // first_chunk = big DIV 512
    assert(doc2.getLong(5) == (1L << 44))
  }

  test("placement is identical at different parallelism (deterministic shards)") {
    val s = spark; import s.implicits._
    val docs = (1L to 200L).map(i => (i, i % 37)).toDF("doc", "toks")
    val a = Pack.concatChunk(docs.repartition(2), "doc", "toks", 64, 4)
      .orderBy("id").collect().toSeq
    val b = Pack.concatChunk(docs.repartition(13), "doc", "toks", 64, 4)
      .orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("seededShuffle: same (corpus, seed) ⇒ same order at any parallelism") {
    val s = spark; import s.implicits._
    val docs = (1L to 500L).map(i => Tuple1(i)).toDF("doc")
    val a = Pack.seededShuffle(docs.repartition(2), "doc", 42L, 8)
      .orderBy("id").collect().toSeq
    val b = Pack.seededShuffle(docs.repartition(11), "doc", 42L, 8)
      .orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("seededShuffle: breaks sequential-id order and responds to the seed") {
    val s = spark; import s.implicits._
    val docs = (1L to 1000L).map(i => Tuple1(i)).toDF("doc")
    val bySeed = (seed: Long) => Pack.seededShuffle(docs, "doc", seed, 4)
      .orderBy("shard", "pos").collect().map(_.getLong(0)).toSeq
    val s1 = bySeed(1L)
    val s2 = bySeed(2L)
    assert(s1 != s2, "different seeds must produce different orders")
    // sequential ids must land far apart: within the first shard's order,
    // neighbors are consecutive ids only by coincidence (allow a few)
    val consecutive = s1.sliding(2).count { case Seq(p, q) => q == p + 1; case _ => false }
    assert(consecutive < 20, s"order still sequential: $consecutive adjacent id pairs")
  }

  test("seededShuffle: shards are size-balanced and pos is a contiguous rank") {
    val s = spark; import s.implicits._
    val docs = (1L to 4000L).map(i => Tuple1(i)).toDF("doc")
    val out = Pack.seededShuffle(docs, "doc", 7L, 8).collect()
      .map(r => (r.getLong(2), r.getInt(3)))
    val sizes = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(sizes.size == 8)
    assert(sizes.values.max <= sizes.values.min * 1.3,
      s"shard skew: $sizes") // uniform-ish keys ⇒ ±30% at n=4000
    sizes.foreach { case (shard, n) =>
      val ranks = out.filter(_._1 == shard).map(_._2).sorted
      assert(ranks.toSeq == (1 to n).toSeq, s"shard $shard ranks not contiguous")
    }
  }
}
