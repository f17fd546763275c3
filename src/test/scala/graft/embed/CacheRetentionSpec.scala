package graft.embed

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Ported reference behaviors for the table-scale LRU+TTL cache
  * (`test/embeddings/cache.test.ts:148-300`) plus the batch-commit path. */
class CacheRetentionSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def entry(k: String, created: Long, expires: Long, accessed: Long) =
    (k, Array(0.5f), 1, 1, created, expires, accessed)

  private def table(rows: (String, Array[Float], Int, Int, Long, Long, Long)*) = {
    val s = spark; import s.implicits._
    rows.toSeq.toDF("cache_key", "vector", "n_chunks", "tokens",
      "created_at", "expires_at", "accessed_at")
  }

  private def keys(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select("cache_key").collect().map(_.getString(0)).toSet

  test("expired entries never hit and cleanup sweeps them (ttl test, cache.test.ts:200)") {
    // set at t=0 with ttl 100; read at t=150 → miss, swept
    val c1 = CacheRetention.withTimestamps(
      table(entry("key1", 0, 0, 0)).drop("created_at", "expires_at", "accessed_at"),
      nowMs = 0L, ttlMs = 100L)
    assert(keys(CacheRetention.unexpired(c1, nowMs = 150L)).isEmpty)
    val (remaining, evicted) = CacheRetention.cleanup(c1, nowMs = 150L)
    assert(evicted == 1L && keys(remaining).isEmpty)
    // at t=100 exactly, still valid (expiry is now > expiresAt)
    assert(keys(CacheRetention.unexpired(c1, nowMs = 100L)) == Set("key1"))
  }

  test("LRU eviction honors access recency (cache.test.ts:215 scenario)") {
    // set key1@0, key2@10; get key1@20 (touch); set key3@30 on maxEntries=2
    // → key2 (least recently used) is the one evicted
    val afterSets = table(
      entry("key1", 0, 3600000, 0),
      entry("key2", 10, 3610000, 10))
    val touched = CacheRetention.touch(afterSets,
      { val s = spark; import s.implicits._; Seq("key1").toDF("cache_key") },
      nowMs = 20L)
    val withK3 = touched.unionByName(table(entry("key3", 30, 3630000, 30)))
    val cut = CacheRetention.enforceMaxEntries(withK3, maxEntries = 2L)
    assert(keys(cut) == Set("key1", "key3"))
  }

  test("stats report size, expired count, utilization (cache.test.ts:237)") {
    val empty = table()
    val st0 = CacheRetention.stats(empty, maxEntries = 10L, nowMs = 0L)
    assert(st0 == CacheRetention.Stats(0, 10, 0, 0.0))
    val c = table(
      entry("a", 0, 100, 0), entry("b", 0, 10000, 0), entry("c", 0, 50, 0))
    val st = CacheRetention.stats(c, maxEntries = 10L, nowMs = 500L)
    assert(st.size == 3 && st.expired == 2 && math.abs(st.utilization - 0.3) < 1e-9)
  }

  test("validateCachedResult port (cache.test.ts:263-299)") {
    assert(CacheRetention.validateCachedRow("skipped", null, Some(256)))
    assert(CacheRetention.validateCachedRow("success", Array(1f, 2f, 3f), Some(3)))
    assert(!CacheRetention.validateCachedRow("success", Array(1f, 2f, 3f), Some(5)))
    assert(CacheRetention.validateCachedRow("success", Array(1f), None))
    assert(!CacheRetention.validateCachedRow("success", null, Some(2)))
  }

  test("absorb: one batch commit = touch + insert-if-absent + sweep + cut") {
    val s = spark; import s.implicits._
    val cache = table(
      entry("old_hot", 0, 9000, 800),    // hit this run → touched to 1000
      entry("old_cold", 0, 9000, 10),    // never accessed again → LRU victim
      entry("old_expired", 0, 500, 400)) // expired by now=1000 → swept
    val newRows = Seq(
      ("fresh", Array(0.9f), 2, 8),
      ("old_hot", Array(0.9f), 2, 8)) // duplicate key: first writer wins
      .toDF("cache_key", "vector", "n_chunks", "tokens")
    val out = CacheRetention.absorb(cache, newRows,
      hitKeys = Seq("old_hot").toDF("cache_key"),
      nowMs = 1000L, ttlMs = 5000L, maxEntries = 2L)
    assert(keys(out) == Set("old_hot", "fresh"))
    val hot = out.filter($"cache_key" === "old_hot").head()
    // the surviving old_hot row is the ORIGINAL entry, touched — not the
    // duplicate insert, and its vector is unchanged. NOTE: this is the
    // DOCUMENTED deviation from reference set() (which overwrites live
    // keys) — see the absorb scaladoc (ADVICE r7)
    assert(hot.getAs[Long]("accessed_at") == 1000L)
    assert(hot.getAs[Long]("created_at") == 0L)
    assert(hot.getAs[scala.collection.Seq[Float]]("vector").toSeq == Seq(0.5f))
    val fresh = out.filter($"cache_key" === "fresh").head()
    assert(fresh.getAs[Long]("expires_at") == 6000L)
  }

  test("absorb: within-batch duplicate keys collapse to ONE row (a Map " +
       "cannot hold two entries per key)") {
    val s = spark; import s.implicits._
    val newRows = Seq(
      ("dup", Array(0.7f), 1, 4),
      ("dup", Array(0.7f), 1, 4), // same content → same cache_key
      ("solo", Array(0.2f), 1, 2))
      .toDF("cache_key", "vector", "n_chunks", "tokens")
    val out = CacheRetention.absorb(table(), newRows,
      hitKeys = Seq.empty[String].toDF("cache_key"),
      nowMs = 100L, ttlMs = 5000L, maxEntries = 10L)
    assert(out.count() == 2L)
    assert(out.filter($"cache_key" === "dup").count() == 1L)
    // downstream lookup joins must not fan out
    val looked = CacheRetention.asLookup(out)
      .join(Seq("dup").toDF("cache_key"), Seq("cache_key"))
    assert(looked.count() == 1L)
  }

  test("absorb: a fresh write for an EXPIRED key replaces it (get() deletes " +
       "on read, set() re-stores — the key must not vanish)") {
    val s = spark; import s.implicits._
    val cache = table(entry("k", 0, 500, 0)) // expired by now=1000
    val newRows = Seq(("k", Array(0.9f), 2, 8))
      .toDF("cache_key", "vector", "n_chunks", "tokens")
    val out = CacheRetention.absorb(cache, newRows,
      hitKeys = Seq.empty[String].toDF("cache_key"),
      nowMs = 1000L, ttlMs = 5000L, maxEntries = 10L)
    val row = out.filter($"cache_key" === "k").collect()
    assert(row.length == 1, "the re-embedded key must survive the commit")
    assert(row.head.getAs[Long]("created_at") == 1000L) // the FRESH row won
    assert(row.head.getAs[scala.collection.Seq[Float]]("vector").toSeq == Seq(0.9f))
  }

  test("enforceMaxEntries under size: untouched; tie-break deterministic") {
    val small = table(entry("a", 0, 9000, 5), entry("b", 1, 9000, 5))
    assert(keys(CacheRetention.enforceMaxEntries(small, 5L)) == Set("a", "b"))
    // accessed tie at 5: created_at desc wins → b (created 1) survives
    assert(keys(CacheRetention.enforceMaxEntries(small, 1L)) == Set("b"))
  }
}
