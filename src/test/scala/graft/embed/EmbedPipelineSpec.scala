package graft.embed

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared call counter for provider doubles (single-JVM local mode). */
object FlakyState {
  val calls = new java.util.concurrent.atomic.AtomicLong(0)
}

/** E8 — fused embedding pipeline contracts from
  * `/root/reference/src/embeddings/pipeline.ts:49-278`: stage ordering,
  * never-throws skip semantics, and the cache-hit path doing ZERO provider
  * calls on a warm re-run. */
class EmbedPipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("graft-embed-pipeline-test")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def inputDocs() = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "The quick brown fox jumps over the lazy dog near the river bank."),
      (2L, "Contact me at jane.doe@example.com or call 555-123-4567 for details."),
      (3L, "The quick brown fox jumps over the lazy dog near the river bank."), // dup of 1
      (4L, ""),
      (5L, "tiny"),
      (6L, "aaaa b c d e f"),
      (7L, ("sentence one is here. " * 200).trim) // long enough to multi-chunk at size 64
    ).toDF("doc_id", "text")
  }

  test("cold run: stage ordering, skip reasons, deterministic stub vectors") {
    val res = EmbedPipeline.embedDocuments(spark, inputDocs(), None, new HashStubProvider(8),
        EmbedConfig(chunkSize = 64, chunkOverlap = 8))
      .collect().map(r => r.doc_id -> r).toMap

    assert(res(4L).status == "skipped" && res(4L).reason == "No input text available")
    assert(res(5L).status == "skipped" && res(5L).reason == "Input too short (4 < 10 characters)")
    assert(res(6L).status == "skipped" && res(6L).reason == "Input has too few words (1 < 3)")

    // PII redaction happens BEFORE the cache key / embedding (pipeline.ts:71-93)
    val redacted = Embed.redactPii(
      "Contact me at jane.doe@example.com or call 555-123-4567 for details.").text
    assert(res(2L).pii_redacted)
    val cfg = EmbedPipeline.cacheConfigFor(EmbedConfig(chunkSize = 64, chunkOverlap = 8))
    assert(res(2L).cache_key == EmbedCache.cacheKey(cfg, redacted))
    assert(res(2L).checksum == EmbedCache.checksum(redacted))

    // single-chunk doc: vector = stub(text) exactly
    val expected = new HashStubProvider(8)
      .embed(Seq("The quick brown fox jumps over the lazy dog near the river bank.")).head
    assert(res(1L).vector.sameElements(expected))
    assert(res(1L).n_chunks == 1)

    // identical content → identical cache key (content-addressable)
    assert(res(1L).cache_key == res(3L).cache_key)
    assert(res(1L).vector.sameElements(res(3L).vector))

    // long doc multi-chunks and aggregates (average of per-chunk stub vectors)
    assert(res(7L).n_chunks > 1)
    val chunks = Embed.chunkText(res7Text, 64, 8)
    val vecs = new HashStubProvider(8).embed(chunks.map(_.text))
    assert(res(7L).vector.sameElements(graft.ops.VectorOps.aggregate(vecs, "average")))
    assert(res(7L).tokens == chunks.map(_.tokens).sum)
  }

  private val res7Text = ("sentence one is here. " * 200).trim

  test("warm run against the persisted cache table does zero provider calls") {
    val docsDf = inputDocs()
    val cold = EmbedPipeline.embedDocuments(spark, docsDf, None, new HashStubProvider(8))
    val cacheTable = EmbedPipeline.toCacheRows(cold).cache()
    assert(cacheTable.count() > 0)

    val calls = EmbedPipelineSpec.counter
    calls.set(0)
    val warm = EmbedPipeline.embedDocuments(spark, docsDf, Some(cacheTable),
      new CountingStubProvider(8)).collect()
    assert(calls.get() == 0, "cache hits must not reach the provider")

    val byId = warm.map(r => r.doc_id -> r).toMap
    assert(byId(1L).cached && byId(2L).cached && byId(3L).cached && byId(7L).cached)
    assert(!byId(4L).cached && byId(4L).status == "skipped")
    // hit rows carry the cached vector + source metadata
    val coldById = cold.collect().map(r => r.doc_id -> r).toMap
    assert(byId(1L).vector.sameElements(coldById(1L).vector))
    assert(byId(7L).n_chunks == coldById(7L).n_chunks)
    assert(byId(7L).tokens == coldById(7L).tokens)
  }

  test("partial cache: only missing keys reach the provider") {
    val s = spark
    import s.implicits._
    val docsDf = Seq(
      (1L, "The quick brown fox jumps over the lazy dog near the river bank."),
      (8L, "An entirely new document that is not in the cache table at all.")
    ).toDF("doc_id", "text")
    val cache = EmbedPipeline.toCacheRows(
      EmbedPipeline.embedDocuments(spark, docsDf.filter(col("doc_id") === 1L),
        None, new HashStubProvider(8))).cache()
    cache.count()

    val calls = EmbedPipelineSpec.counter
    calls.set(0)
    val res = EmbedPipeline.embedDocuments(spark, docsDf, Some(cache),
      new CountingStubProvider(8)).collect().map(r => r.doc_id -> r).toMap
    assert(calls.get() == 1, "exactly the one miss embeds")
    assert(res(1L).cached && !res(8L).cached)
    assert(res(8L).status == "success")
  }

  test("transient provider failures are retried with backoff (resilience wiring)") {
    val flaky = new EmbeddingProvider {
      def name = "flaky"
      def embed(texts: Seq[String]): Seq[Array[Float]] = {
        val n = FlakyState.calls.incrementAndGet()
        if (n % 3 != 0) throw new graft.util.HttpStatusException(503, "unavailable")
        texts.map(_ => Array(1f))
      }
    }
    FlakyState.calls.set(0)
    val s = spark
    import s.implicits._
    val docsDf = Seq((1L, "a perfectly reasonable document body right here")).toDF("doc_id", "text")
    val cfg = EmbedConfig(retry = graft.util.Resilience.RetryConfig(backoffMs = 1, jitter = () => 1.0))
    val res = EmbedPipeline.embedDocuments(spark, docsDf, None, flaky, cfg).collect()
    assert(res.head.status == "success", res.head.reason)
    assert(FlakyState.calls.get() == 3, "two 503s then success = 3 calls")
  }

  test("a melted-down provider trips the partition-local circuit breaker") {
    val dead = new EmbeddingProvider {
      def name = "dead"
      def embed(texts: Seq[String]): Seq[Array[Float]] = {
        FlakyState.calls.incrementAndGet()
        throw new RuntimeException("hard failure") // non-retryable
      }
    }
    FlakyState.calls.set(0)
    val s = spark
    import s.implicits._
    val docsDf = (1L to 20L).map(i => (i, s"document number $i with plenty of words in it"))
      .toDF("doc_id", "text").repartition(1)
    val cfg = EmbedConfig(breakerThreshold = 3,
      retry = graft.util.Resilience.RetryConfig(maxAttempts = 1))
    val res = EmbedPipeline.embedDocuments(spark, docsDf, None, dead, cfg).collect()
    assert(res.forall(_.status == "skipped"))
    assert(FlakyState.calls.get() == 3, "breaker must stop provider calls at the threshold")
    assert(res.count(_.reason.contains("Circuit breaker is open")) == 17)
  }

  test("breaker counts exhausted retry SEQUENCES, not individual attempts (resilience.ts:570-590)") {
    // provider always 503s (retryable): with maxAttempts=2 and threshold=3,
    // the breaker must open after 3 fully-exhausted sequences = 6 provider
    // calls — retry-inside-breaker semantics; counting every attempt would
    // open it after 3 calls (1.5 documents)
    val flaky = new EmbeddingProvider {
      def name = "always503"
      def embed(texts: Seq[String]): Seq[Array[Float]] = {
        FlakyState.calls.incrementAndGet()
        throw new graft.util.HttpStatusException(503, "unavailable")
      }
    }
    FlakyState.calls.set(0)
    val s = spark
    import s.implicits._
    val docsDf = (1L to 10L).map(i => (i, s"document number $i with plenty of words in it"))
      .toDF("doc_id", "text").repartition(1)
    val cfg = EmbedConfig(breakerThreshold = 3,
      retry = graft.util.Resilience.RetryConfig(maxAttempts = 2, backoffMs = 1))
    val res = EmbedPipeline.embedDocuments(spark, docsDf, None, flaky, cfg).collect()
    assert(res.forall(_.status == "skipped"))
    assert(FlakyState.calls.get() == 6,
      s"3 sequences x 2 attempts = 6 calls before the breaker opens (got ${FlakyState.calls.get()})")
    assert(res.count(_.reason.contains("Circuit breaker is open")) == 7)
  }

  test("embedDocuments scans its input once (single-pass plan, no per-branch rescan)") {
    // the former skipped ∪ hits ∪ computed union re-scanned the docs
    // relation (and re-ran the regex+sha256 prepare) once per branch; the
    // single-pass restructure must leave exactly one scan of the input in
    // the analyzed plan — at 100 TB a second scan is a second pass over
    // the corpus
    val s = spark
    import s.implicits._
    val docsDf = (1L to 50L).map(i => (i, s"document number $i with plenty of words in it"))
      .toDF("doc_id", "text")
    for (cache <- Seq(None, Some(EmbedPipeline.emptyCache(spark)))) {
      val res = EmbedPipeline.embedDocuments(spark, docsDf, cache, new HashStubProvider(4))
      val scans = res.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
        case r if r.getClass.getSimpleName == "LogicalRDD" => r
      }
      // the docs LocalRelation appears once; a cache table adds its own
      // (empty) relation but must not duplicate the docs side
      assert(scans.size <= (if (cache.isDefined) 2 else 1),
        s"input scanned more than once:\n${res.queryExecution.optimizedPlan}")
    }
  }

  test("never-throws: a provider failure becomes a skipped row, not a task failure") {
    val bad = new EmbeddingProvider {
      def name = "boom"
      def embed(texts: Seq[String]): Seq[Array[Float]] =
        throw new IllegalStateException("provider down")
    }
    val res = EmbedPipeline.embedDocuments(spark, inputDocs(), None, bad)
      .collect().map(r => r.doc_id -> r).toMap
    assert(res(1L).status == "skipped")
    assert(res(1L).reason.contains("provider down"))
    // deterministic front half survives: key/checksum still present
    assert(res(1L).cache_key.nonEmpty)
  }
  test("embed counters: cold run all misses, warm run all hits; cacheStats") {
    val docsDf = inputDocs()
    val cold = EmbedPipeline.newCounters(spark)
    val coldRes = EmbedPipeline.embedDocuments(spark, docsDf, None,
      new HashStubProvider(8), counters = Some(cold))
    val coldRows = coldRes.collect()
    val nSuccess = coldRows.count(_.status == "success")
    val nSkipped = coldRows.count(_.status == "skipped")
    assert(cold.cacheHits.value == 0)
    assert(cold.cacheMisses.value == nSuccess)
    assert(cold.skipped.value == nSkipped)
    assert(cold.hitRate == 0.0)

    val cacheTable = EmbedPipeline.toCacheRows(coldRes).cache()
    val stats = EmbedPipeline.cacheStats(cacheTable, maxEntries = 100)
    assert(stats.size == cacheTable.count())
    assert(stats.utilization == stats.size.toDouble / 100)

    val warm = EmbedPipeline.newCounters(spark)
    val warmRes = EmbedPipeline.embedDocuments(spark, docsDf, Some(cacheTable),
      new HashStubProvider(8), counters = Some(warm))
    warmRes.collect()
    assert(warm.cacheHits.value == nSuccess)
    assert(warm.cacheMisses.value == 0)
    assert(warm.skipped.value == nSkipped)
    assert(warm.hitRate == 1.0)

    // exactCounters: derived from the output rows, so REPEATED actions give
    // identical numbers (the live accumulators above are at-least-once and
    // would double-count here)
    val exact1 = EmbedPipeline.exactCounters(warmRes)
    val exact2 = EmbedPipeline.exactCounters(warmRes)
    assert(exact1 == exact2)
    assert(exact1.cacheHits == nSuccess)
    assert(exact1.cacheMisses == 0)
    assert(exact1.skipped == nSkipped)
    assert(exact1.hitRate == 1.0)
    val exactCold = EmbedPipeline.exactCounters(EmbedPipeline.embedDocuments(
      spark, docsDf, None, new HashStubProvider(8)))
    assert(exactCold.cacheHits == 0)
    assert(exactCold.cacheMisses == nSuccess)
    assert(exactCold.skipped == nSkipped)
  }
}

/** Test-only instrumented stub (ADVICE r2: the shipped HashStubProvider is
  * stateless; the provider-call counter lives here, in test scope, shared via
  * a single-JVM static — valid only in local mode, which is where it runs). */
object EmbedPipelineSpec {
  val counter = new java.util.concurrent.atomic.AtomicLong(0)
}

class CountingStubProvider(dims: Int = 8) extends HashStubProvider(dims) {
  override def embed(texts: Seq[String]): Seq[Array[Float]] = {
    texts.foreach(_ => EmbedPipelineSpec.counter.incrementAndGet())
    super.embed(texts)
  }
}
