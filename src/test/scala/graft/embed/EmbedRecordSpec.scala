package graft.embed

import org.scalatest.funsuite.AnyFunSuite

/** Ported deterministic assertions from
  * `/root/reference/test/embeddings/pipeline.test.ts` replayed through the
  * scalar single-record entry (`EmbedPipeline.embedRecord`), which shares the
  * exact per-row code the Spark stage runs. */
class EmbedRecordSpec extends AnyFunSuite {

  /** Mirror of the tracking mock (pipeline.test.ts:35-60): records every
    * batch, returns per-chunk vectors [i+1, i+2, i+3]. */
  private class TrackingProvider extends EmbeddingProvider {
    var calls: Vector[Seq[String]] = Vector.empty
    def name = "tracking-provider"
    def embed(texts: Seq[String]): Seq[Array[Float]] = {
      calls :+= texts
      texts.zipWithIndex.map { case (_, i) => Array((i + 1).toFloat, (i + 2).toFloat, (i + 3).toFloat) }
    }
  }
  private def fixedProvider(v: Array[Float]) = new EmbeddingProvider {
    def name = "mock-provider"
    def embed(texts: Seq[String]): Seq[Array[Float]] = texts.map(_ => v.clone())
  }

  private val mockData = Embed.InputData(textContent = Some(
    "This is some sample content for testing the embedding pipeline. It needs to be long enough to pass minimum length checks and generate at least one chunk."))
  private val fastRetry = graft.util.Resilience.RetryConfig(backoffMs = 1, jitter = () => 1.0)

  test("generates embeddings successfully (pipeline.test.ts:76-91)") {
    val r = EmbedPipeline.embedRecord(mockData, fixedProvider(Array(1f, 2f, 3f)),
      EmbedConfig(model = "test-model"))
    assert(r.status == "success")
    assert(r.vector.sameElements(Array(1f, 2f, 3f)))
    assert(!r.cached)
  }

  test("skips below minTextLength with 'too short' reason (pipeline.test.ts:108-121)") {
    val r = EmbedPipeline.embedRecord(Embed.InputData(textContent = Some("Short")),
      fixedProvider(Array(1f)), EmbedConfig(minTextLength = 100))
    assert(r.status == "skipped")
    assert(r.reason.contains("too short"))
  }

  test("PII is redacted before the provider sees the text (pipeline.test.ts:123-140,400-423)") {
    val p = new TrackingProvider
    EmbedPipeline.embedRecord(Embed.InputData(textContent = Some(
      "Email: test@example.com, Phone: 555-123-4567, IP: 192.168.1.1, this text is long enough.")),
      p, EmbedConfig())
    val processed = p.calls.head.head
    assert(!processed.contains("test@example.com"))
    assert(!processed.contains("555-123-4567"))
    assert(!processed.contains("192.168.1.1"))
    assert(processed.contains("[REDACTED]"))
  }

  test("retries on retryable failure, 3 attempts (pipeline.test.ts:198-229)") {
    var attempts = 0
    val flaky = new EmbeddingProvider {
      def name = "flaky-provider"
      def embed(texts: Seq[String]): Seq[Array[Float]] = {
        attempts += 1
        if (attempts <= 2) throw new java.net.SocketTimeoutException("Request timed out")
        texts.map(_ => Array(0.1f, 0.1f, 0.1f))
      }
    }
    val r = EmbedPipeline.embedRecord(mockData, flaky, EmbedConfig(retry = fastRetry))
    assert(r.status == "success")
    assert(attempts == 3)
  }

  test("max and first aggregation (pipeline.test.ts:231-259)") {
    val rMax = EmbedPipeline.embedRecord(mockData, fixedProvider(Array(1f, 5f, 3f)),
      EmbedConfig(aggregation = "max"))
    assert(rMax.status == "success" && rMax.vector.length == 3)
    val rFirst = EmbedPipeline.embedRecord(mockData, fixedProvider(Array(1f, 2f, 3f)),
      EmbedConfig(aggregation = "first"))
    assert(rFirst.status == "success")
    assert(rFirst.vector.sameElements(Array(1f, 2f, 3f)))
  }

  test("customText embeds verbatim when type is custom (pipeline.test.ts:274-286)") {
    val p = new TrackingProvider
    EmbedPipeline.embedRecord(mockData, p, EmbedConfig(inputType = "custom"),
      customText = Some("This is my custom static text for embedding."))
    assert(p.calls.head.head == "This is my custom static text for embedding.")
  }

  test("multi-chunk text aggregates across provider calls (pipeline.test.ts:310-339)") {
    val longData = Embed.InputData(textContent = Some(Array.fill(500)("word").mkString(" ")))
    val p = new TrackingProvider
    val r = EmbedPipeline.embedRecord(longData, p,
      EmbedConfig(chunkSize = 100, chunkOverlap = 10, batchSize = 1))
    assert(r.status == "success")
    assert(r.n_chunks > 1)
    assert(p.calls.length == r.n_chunks, "batchSize=1 → one call per chunk")
    assert(r.vector.length == 3)
  }

  test("skips on empty and whitespace-only input (pipeline.test.ts:359-379)") {
    assert(EmbedPipeline.embedRecord(Embed.InputData(textContent = Some("")),
      fixedProvider(Array(1f))).status == "skipped")
    assert(EmbedPipeline.embedRecord(Embed.InputData(textContent = Some("   \n\t   ")),
      fixedProvider(Array(1f))).status == "skipped")
  }

  test("non-retryable provider error → skipped with the message (pipeline.test.ts:381-398)") {
    val bad = new EmbeddingProvider {
      def name = "failing-provider"
      def embed(texts: Seq[String]): Seq[Array[Float]] = throw new RuntimeException("Invalid API key")
    }
    val r = EmbedPipeline.embedRecord(mockData, bad,
      EmbedConfig(retry = fastRetry.copy(maxAttempts = 1)))
    assert(r.status == "skipped")
    assert(r.reason.contains("Invalid API key"))
  }

  test("title+summary input type assembles title and summary (input.ts:81-103)") {
    val p = new TrackingProvider
    EmbedPipeline.embedRecord(
      Embed.InputData(title = Some("Sample Title"), summary = Some("Sample Summary of suitable length")),
      p, EmbedConfig(inputType = "title+summary"))
    // chunkText whitespace-normalizes before the provider (chunking.ts:22-24),
    // so the title/summary join arrives as a single space
    assert(p.calls.head.head == "Sample Title Sample Summary of suitable length")
  }
}
