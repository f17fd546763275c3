package graft.embed

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.VectorOps

/** Ported from `test/embeddings/{chunking,safety,input,aggregation}.test.ts`. */
class EmbedSpec extends AnyFunSuite {
  import Embed._

  // ---- chunking ----

  test("heuristic token count: chars/4 rounded up") {
    assert(heuristicTokenCount("hello") == 2)
    assert(heuristicTokenCount("hello world") == 3)
    assert(heuristicTokenCount("") == 0)
  }

  test("chunkText: stale break point behind startIndex yields empty slice, not a crash (JS slice parity)") {
    // a sentence boundary at ~8900 followed by a punctuation/space-free
    // stretch: once startIndex creeps past the boundary, findBreakPoint's
    // ±20% window still returns it — chunking.ts:146 slice() gives "" and
    // continues; substring() threw StringIndexOutOfBoundsException and the
    // never-throws pipeline silently dropped the whole document
    val doc = "x" * 8899 + ". " + "y" * 5000
    val chunks = chunkText(doc)
    assert(chunks.nonEmpty)
    assert(chunks.forall(_.text.nonEmpty), "emitted chunks are non-empty")
    assert(chunks.last.endIndex == doc.length, "chunking covers the full document")
    assert(chunks.map(_.tokens).sum > 0)
  }

  test("chunkText: empty input → empty") {
    assert(chunkText("").isEmpty)
    assert(chunkText("   ").isEmpty)
  }

  test("chunkText: single chunk for short text") {
    val text = "This is a short text."
    val chunks = chunkText(text)
    assert(chunks.length == 1)
    assert(chunks.head.text == text)
  }

  test("chunkText: long text chunks with overlap, all non-empty") {
    val longText = ("This is sentence number %d. " * 1).format(0) +
      (1 to 400).map(i => s"This is sentence number $i.").mkString(" ")
    val chunks = chunkText(longText, size = 100, overlapIn = 20)
    assert(chunks.length > 1)
    chunks.foreach { c =>
      assert(c.text.nonEmpty)
      assert(c.tokens > 0)
      assert(c.endIndex > c.startIndex)
      assert(c.startIndex >= 0)
    }
  }

  test("chunkText: respects maxInputLength") {
    val text = "word " * 1000
    val chunks = chunkText(text, size = 100, overlapIn = 0, maxInputLength = 1000)
    assert(chunks.map(_.text.length).sum <= 1000)
  }

  test("chunkText: normalizes whitespace") {
    val chunks = chunkText("Hello   world.\n\n\tTest.")
    assert(chunks.head.text == "Hello world. Test.")
  }

  test("needsChunking / estimateTokens (chunking.test.ts:79-92)") {
    assert(!Embed.needsChunking("Hello world", 100))
    assert(Embed.needsChunking("word " * 1000, 100))
    assert(Embed.estimateTokens("Hello world, this is a test.") ==
      Embed.heuristicTokenCount("Hello world, this is a test."))
  }

  test("getChunkingStats (chunking.test.ts:95-110)") {
    val text = "Hello world, this is a test message."
    val st = Embed.getChunkingStats(text)
    assert(st.inputLength == text.length)
    assert(st.estimatedTokens > 0)
    assert(st.estimatedChunks >= 1)
    assert(!st.willTruncate)
    assert(Embed.getChunkingStats("a" * 200000).willTruncate)
    // estimate agrees with materialized chunking on a long text: ceil((T-o)/(s-o))
    val long = Embed.getChunkingStats("This is a sentence. " * 200, size = 100, overlap = 20)
    assert(long.estimatedChunks > 1)
  }

  // ---- PII ----

  test("redact email") {
    val r = redactPii("Contact me at john.doe@example.com for more info.")
    assert(r.redacted)
    assert(r.text == "Contact me at [REDACTED] for more info.")
    assert(r.redactionCount == 1)
    assert(r.redactionsByType("email") == 1)
  }

  test("redact phone numbers") {
    val r = redactPii("Call me at (555) 123-4567 or +1-555-987-6543.")
    assert(r.redacted)
    assert(r.text.contains("[REDACTED]"))
    assert(r.redactionCount == 2)
  }

  test("redact NBSP-separated phone/card numbers (JS \\s includes unicode spaces)") {
    // scraped HTML routinely renders &nbsp; between groups — JS \s matches
    // U+00A0, Java \s does not; the port must not leak these to providers
    val r = redactPii("Call (212) 555 1234 now")
    assert(r.redacted, r.text)
    assert(!r.text.contains("555"), r.text)
    val c = redactPii("Card: 4111 1111 1111 1111 ok")
    assert(c.redacted, c.text)
    assert(!c.text.contains("4111"), c.text)
  }

  test("redact credit cards") {
    val r = redactPii("Card: 4111-1111-1111-1111 or 5500000000000004")
    assert(r.redacted)
    assert(!r.text.contains("4111"))
    assert(!r.text.contains("5500"))
  }

  test("redact SSN") {
    val r = redactPii("SSN: 123-45-6789")
    assert(r.redacted)
    assert(r.text == "SSN: [REDACTED]")
    assert(r.redactionsByType("ssn") == 1)
  }

  test("redact IPv4") {
    val r = redactPii("Server IP: 192.168.1.1 and 10.0.0.254")
    assert(r.redacted)
    assert(!r.text.contains("192.168"))
    assert(!r.text.contains("10.0.0"))
    assert(r.redactionCount == 2)
  }

  test("clean text unchanged") {
    val t = "This is a normal sentence without any personal information."
    val r = redactPii(t)
    assert(!r.redacted && r.text == t && r.redactionCount == 0)
  }

  test("selective patterns: email only") {
    val r = redactPii("Email: test@example.com, Phone: 555-123-4567",
      PiiConfig(creditCard = false, phone = false, ssn = false, ipAddress = false))
    assert(r.text.contains("[REDACTED]"))
    assert(r.text.contains("555-123-4567"))
    assert(r.redactionsByType("email") == 1)
    assert(!r.redactionsByType.contains("phone"))
  }

  test("custom patterns") {
    val r = redactPii("My key is API_KEY_ABC123XYZ and another is API_KEY_DEF456.",
      PiiConfig(creditCard = false, email = false, phone = false, ssn = false, ipAddress = false,
        customPatterns = Seq(java.util.regex.Pattern.compile("API_KEY_[A-Z0-9]+"))))
    assert(r.redacted)
    assert(!r.text.contains("API_KEY_ABC123XYZ"))
    assert(r.redactionCount == 2)
    assert(r.redactionsByType("custom_0") == 2)
  }

  test("containsPii") {
    assert(containsPii("Email: user@test.com"))
    assert(containsPii("Phone: 555-123-4567"))
    assert(!containsPii("Hello, this is a test."))
    assert(!containsPii("Email: user@test.com",
      PiiConfig(creditCard = false, email = false, phone = false, ssn = false, ipAddress = false)))
  }

  // ---- input selection ----

  test("selectInput prefers normalizedText, falls back through the chain") {
    assert(selectInput(InputData(normalizedText = Some("Norm text"), textContent = Some("TC"))).contains("Norm text"))
    assert(selectInput(InputData(textContent = Some("Text content here"))).contains("Text content here"))
    assert(selectInput(InputData(content = Some("# Head\n\nSome **bold** [link](http://x)")))
      .contains("Head\n\nSome bold link"))
    assert(selectInput(InputData(excerpt = Some("An excerpt"))).contains("An excerpt"))
    assert(selectInput(InputData(description = Some("A description"))).contains("A description"))
    assert(selectInput(InputData()).isEmpty)
  }

  test("selectInput title+summary") {
    val r = selectInput(InputData(title = Some("Title"), summary = Some("Summary"), textContent = Some("tc")),
      inputType = "title+summary")
    assert(r.contains("Title\n\nSummary"))
  }

  test("validateInput") {
    assert(!validateInput(None).valid)
    assert(!validateInput(Some("short")).valid)
    assert(!validateInput(Some("aaaaaaaa b c")).valid) // <3 words of len>1
    val v = validateInput(Some("this is meaningful content"))
    assert(v.valid && v.wordCount == 4)
  }

  // ---- aggregation (E5/E6, aggregation.test.ts) ----

  test("aggregate: first / average / max") {
    intercept[IllegalArgumentException](VectorOps.aggregate(Nil, "average"))
    assert(VectorOps.aggregate(Seq(Array(1f, 2f, 3f)), "first").toSeq == Seq(1f, 2f, 3f))
    assert(VectorOps.aggregate(Seq(Array(1f, 2f, 3f), Array(3f, 4f, 5f)), "average").toSeq == Seq(2f, 3f, 4f))
    assert(VectorOps.aggregate(Seq(Array(1f, 5f, 3f), Array(4f, 2f, 6f)), "max").toSeq == Seq(4f, 5f, 6f))
    intercept[IllegalArgumentException](VectorOps.aggregate(Seq(Array(1f), Array(1f, 2f)), "average"))
  }

  test("cosine / euclidean / dot / normalize") {
    val a = Array(1f, 0f, 0f); val b = Array(0f, 1f, 0f)
    assert(VectorOps.cosine(a, a) == 1.0)
    assert(VectorOps.cosine(a, b) == 0.0)
    assert(VectorOps.dot(a, b) == 0.0)
    assert(math.abs(VectorOps.euclidean(a, b) - math.sqrt(2)) < 1e-12)
    assert(math.abs(VectorOps.norm(VectorOps.normalize(Array(3f, 4f))) - 1.0) < 1e-6)
    // aggregation.test.ts:94-123 — zero vector, opposite vectors, identity distance
    assert(VectorOps.norm(VectorOps.normalize(Array(0f, 0f, 0f))) == 0.0) // zero vector unchanged
    assert(VectorOps.cosine(a, Array(-1f, 0f, 0f)) == -1.0)
    assert(VectorOps.euclidean(a, a) == 0.0)
    assert(VectorOps.dot(Array(1f, 2f, 3f), Array(4f, 5f, 6f)) == 32.0)
  }
}
