package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** Ported deterministic assertions from
  * `/root/reference/test/llm/enhancer.test.ts` — same mock-provider pattern
  * (responses keyed by prompt markers), same expected values. */
class LlmSpec extends AnyFunSuite {

  /** Mirror of the vitest mock (enhancer.test.ts:7-36). */
  private class MockProvider(responses: Map[String, String] = Map.empty) extends LLMProvider {
    var jsonCalls: Vector[String] = Vector.empty
    var completeCalls: Vector[String] = Vector.empty
    def name = "mock"
    def complete(prompt: String): String = { completeCalls :+= prompt; "mock response" }
    def completeJson(prompt: String): String = {
      jsonCalls :+= prompt
      if (prompt.contains("Summarize")) responses.getOrElse("summary", """{"summary":"Mock summary"}""")
      else if (prompt.contains("tags or keywords")) responses.getOrElse("tags", """{"tags":["mock","tags"]}""")
      else if (prompt.contains("named entities"))
        responses.getOrElse("entities",
          """{"people":[],"organizations":[],"technologies":[],"locations":[],"concepts":[]}""")
      else if (prompt.contains("Classify"))
        responses.getOrElse("classify", """{"contentType":"article","confidence":0.9}""")
      else responses.getOrElse("extract", "{}")
    }
  }

  private val sampleData = EnhanceInput(
    url = "https://example.com/article",
    title = "Test Article",
    description = "Test description",
    textContent = "This is the main content of the article.",
    excerpt = "This is the excerpt.")

  test("enhance returns empty result when no types specified (enhancer.test.ts:57-62)") {
    val p = new MockProvider()
    val r = Enhancer.enhance(sampleData, p, Seq.empty)
    assert(r == Enhanced())
    assert(p.jsonCalls.isEmpty)
  }

  test("summarize adds summary (enhancer.test.ts:64-73)") {
    val p = new MockProvider(Map("summary" -> """{"summary":"Generated summary of the content."}"""))
    val r = Enhancer.enhance(sampleData, p, Seq("summarize"))
    assert(r.summary.contains("Generated summary of the content."))
  }

  test("tags adds suggestedTags (enhancer.test.ts:76-84)") {
    val p = new MockProvider(Map("tags" -> """{"tags":["javascript","testing","web"]}"""))
    val r = Enhancer.enhance(sampleData, p, Seq("tags"))
    assert(r.suggestedTags.contains(Seq("javascript", "testing", "web")))
  }

  test("entities added (enhancer.test.ts:87-104)") {
    val p = new MockProvider(Map("entities" ->
      """{"people":["John Doe"],"organizations":["Acme Corp"],"technologies":["JavaScript"],"locations":["New York"],"concepts":["Web Development"]}"""))
    val r = Enhancer.enhance(sampleData, p, Seq("entities"))
    assert(r.entities.contains(Entities(
      Seq("John Doe"), Seq("Acme Corp"), Seq("JavaScript"), Seq("New York"), Seq("Web Development"))))
  }

  test("classify updates contentType when confidence is high (enhancer.test.ts:107-115)") {
    val p = new MockProvider(Map("classify" -> """{"contentType":"docs","confidence":0.85}"""))
    assert(Enhancer.enhance(sampleData, p, Seq("classify")).contentType.contains("docs"))
  }

  test("classify does NOT update contentType when confidence is low (enhancer.test.ts:117-124)") {
    val p = new MockProvider(Map("classify" -> """{"contentType":"docs","confidence":0.5}"""))
    assert(Enhancer.enhance(sampleData, p, Seq("classify")).contentType.isEmpty)
  }

  test("multiple enhancements both applied, one call each (enhancer.test.ts:127-140)") {
    val p = new MockProvider(Map(
      "summary" -> """{"summary":"Summary"}""", "tags" -> """{"tags":["tag1","tag2"]}"""))
    val r = Enhancer.enhance(sampleData, p, Seq("summarize", "tags"))
    assert(r.summary.contains("Summary"))
    assert(r.suggestedTags.contains(Seq("tag1", "tag2")))
    assert(p.jsonCalls.length == 2)
  }

  test("content preparation: excerpt wins; without excerpt textContent truncated to 10k (enhancer.test.ts:143-171)") {
    val p = new MockProvider()
    Enhancer.enhance(sampleData, p, Seq("summarize"))
    assert(p.jsonCalls.head.contains(sampleData.excerpt))

    val noExcerpt = sampleData.copy(excerpt = "", textContent = "A" * 30000)
    val p2 = new MockProvider()
    Enhancer.enhance(noExcerpt, p2, Seq("summarize"))
    assert(p2.jsonCalls.head.length < 10000 + 500)
    assert(!p2.jsonCalls.head.contains("A" * 10001))
  }

  test("extract validates custom schema (enhancer.test.ts:175-201)") {
    val p = new MockProvider(Map("extract" -> """{"productName":"Widget","price":29.99,"inStock":true}"""))
    val json = Enhancer.extractSchema(sampleData, p,
      Map("productName" -> "string", "price" -> "number", "inStock" -> "boolean"))
    val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    assert(n.get("productName").asText() == "Widget")
    assert(n.get("price").asDouble() == 29.99)
    assert(n.get("inStock").asBoolean())
  }

  test("extract handles optional and array fields (enhancer.test.ts:203-244)") {
    val p = new MockProvider(Map("extract" -> """{"name":"Test"}"""))
    val json = Enhancer.extractSchema(sampleData, p, Map("name" -> "string", "optionalField" -> "string?"))
    assert(json.contains("\"name\":\"Test\""))

    val p2 = new MockProvider(Map("extract" -> """{"tags":["one","two","three"],"scores":[1,2,3]}"""))
    val json2 = Enhancer.extractSchema(sampleData, p2, Map("tags" -> "string[]", "scores" -> "number[]"))
    assert(json2.contains("\"tags\":[\"one\",\"two\",\"three\"]"))

    // missing required field → zod-equivalent failure
    val p3 = new MockProvider(Map("extract" -> """{"other":1}"""))
    intercept[IllegalArgumentException] {
      Enhancer.extractSchema(sampleData, p3, Map("name" -> "string"))
    }
    // wrong type → failure
    val p4 = new MockProvider(Map("extract" -> """{"name":42}"""))
    intercept[IllegalArgumentException] {
      Enhancer.extractSchema(sampleData, p4, Map("name" -> "string"))
    }
  }

  test("extract default prompt includes URL and title (enhancer.test.ts:246-255)") {
    val p = new MockProvider(Map("extract" -> """{"field":"value"}"""))
    Enhancer.extractSchema(sampleData, p, Map("field" -> "string"))
    assert(p.jsonCalls.head.contains(sampleData.url))
    assert(p.jsonCalls.head.contains(sampleData.title))
  }

  test("extract truncates content to 4000 chars (enhancer.ts:171)") {
    val longData = sampleData.copy(excerpt = "", textContent = "B" * 9000)
    val p = new MockProvider(Map("extract" -> """{"f":"v"}"""))
    Enhancer.extractSchema(longData, p, Map("f" -> "string"))
    assert(!p.jsonCalls.head.contains("B" * 4001))
    assert(p.jsonCalls.head.contains("B" * 4000))
  }

  test("ask applies placeholders and appends content when {{content}} absent (enhancer.ts:81-106,111-127)") {
    val p = new MockProvider()
    val r = Enhancer.ask(sampleData, p, "Summarize {{title}} from {{domain}} ({{url}})", "myKey")
    assert(r.custom.contains("myKey"))
    assert(r.custom("myKey") == "\"mock response\"")
    val prompt = p.completeCalls.head
    assert(prompt.startsWith("Summarize Test Article from example.com (https://example.com/article)"))
    assert(prompt.contains("Content:\n" + Enhancer.contentOf(sampleData)))

    // with {{content}} present the prompt is used as-is (no appended context)
    val p2 = new MockProvider()
    Enhancer.ask(sampleData, p2, "Q: {{content}}", "k")
    assert(p2.completeCalls.head == "Q: " + Enhancer.contentOf(sampleData))
  }

  test("ask with schema routes through extract into custom[key] (enhancer.ts:93-97)") {
    val p = new MockProvider(Map("extract" -> """{"answer":"yes"}"""))
    val r = Enhancer.ask(sampleData, p, "Is {{title}} good?", "verdict", Some(Map("answer" -> "string")))
    assert(r.custom("verdict").contains("\"answer\":\"yes\""))
  }

  test("classify rejects values outside the enum (llm/types.ts:72-75)") {
    val p = new MockProvider(Map("classify" -> """{"contentType":"nonsense","confidence":0.99}"""))
    assert(Enhancer.enhance(sampleData, p, Seq("classify")).contentType.isEmpty)
  }

  test("StubLLMProvider is deterministic and prompt-sensitive") {
    val p = new StubLLMProvider()
    assert(p.complete("x") == p.complete("x"))
    assert(p.complete("x") != p.complete("y"))
    val data = EnhanceInput("https://h.example/docs/post-1", "T", "", "First point. Second point.", "")
    val e = Enhancer.enhance(data, p, Seq("summarize", "classify"))
    assert(e.summary.contains("First point."))
    assert(e.contentType.contains("docs"))
  }
}
