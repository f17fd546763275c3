package graft.embed

import org.scalatest.funsuite.AnyFunSuite
import graft.embed.HttpEmbedding._
import graft.util.HttpBase
import graft.util.HttpBase.{CannedTransport, HttpConfig}
import graft.sources.ScrapeError

/** E9 preset request/response mappings — ported from
  * `/root/reference/test/embeddings/presets.test.ts` with the mocked fetch
  * replaced by an injected [[CannedTransport]]. */
class HttpEmbeddingSpec extends AnyFunSuite {

  private def canned(json: String) = new CannedTransport((_, _) => json)

  // --- OpenAI (presets.test.ts:31-74) ---

  test("OpenAI: throws if no API key provided") {
    assume(sys.env.get("OPENAI_API_KEY").forall(_.isEmpty))
    val e = intercept[IllegalArgumentException](createOpenAIEmbedding(canned("{}")))
    assert(e.getMessage.contains("OpenAI API key required"))
  }

  test("OpenAI: configures url, headers and exact request body") {
    val t = canned("""{"data":[{"embedding":[0.1,0.2]}],"usage":{"prompt_tokens":5,"total_tokens":5}}""")
    val p = createOpenAIEmbedding(t, apiKey = Some("test-key"),
      model = Some("custom-model"), organization = Some("org-123"))
    val out = p.embed(Seq("hello"))
    assert(t.lastUrl == "https://api.openai.com/v1/embeddings")
    assert(t.lastHeaders("Authorization") == "Bearer test-key")
    assert(t.lastHeaders("OpenAI-Organization") == "org-123")
    assert(t.lastHeaders("Content-Type") == "application/json")
    assert(t.lastBody == """{"input":["hello"],"model":"custom-model"}""")
    assert(out.length == 1 && math.abs(out.head(0) - 0.1f) < 1e-6)
  }

  // --- Azure (presets.test.ts:76-121) ---

  test("Azure: constructs deployment URL, api-key header, model-less body") {
    val t = canned("""{"data":[{"embedding":[0.1,0.2]}]}""")
    val p = createAzureEmbedding(t,
      endpoint = "https://my-resource.openai.azure.com",
      deploymentName = "dep-name", apiVersion = "2023-05-15",
      apiKey = Some("azure-key"))
    p.embed(Seq("text"))
    assert(t.lastUrl ==
      "https://my-resource.openai.azure.com/openai/deployments/dep-name/embeddings?api-version=2023-05-15")
    assert(t.lastHeaders("api-key") == "azure-key")
    assert(t.lastBody == """{"input":["text"]}""")
  }

  test("Azure: trailing slash on the endpoint is stripped") {
    val t = canned("""{"data":[{"embedding":[0.1]}]}""")
    val p = createAzureEmbedding(t, "https://x.openai.azure.com/", "d", "v1", Some("k"))
    p.embed(Seq("a"))
    assert(t.lastUrl == "https://x.openai.azure.com/openai/deployments/d/embeddings?api-version=v1")
  }

  // --- Ollama (presets.test.ts:123-178) ---

  test("Ollama: default local config, single-prompt body") {
    val t = canned("""{"embedding":[0.1]}""")
    val p = createOllamaEmbedding(t)
    p.embed(Seq("t1"))
    assert(t.lastUrl == "http://localhost:11434/api/embeddings")
    assert(t.lastBody.contains(""""prompt":"t1""""))
    assert(t.lastBody == """{"model":"nomic-embed-text","prompt":"t1"}""")
  }

  test("Ollama: custom base URL") {
    val t = canned("""{"embedding":[0.1]}""")
    val p = createOllamaEmbedding(t, baseUrl = Some("http://custom-host:11434/api/embeddings"))
    p.embed(Seq("test"))
    assert(t.lastUrl == "http://custom-host:11434/api/embeddings")
  }

  test("Ollama: batching trips the count-mismatch gate (reference limitation)") {
    val p = createOllamaEmbedding(canned("""{"embedding":[0.1]}"""))
    val e = intercept[ScrapeError](p.embed(Seq("t1", "t2")))
    assert(e.getMessage.contains("Embedding count mismatch: expected 2, got 1"))
  }

  // --- HuggingFace (presets.test.ts:180-230) ---

  test("HuggingFace: bearer token and model-in-URL") {
    val t = canned("[[0.1,0.2]]")
    val p = createHuggingFaceEmbedding(t,
      model = "sentence-transformers/all-MiniLM-L6-v2", apiKey = Some("hf_token"))
    p.embed(Seq("test"))
    assert(t.lastUrl.contains("api-inference.huggingface.co"))
    assert(t.lastUrl.endsWith("/models/sentence-transformers/all-MiniLM-L6-v2"))
    assert(t.lastHeaders("Authorization") == "Bearer hf_token")
    assert(t.lastBody == """{"inputs":["test"]}""")
  }

  test("HuggingFace: 1D response becomes a single embedding") {
    val p = createHuggingFaceEmbedding(canned("[0.1,0.2,0.3]"), model = "test")
    val out = p.embed(Seq("single"))
    assert(out.length == 1)
    assert(out.head.toSeq == Seq(0.1f, 0.2f, 0.3f))
  }

  test("HuggingFace: 2D response maps one embedding per input") {
    val p = createHuggingFaceEmbedding(canned("[[0.1],[0.2]]"), model = "test")
    assert(p.embed(Seq("a", "b")).length == 2)
  }

  // --- Cohere (presets.test.ts:232-263) ---

  test("Cohere: throws without API key; sends input_type search_document") {
    assume(sys.env.get("COHERE_API_KEY").forall(_.isEmpty))
    val e = intercept[IllegalArgumentException](createCohereEmbedding(canned("{}")))
    assert(e.getMessage.contains("Cohere API key required"))

    val t = canned("""{"embeddings":[[0.1],[0.2]]}""")
    val p = createCohereEmbedding(t, apiKey = Some("co-key"))
    p.embed(Seq("a", "b"))
    assert(t.lastUrl == "https://api.cohere.ai/v1/embed")
    assert(t.lastBody.contains(""""input_type":"search_document""""))
    assert(t.lastBody == """{"texts":["a","b"],"model":"embed-english-v3.0","input_type":"search_document"}""")
  }

  // --- default response mapper (http.ts:62-92) ---

  test("default response mapper handles all four wire shapes") {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    def map(j: String) = defaultResponseMapper(m.readTree(j))
    assert(map("""{"data":[{"embedding":[1,2]}]}""").head.toSeq == Seq(1f, 2f))
    assert(map("""{"embeddings":[[3]]}""").head.toSeq == Seq(3f))
    assert(map("""{"embedding":[4,5]}""").head.toSeq == Seq(4f, 5f))
    assert(map("""[[6],[7]]""").length == 2)
    val e = intercept[ScrapeError](map("""{"nope":1}"""))
    assert(e.getMessage.contains("Unable to parse embedding response"))
  }

  // --- SSRF gate (http-base.ts:113-137) ---

  test("SSRF: http rejected by default, private hosts rejected, local waivable") {
    val e1 = intercept[ScrapeError] {
      new HttpEmbeddingProvider(
        HttpConfig("http://api.example.com/v1", "m"), canned("{}"))
    }
    assert(e1.getMessage.contains("HTTPS required"))
    val e2 = intercept[ScrapeError] {
      new HttpEmbeddingProvider(
        HttpConfig("https://192.168.1.5/v1", "m"), canned("{}"))
    }
    assert(e2.getMessage.contains("Private/internal addresses not allowed"))
    // waived for local providers (Ollama pattern)
    new HttpEmbeddingProvider(
      HttpConfig("http://localhost:11434/api", "m", requireHttps = false, allowPrivate = true),
      canned("{}"))
    assert(HttpBase.isPrivateHost("10.0.0.1"))
    assert(HttpBase.isPrivateHost("172.16.0.1"))
    assert(HttpBase.isPrivateHost("fe80::1"))
    assert(!HttpBase.isPrivateHost("8.8.8.8"))
    assert(!HttpBase.isPrivateHost("172.15.0.1"))
  }

  test("SSRF gate: IPv6 literals arrive bracketed from java.net.URI and still match") {
    // URI.getHost on "https://[::1]/" is "[::1]" — the gate must strip the
    // RFC 2732 brackets or every IPv6 private range silently passes
    assert(new java.net.URI("https://[::1]/v1").getHost == "[::1]")
    assert(HttpBase.isPrivateHost("[::1]"))
    assert(HttpBase.isPrivateHost("[fe80::1]"))
    assert(HttpBase.isPrivateHost("[fd00::1]"))
    assert(!HttpBase.isPrivateHost("[2001:db8::1]"))
    val e = intercept[ScrapeError] {
      new HttpEmbeddingProvider(HttpConfig("https://[::1]/v1", "m"), canned("{}"))
    }
    assert(e.getMessage.contains("Private/internal addresses not allowed"))
  }

  test("HTTPS scheme check is case-insensitive (RFC 3986)") {
    HttpBase.validateUrl("HTTPS://api.example.com/v1")
    val e = intercept[ScrapeError] { HttpBase.validateUrl("HTTP://api.example.com/v1") }
    assert(e.getMessage.contains("HTTPS required"))
  }
}
