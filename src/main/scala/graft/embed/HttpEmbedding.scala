package graft.embed

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.sources.ScrapeError
import graft.util.HttpBase
import graft.util.HttpBase.{HttpConfig, HttpTransport}

/**
 * E9 — HTTP embedding provider + the five preset request/response mappings
 * (`/root/reference/src/embeddings/providers/http.ts:39-140`,
 * `providers/presets.ts:33-337`), ported OFFLINE: every deterministic half —
 * URL construction, header assembly, request-JSON building, response-JSON
 * parsing, count validation, SSRF gate — is real; the socket itself is an
 * injected [[HttpTransport]] (zero-egress build ships no network client).
 *
 * Request bodies byte-match the reference's `JSON.stringify` output
 * (insertion-ordered compact JSON) — pinned in HttpProvidersSpec against the
 * exact strings the reference test suite asserts
 * (`/root/reference/test/embeddings/presets.test.ts:62-71,139-148,245-252`).
 */
object HttpEmbedding {

  private val mapper = new ObjectMapper()

  /** requestBuilder: (texts, model) → request body JSON (http.ts:52-59). */
  type RequestBuilder = (Seq[String], String) => JsonNode
  /** responseMapper: response JSON → one embedding per input (http.ts:62-92). */
  type ResponseMapper = JsonNode => Seq[Array[Float]]

  /** OpenAI-compatible default request: `{ input: texts, model }`. */
  val defaultRequestBuilder: RequestBuilder = (texts, model) => {
    val o = mapper.createObjectNode()
    val arr = o.putArray("input")
    texts.foreach(arr.add)
    o.put("model", model)
    o
  }

  /** Default response mapper handling the four public wire shapes
    * (http.ts:64-92): OpenAI `{data:[{embedding}]}`, simple `{embeddings}`,
    * Ollama `{embedding}`, HuggingFace bare array. */
  val defaultResponseMapper: ResponseMapper = res => {
    def vec(n: JsonNode): Array[Float] = {
      val out = new Array[Float](n.size())
      var i = 0
      while (i < out.length) { out(i) = n.get(i).floatValue(); i += 1 }
      out
    }
    if (res.has("data") && res.get("data").isArray) {
      val d = res.get("data").asInstanceOf[ArrayNode]
      (0 until d.size()).map(i => vec(d.get(i).get("embedding")))
    } else if (res.has("embeddings") && res.get("embeddings").isArray) {
      val e = res.get("embeddings").asInstanceOf[ArrayNode]
      (0 until e.size()).map(i => vec(e.get(i)))
    } else if (res.has("embedding") && res.get("embedding").isArray) {
      Seq(vec(res.get("embedding")))
    } else if (res.isArray) {
      if (res.size() > 0 && res.get(0).isArray) (0 until res.size()).map(i => vec(res.get(i)))
      else Seq(vec(res))
    } else {
      throw ScrapeError(
        "Unable to parse embedding response. Provide a custom responseMapper.",
        "VALIDATION_ERROR")
    }
  }

  /** The provider: plugs into the existing [[EmbeddingProvider]] pipeline
    * seam (E8 calls `embed(texts)`), with the reference's richer
    * per-request model override available via [[embedWith]]. */
  final class HttpEmbeddingProvider(
      config0: HttpConfig,
      transport: HttpTransport,
      requestBuilder: RequestBuilder = defaultRequestBuilder,
      responseMapper: ResponseMapper = defaultResponseMapper)
      extends EmbeddingProvider {

    val config: HttpConfig = HttpBase.normalize(config0)
    val name = "http-embedding"

    def embed(texts: Seq[String]): Seq[Array[Float]] = embedWith(texts, config.model)

    /** http.ts:98-120 — build request, post, map, validate count. */
    def embedWith(texts: Seq[String], model: String): Seq[Array[Float]] = {
      val body = mapper.writeValueAsString(requestBuilder(texts, model))
      val raw = HttpBase.post(config, transport, body)
      val embeddings = responseMapper(mapper.readTree(raw))
      if (embeddings.length != texts.length)
        throw ScrapeError(
          s"Embedding count mismatch: expected ${texts.length}, got ${embeddings.length}",
          "VALIDATION_ERROR")
      embeddings
    }
  }

  // ---- presets (providers/presets.ts) ----

  private def env(k: String): Option[String] = sys.env.get(k).filter(_.nonEmpty)

  /** presets.ts:33-57 — OpenAI. */
  def createOpenAIEmbedding(
      transport: HttpTransport,
      apiKey: Option[String] = None,
      model: Option[String] = None,
      baseUrl: Option[String] = None,
      organization: Option[String] = None): HttpEmbeddingProvider = {
    val key = apiKey.orElse(env("OPENAI_API_KEY")).getOrElse(
      throw new IllegalArgumentException(
        "OpenAI API key required. Set OPENAI_API_KEY env var or pass apiKey option."))
    val headers = Map("Authorization" -> s"Bearer $key") ++
      organization.map("OpenAI-Organization" -> _)
    new HttpEmbeddingProvider(
      HttpConfig(
        baseUrl = baseUrl.getOrElse("https://api.openai.com/v1/embeddings"),
        model = model.getOrElse("text-embedding-3-small"),
        headers = headers),
      transport,
      requestBuilder = defaultRequestBuilder,
      responseMapper = res => {
        val d = res.get("data").asInstanceOf[ArrayNode]
        (0 until d.size()).map { i =>
          val e = d.get(i).get("embedding")
          Array.tabulate(e.size())(j => e.get(j).floatValue())
        }
      })
  }

  /** presets.ts:75-100 — Azure OpenAI: deployment URL assembly, `api-key`
    * header, request WITHOUT the model field. */
  def createAzureEmbedding(
      transport: HttpTransport,
      endpoint: String,
      deploymentName: String,
      apiVersion: String,
      apiKey: Option[String] = None): HttpEmbeddingProvider = {
    val key = apiKey.orElse(env("AZURE_OPENAI_API_KEY")).getOrElse(
      throw new IllegalArgumentException(
        "Azure OpenAI API key required. Set AZURE_OPENAI_API_KEY env var or pass apiKey option."))
    val baseUrl =
      s"${endpoint.replaceFirst("/$", "")}/openai/deployments/$deploymentName/embeddings?api-version=$apiVersion"
    new HttpEmbeddingProvider(
      HttpConfig(baseUrl = baseUrl, model = deploymentName, headers = Map("api-key" -> key)),
      transport,
      requestBuilder = (texts, _) => {
        val o = mapper.createObjectNode()
        val arr = o.putArray("input")
        texts.foreach(arr.add)
        o
      })
  }

  /** presets.ts:115-133 — Ollama: local endpoint (http + private allowed),
    * single-prompt request shape; batching >1 text trips the count-mismatch
    * gate exactly as the reference documents. */
  def createOllamaEmbedding(
      transport: HttpTransport,
      baseUrl: Option[String] = None,
      model: Option[String] = None): HttpEmbeddingProvider =
    new HttpEmbeddingProvider(
      HttpConfig(
        baseUrl = baseUrl.getOrElse("http://localhost:11434/api/embeddings"),
        model = model.getOrElse("nomic-embed-text"),
        requireHttps = false,
        allowPrivate = true),
      transport,
      requestBuilder = (texts, model) => {
        val o = mapper.createObjectNode()
        o.put("model", model)
        o.put("prompt", texts.head)
        o
      },
      responseMapper = res => Seq {
        val e = res.get("embedding")
        Array.tabulate(e.size())(j => e.get(j).floatValue())
      })

  /** presets.ts:148-186 — HuggingFace Inference: model-in-URL, optional
    * bearer, `{inputs}` request, bare-array response (1D single / 2D batch). */
  def createHuggingFaceEmbedding(
      transport: HttpTransport,
      model: String,
      apiKey: Option[String] = None): HttpEmbeddingProvider = {
    val key = apiKey.orElse(env("HF_TOKEN")).orElse(env("HUGGINGFACE_API_KEY"))
    new HttpEmbeddingProvider(
      HttpConfig(
        baseUrl = s"https://api-inference.huggingface.co/models/$model",
        model = model,
        headers = key.map(k => "Authorization" -> s"Bearer $k").toMap),
      transport,
      requestBuilder = (texts, _) => {
        val o = mapper.createObjectNode()
        val arr = o.putArray("inputs")
        texts.foreach(arr.add)
        o
      },
      responseMapper = res => {
        def bad() = throw new IllegalStateException("Unexpected HuggingFace response format")
        if (!res.isArray) bad()
        // Degenerate shapes (ADVICE r3): [[]], [null], [[null]], or mixed
        // rows must surface as the clean provider error — never an NPE and
        // never the flat branch, whose floatValue() would silently read a
        // non-number as 0.0 and store a corrupt all-zero vector.
        if (res.size() > 0 && res.get(0).isArray) {
          (0 until res.size()).map { i =>
            val e = res.get(i)
            if (!e.isArray || e.size() == 0 || !e.get(0).isNumber) bad()
            Array.tabulate(e.size())(j => e.get(j).floatValue())
          }
        } else {
          if ((0 until res.size()).exists(j => !res.get(j).isNumber)) bad()
          Seq(Array.tabulate(res.size())(j => res.get(j).floatValue()))
        }
      })
  }

  /** presets.ts:205-233 — Cohere: `{texts, model, input_type}`. */
  def createCohereEmbedding(
      transport: HttpTransport,
      apiKey: Option[String] = None,
      model: Option[String] = None,
      inputType: String = "search_document"): HttpEmbeddingProvider = {
    val key = apiKey.orElse(env("COHERE_API_KEY")).getOrElse(
      throw new IllegalArgumentException(
        "Cohere API key required. Set COHERE_API_KEY env var or pass apiKey option."))
    new HttpEmbeddingProvider(
      HttpConfig(
        baseUrl = "https://api.cohere.ai/v1/embed",
        model = model.getOrElse("embed-english-v3.0"),
        headers = Map("Authorization" -> s"Bearer $key")),
      transport,
      requestBuilder = (texts, model) => {
        val o = mapper.createObjectNode()
        val arr = o.putArray("texts")
        texts.foreach(arr.add)
        o.put("model", model)
        o.put("input_type", inputType)
        o
      },
      responseMapper = res => {
        val e = res.get("embeddings").asInstanceOf[ArrayNode]
        (0 until e.size()).map { i =>
          val v = e.get(i)
          Array.tabulate(v.size())(j => v.get(j).floatValue())
        }
      })
  }
}
