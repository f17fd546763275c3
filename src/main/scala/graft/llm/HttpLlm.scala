package graft.llm

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.sources.ScrapeError
import graft.util.HttpBase
import graft.util.HttpBase.{HttpConfig, HttpTransport}

/**
 * L4 — HTTP LLM provider + the seven preset mappings
 * (`/root/reference/src/llm/http.ts:45-262`, `llm/presets.ts:22-283`),
 * ported OFFLINE like [[graft.embed.HttpEmbedding]]: request assembly
 * (OpenAI messages shape, Anthropic messages shape, JSON mode), response
 * parsing (choices / content-blocks), the JSON-extraction fallback chain,
 * mini-schema → JSON-Schema conversion for structured prompting, and the
 * SSRF gate are all real; the socket is an injected [[HttpTransport]].
 */
object HttpLlm {

  private val mapper = new ObjectMapper()

  final case class CompletionOptions(
      systemPrompt: Option[String] = None,
      temperature: Option[Double] = None,
      maxTokens: Option[Int] = None)

  type RequestBuilder = (String, CompletionOptions) => ObjectNode
  type ResponseMapper = JsonNode => String

  /** Default response mapper (http.ts:88-113): OpenAI `choices[0].message
    * .content`, else Anthropic `content[].find(type=text).text`. */
  val defaultResponseMapper: ResponseMapper = res => {
    val fromChoices =
      if (res.has("choices") && res.get("choices").isArray && res.get("choices").size() > 0) {
        val msg = res.get("choices").get(0).get("message")
        if (msg != null && msg.has("content") && msg.get("content").isTextual &&
            msg.get("content").asText().nonEmpty)
          Some(msg.get("content").asText())
        else None
      } else None
    val fromContent = fromChoices.orElse {
      if (res.has("content") && res.get("content").isArray) {
        var found: Option[String] = None
        res.get("content").forEach { c =>
          if (found.isEmpty && c.has("type") && c.get("type").asText() == "text" &&
              c.has("text") && c.get("text").asText().nonEmpty)
            found = Some(c.get("text").asText())
        }
        found
      } else None
    }
    fromContent.getOrElse(
      throw ScrapeError(
        "Unable to parse LLM response. Provide a custom responseMapper.",
        "VALIDATION_ERROR"))
  }

  final class HttpLLMProvider(
      config0: HttpConfig,
      transport: HttpTransport,
      jsonMode: Boolean = false,
      requestBuilder: Option[RequestBuilder] = None,
      responseMapper: ResponseMapper = defaultResponseMapper)
      extends LLMProvider {

    val config: HttpConfig = HttpBase.normalize(config0)
    val name = "http-llm"

    /** Default OpenAI-compatible request (http.ts:61-84). */
    private val buildRequest: RequestBuilder = requestBuilder.getOrElse { (prompt, opts) =>
      val o = mapper.createObjectNode()
      o.put("model", config.model)
      val messages = o.putArray("messages")
      opts.systemPrompt.foreach { sp =>
        val m = messages.addObject(); m.put("role", "system"); m.put("content", sp)
      }
      val u = messages.addObject(); u.put("role", "user"); u.put("content", prompt)
      opts.temperature.foreach(o.put("temperature", _))
      opts.maxTokens.foreach(o.put("max_tokens", _))
      o
    }

    private def postBody(prompt: String, opts: CompletionOptions): String = {
      val body = buildRequest(prompt, opts)
      if (jsonMode) // http.ts:122-128 — response_format appended last
        body.putObject("response_format").put("type", "json_object")
      val raw = HttpBase.post(config, transport, mapper.writeValueAsString(body))
      val content = responseMapper(mapper.readTree(raw))
      if (content.isEmpty) throw ScrapeError("Empty response from LLM", "LLM_ERROR")
      content
    }

    def complete(prompt: String): String = complete(prompt, CompletionOptions())
    def complete(prompt: String, opts: CompletionOptions): String =
      postBody(prompt, opts)

    /** LLMProvider seam used by [[Enhancer]]: a JSON-object completion
      * through the structured prompt assembly (validation happens in the
      * Enhancer's mini-schema layer). */
    def completeJson(prompt: String): String = postBody(prompt, CompletionOptions())

    /** Enhance-path override: route through the full completeJSON assembly
      * (schema prompt + JSON-mode body + validation), like the reference's
      * provider.completeJSON(prompt, zodSchema). */
    override def completeJsonWithSchema(prompt: String, schema: Map[String, String]): String =
      completeJsonSchema(prompt, schema).toString

    /** http.ts:136-196 (`completeJSON`): schema-prompt assembly, JSON-mode
      * request, trim-parse with markdown/surrounding-text extraction
      * fallback, then mini-schema validation (the zod-equivalent layer). */
    def completeJsonSchema(
        prompt: String,
        schema: Map[String, String],
        opts: CompletionOptions = CompletionOptions()): JsonNode = {
      val jsonPrompt =
        s"""$prompt
           |
           |Respond ONLY with valid JSON matching this schema:
           |${stringify2(miniSchemaToJsonSchema(schema))}
           |
           |Do not include any explanation or markdown formatting. Just the JSON object.""".stripMargin
      val effOpts = opts.copy(systemPrompt = opts.systemPrompt.orElse(
        Some("You are a helpful assistant that responds only with valid JSON.")))
      val content = postBody(jsonPrompt, effOpts)
      val node = extractJson(content).getOrElse(
        throw ScrapeError("Failed to parse LLM response as JSON: No JSON found in response",
          "VALIDATION_ERROR"))
      Enhancer.validateSchema(node, schema)
      node
    }
  }

  /** http.ts:177-189 — parse the trimmed content; on failure extract the
    * first `[...]`/`{...}` span (markdown fences, surrounding prose). */
  def extractJson(content: String): Option[JsonNode] = {
    def parse(s: String): Option[JsonNode] =
      try Some(mapper.readTree(s)) catch { case _: Exception => None }
    parse(content.trim).filter(n => n.isObject || n.isArray).orElse {
      val m = java.util.regex.Pattern.compile("[\\[{][\\s\\S]*[\\]}]").matcher(content)
      if (m.find()) parse(m.group()) else None
    }
  }

  /** zodToJsonSchema equivalent for the repo's mini-schema language
    * (`string|number|boolean|string[]|number[]`, `?` marks optional;
    * http.ts:208-262): `{type: object, properties, required}` with array
    * items typed and optionals excluded from `required`. Keys are emitted
    * sorted (the mini-schema is a Map; the reference iterates zod-shape
    * insertion order — sorted is the deterministic stand-in). */
  def miniSchemaToJsonSchema(schema: Map[String, String]): ObjectNode = {
    val root = mapper.createObjectNode()
    root.put("type", "object")
    val props = root.putObject("properties")
    val required = root.putArray("required")
    schema.toSeq.sortBy(_._1).foreach { case (key, tpe0) =>
      val optional = tpe0.endsWith("?")
      val tpe = if (optional) tpe0.dropRight(1) else tpe0
      val p = props.putObject(key)
      tpe match {
        case "string[]" => p.put("type", "array"); p.putObject("items").put("type", "string")
        case "number[]" => p.put("type", "array"); p.putObject("items").put("type", "number")
        case "number"   => p.put("type", "number")
        case "boolean"  => p.put("type", "boolean")
        case _          => p.put("type", "string")
      }
      if (!optional) required.add(key)
    }
    root
  }

  /** `JSON.stringify(x, null, 2)` byte-compatible pretty printer (Jackson's
    * default pretty printer uses a different spacing convention). */
  def stringify2(node: JsonNode): String = {
    val sb = new StringBuilder
    def go(n: JsonNode, indent: Int): Unit = {
      val pad = "  " * indent
      val padIn = "  " * (indent + 1)
      if (n.isObject) {
        val fields = n.properties().iterator()
        if (!fields.hasNext) { sb.append("{}"); return }
        sb.append("{\n")
        var first = true
        n.properties().forEach { e =>
          if (!first) sb.append(",\n")
          first = false
          sb.append(padIn).append(mapper.writeValueAsString(e.getKey)).append(": ")
          go(e.getValue, indent + 1)
        }
        sb.append('\n').append(pad).append('}')
      } else if (n.isArray) {
        if (n.size() == 0) { sb.append("[]"); return }
        sb.append("[\n")
        var i = 0
        while (i < n.size()) {
          if (i > 0) sb.append(",\n")
          sb.append(padIn)
          go(n.get(i), indent + 1)
          i += 1
        }
        sb.append('\n').append(pad).append(']')
      } else sb.append(mapper.writeValueAsString(n))
    }
    go(node, 0)
    sb.toString
  }

  // ---- presets (llm/presets.ts) ----

  private def env(k: String): Option[String] = sys.env.get(k).filter(_.nonEmpty)

  /** presets.ts:22-38 — OpenAI (JSON mode on). */
  def createOpenAI(
      transport: HttpTransport,
      apiKey: Option[String] = None,
      model: Option[String] = None,
      baseUrl: Option[String] = None): HttpLLMProvider = {
    val key = apiKey.orElse(env("OPENAI_API_KEY")).getOrElse(
      throw new IllegalArgumentException(
        "OpenAI API key required. Set OPENAI_API_KEY env var or pass apiKey option."))
    new HttpLLMProvider(
      HttpConfig(
        baseUrl = baseUrl.getOrElse("https://api.openai.com/v1/chat/completions"),
        model = model.getOrElse("gpt-4o-mini"),
        headers = Map("Authorization" -> s"Bearer $key")),
      transport, jsonMode = true)
  }

  /** presets.ts:62-88 — Anthropic: versioned headers, max_tokens default
    * 1024, `system` top-level field, content-block response. */
  def createAnthropic(
      transport: HttpTransport,
      apiKey: Option[String] = None,
      model: Option[String] = None): HttpLLMProvider = {
    val key = apiKey.orElse(env("ANTHROPIC_API_KEY")).getOrElse(
      throw new IllegalArgumentException(
        "Anthropic API key required. Set ANTHROPIC_API_KEY env var or pass apiKey option."))
    val m = model.getOrElse("claude-3-5-haiku-20241022")
    new HttpLLMProvider(
      HttpConfig(
        baseUrl = "https://api.anthropic.com/v1/messages",
        model = m,
        headers = Map("x-api-key" -> key, "anthropic-version" -> "2023-06-01")),
      transport,
      requestBuilder = Some { (prompt, opts) =>
        val o = mapper.createObjectNode()
        o.put("model", m)
        o.put("max_tokens", opts.maxTokens.getOrElse(1024))
        val messages = o.putArray("messages")
        val u = messages.addObject(); u.put("role", "user"); u.put("content", prompt)
        opts.systemPrompt.foreach(o.put("system", _))
        opts.temperature.foreach(o.put("temperature", _))
        o
      },
      responseMapper = res => {
        var found = ""
        if (res.has("content") && res.get("content").isArray)
          res.get("content").forEach { c =>
            if (found.isEmpty && c.get("type").asText() == "text" && c.has("text"))
              found = c.get("text").asText()
          }
        found
      })
  }

  /** presets.ts:100-112 — Groq (OpenAI-compatible, JSON mode on). */
  def createGroq(
      transport: HttpTransport,
      apiKey: Option[String] = None,
      model: Option[String] = None): HttpLLMProvider = {
    val key = apiKey.orElse(env("GROQ_API_KEY")).getOrElse(
      throw new IllegalArgumentException(
        "Groq API key required. Set GROQ_API_KEY env var or pass apiKey option."))
    new HttpLLMProvider(
      HttpConfig(
        baseUrl = "https://api.groq.com/openai/v1/chat/completions",
        model = model.getOrElse("llama-3.1-70b-versatile"),
        headers = Map("Authorization" -> s"Bearer $key")),
      transport, jsonMode = true)
  }

  /** presets.ts:124-132 — Ollama local (http + private allowed). */
  def createOllama(
      transport: HttpTransport,
      model: String,
      baseUrl: Option[String] = None): HttpLLMProvider =
    new HttpLLMProvider(
      HttpConfig(
        baseUrl = baseUrl.getOrElse("http://localhost:11434/v1/chat/completions"),
        model = model,
        requireHttps = false,
        allowPrivate = true),
      transport)

  /** presets.ts:144-152 — LM Studio local. */
  def createLMStudio(
      transport: HttpTransport,
      model: String,
      baseUrl: Option[String] = None): HttpLLMProvider =
    new HttpLLMProvider(
      HttpConfig(
        baseUrl = baseUrl.getOrElse("http://localhost:1234/v1/chat/completions"),
        model = model,
        requireHttps = false,
        allowPrivate = true),
      transport)

  /** presets.ts:164-178 — Together AI (JSON mode on). */
  def createTogether(
      transport: HttpTransport,
      apiKey: Option[String] = None,
      model: Option[String] = None): HttpLLMProvider = {
    val key = apiKey.orElse(env("TOGETHER_API_KEY")).getOrElse(
      throw new IllegalArgumentException(
        "Together API key required. Set TOGETHER_API_KEY env var or pass apiKey option."))
    new HttpLLMProvider(
      HttpConfig(
        baseUrl = "https://api.together.xyz/v1/chat/completions",
        model = model.getOrElse("meta-llama/Llama-3.2-3B-Instruct-Turbo"),
        headers = Map("Authorization" -> s"Bearer $key")),
      transport, jsonMode = true)
  }

  /** presets.ts:192-225 — OpenRouter: referer/title headers, NO json mode. */
  def createOpenRouter(
      transport: HttpTransport,
      model: String,
      apiKey: Option[String] = None,
      siteUrl: Option[String] = None,
      siteName: Option[String] = None): HttpLLMProvider = {
    val key = apiKey.orElse(env("OPENROUTER_API_KEY")).getOrElse(
      throw new IllegalArgumentException(
        "OpenRouter API key required. Set OPENROUTER_API_KEY env var or pass apiKey option."))
    val headers = Map("Authorization" -> s"Bearer $key") ++
      siteUrl.map("HTTP-Referer" -> _) ++ siteName.map("X-Title" -> _)
    new HttpLLMProvider(
      HttpConfig(
        baseUrl = "https://openrouter.ai/api/v1/chat/completions",
        model = model,
        headers = headers),
      transport)
  }
}
