package graft.embed

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.pipeline.FixtureSupport
import graft.util.HttpBase.CannedTransport

/**
 * Fixture-anchored driver query for the E9/L4 HTTP provider presets: each
 * preset builds its request against an injected [[CannedTransport]] (no
 * socket exists), and the recorded URL / auth headers / request-body JSON
 * are emitted as `(preset, field, value)` rows the driver compares against
 * a VALUES oracle. Expected cells are the reference's own preset contracts
 * (`/root/reference/src/embeddings/providers/presets.ts:33-337`,
 * `src/llm/presets.ts:22-283`) as pinned by its provider test suites —
 * request JSON byte-matches `JSON.stringify` ordering.
 */
object PresetFixtureQueries {

  def httpPresetsFixture(s: SparkSession): DataFrame = {
    import s.implicits._
    import graft.embed.HttpEmbedding._
    import graft.llm.HttpLlm._
    val cases = Seq(
      "openai_embed", "azure_embed", "ollama_embed", "hf_embed", "cohere_embed",
      "openai_llm", "anthropic_llm", "groq_llm", "ollama_llm", "lmstudio_llm")
    FixtureSupport.fixtureDf(s, cases, "preset") { name =>
      val rows: Seq[(String, String)] = name match {
        case "openai_embed" =>
          val t = new CannedTransport((_, _) =>
            """{"data":[{"embedding":[0.1,0.2]}],"usage":{"prompt_tokens":5,"total_tokens":5}}""")
          createOpenAIEmbedding(t, apiKey = Some("test-key"),
            model = Some("custom-model"), organization = Some("org-123")).embed(Seq("hello"))
          Seq(
            "url" -> t.lastUrl,
            "auth" -> t.lastHeaders("Authorization"),
            "org" -> t.lastHeaders("OpenAI-Organization"),
            "content_type" -> t.lastHeaders("Content-Type"),
            "body" -> t.lastBody)
        case "azure_embed" =>
          val t = new CannedTransport((_, _) => """{"data":[{"embedding":[0.1,0.2]}]}""")
          createAzureEmbedding(t, endpoint = "https://my-resource.openai.azure.com",
            deploymentName = "dep-name", apiVersion = "2023-05-15",
            apiKey = Some("azure-key")).embed(Seq("text"))
          Seq(
            "url" -> t.lastUrl,
            "api_key_header" -> t.lastHeaders("api-key"),
            "body" -> t.lastBody)
        case "ollama_embed" =>
          val t = new CannedTransport((_, _) => """{"embedding":[0.1,0.2]}""")
          createOllamaEmbedding(t).embed(Seq("hello"))
          Seq("url" -> t.lastUrl, "body" -> t.lastBody)
        case "hf_embed" =>
          val t = new CannedTransport((_, _) => "[[0.1,0.2]]")
          createHuggingFaceEmbedding(t, model = "sentence-transformers/all-MiniLM-L6-v2",
            apiKey = Some("hf-key")).embed(Seq("hello"))
          Seq(
            "url" -> t.lastUrl,
            "auth" -> t.lastHeaders("Authorization"),
            "body" -> t.lastBody)
        case "cohere_embed" =>
          val t = new CannedTransport((_, _) => """{"embeddings":[[0.1,0.2]]}""")
          createCohereEmbedding(t, apiKey = Some("co-key")).embed(Seq("hello"))
          Seq(
            "url" -> t.lastUrl,
            "auth" -> t.lastHeaders("Authorization"),
            "body" -> t.lastBody)
        case "openai_llm" =>
          val t = new CannedTransport((_, _) =>
            """{"choices":[{"message":{"content":"ok"}}]}""")
          val out = createOpenAI(t, apiKey = Some("test-key")).complete("Q")
          Seq(
            "url" -> t.lastUrl,
            "auth" -> t.lastHeaders("Authorization"),
            "body" -> t.lastBody,
            "completion" -> out)
        case "anthropic_llm" =>
          val t = new CannedTransport((_, _) =>
            """{"content":[{"type":"text","text":"ok"}]}""")
          val out = createAnthropic(t, apiKey = Some("sk-ant-test")).complete("Hi")
          Seq(
            "url" -> t.lastUrl,
            "api_key_header" -> t.lastHeaders("x-api-key"),
            "version" -> t.lastHeaders("anthropic-version"),
            "body" -> t.lastBody,
            "completion" -> out)
        case "groq_llm" =>
          val t = new CannedTransport((_, _) =>
            """{"choices":[{"message":{"content":"ok"}}]}""")
          createGroq(t, apiKey = Some("gq-key")).complete("Q")
          Seq("url" -> t.lastUrl)
        case "ollama_llm" =>
          val t = new CannedTransport((_, _) =>
            """{"choices":[{"message":{"content":"ok"}}]}""")
          createOllama(t, model = "llama3").complete("Q")
          Seq("url" -> t.lastUrl, "body" -> t.lastBody)
        case "lmstudio_llm" =>
          val t = new CannedTransport((_, _) =>
            """{"choices":[{"message":{"content":"ok"}}]}""")
          createLMStudio(t, model = "local-model").complete("Q")
          Seq("url" -> t.lastUrl)
        case _ => Nil
      }
      rows
    }
  }

  val httpPresetsOracle: String = {
    val rows = Seq(
      ("anthropic_llm", "api_key_header", "sk-ant-test"),
      ("anthropic_llm", "body", """{"model":"claude-3-5-haiku-20241022","max_tokens":1024,"messages":[{"role":"user","content":"Hi"}]}"""),
      ("anthropic_llm", "completion", "ok"),
      ("anthropic_llm", "url", "https://api.anthropic.com/v1/messages"),
      ("anthropic_llm", "version", "2023-06-01"),
      ("azure_embed", "api_key_header", "azure-key"),
      ("azure_embed", "body", """{"input":["text"]}"""),
      ("azure_embed", "url", "https://my-resource.openai.azure.com/openai/deployments/dep-name/embeddings?api-version=2023-05-15"),
      ("cohere_embed", "auth", "Bearer co-key"),
      ("cohere_embed", "body", """{"texts":["hello"],"model":"embed-english-v3.0","input_type":"search_document"}"""),
      ("cohere_embed", "url", "https://api.cohere.ai/v1/embed"),
      ("groq_llm", "url", "https://api.groq.com/openai/v1/chat/completions"),
      ("hf_embed", "auth", "Bearer hf-key"),
      ("hf_embed", "body", """{"inputs":["hello"]}"""),
      ("hf_embed", "url", "https://api-inference.huggingface.co/models/sentence-transformers/all-MiniLM-L6-v2"),
      ("lmstudio_llm", "url", "http://localhost:1234/v1/chat/completions"),
      ("ollama_embed", "body", """{"model":"nomic-embed-text","prompt":"hello"}"""),
      ("ollama_embed", "url", "http://localhost:11434/api/embeddings"),
      ("ollama_llm", "body", """{"model":"llama3","messages":[{"role":"user","content":"Q"}]}"""),
      ("ollama_llm", "url", "http://localhost:11434/v1/chat/completions"),
      ("openai_embed", "auth", "Bearer test-key"),
      ("openai_embed", "body", """{"input":["hello"],"model":"custom-model"}"""),
      ("openai_embed", "content_type", "application/json"),
      ("openai_embed", "org", "org-123"),
      ("openai_embed", "url", "https://api.openai.com/v1/embeddings"),
      ("openai_llm", "auth", "Bearer test-key"),
      ("openai_llm", "body", """{"model":"gpt-4o-mini","messages":[{"role":"user","content":"Q"}],"response_format":{"type":"json_object"}}"""),
      ("openai_llm", "completion", "ok"),
      ("openai_llm", "url", "https://api.openai.com/v1/chat/completions")
    )
    FixtureSupport.valuesOracle(rows, "preset")
  }
}
