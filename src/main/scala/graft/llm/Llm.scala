package graft.llm

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.ops.TextOps

/** Input slice of ScrapedData the enhancer reads (enhancer.ts uses
  * url/title/description/textContent/excerpt only). */
final case class EnhanceInput(
    url: String,
    title: String,
    description: String,
    textContent: String,
    excerpt: String)

/** ExtractedEntities — `/root/reference/src/core/types.ts:30-36`. */
final case class Entities(
    people: Seq[String],
    organizations: Seq[String],
    technologies: Seq[String],
    locations: Seq[String],
    concepts: Seq[String])

/** Partial enhancement result merged into ScrapedData (enhancer.ts:14-65).
  * `custom` holds ask()/extract() results as canonical JSON strings keyed by
  * the caller's key — the `custom?: Record<string,unknown>` escape hatch of
  * `src/core/types.ts:83` mapped per SURVEY §1.2 (JSON-string MapType). */
final case class Enhanced(
    summary: Option[String] = None,
    suggestedTags: Option[Seq[String]] = None,
    entities: Option[Entities] = None,
    contentType: Option[String] = None,
    custom: Map[String, String] = Map.empty)

/** L4 provider boundary (llm/types.ts:15-27). The HTTP presets are external
  * services — out of scope in a zero-egress sandbox; [[StubLLMProvider]] is
  * the deterministic offline implementation. */
trait LLMProvider extends Serializable {
  def name: String
  /** Plain text completion. */
  def complete(prompt: String): String
  /** JSON-mode completion: must return a JSON object string (validated by
    * the caller against the request schema, zod-equivalently). */
  def completeJson(prompt: String): String
  /** The reference enhance path is `provider.completeJSON(prompt, zodSchema)`
    * (enhancer.ts:209-254): providers that can assemble the schema prompt /
    * JSON-mode request (HttpLlm) override this; deterministic stubs fall
    * back to the bare JSON completion. `schema` is the repo's mini-schema
    * language — the zodToJsonSchema byte layout itself is not reproducible
    * offline, so the HTTP request carries the mini-schema JSON-Schema
    * equivalent (same fields/types, documented divergence). */
  def completeJsonWithSchema(prompt: String, schema: Map[String, String]): String =
    completeJson(prompt)
}

/**
 * L1–L3 — the deterministic core of the LLM enhancement surface
 * (`/root/reference/src/llm/enhancer.ts:14-255`): prompt construction,
 * `{{placeholder}}` templating, mini-schema validation, and the
 * confidence-gated classify merge. The provider call itself is external and
 * non-deterministic in the reference; everything around it is replicated.
 */
object Enhancer {

  private val mapper = new ObjectMapper()

  val ClassifyEnum: Set[String] =
    Set("article", "repo", "docs", "package", "video", "tool", "product", "unknown")

  /** enhancer.ts:22 — excerpt wins, else textContent truncated to 10k. */
  def contentOf(data: EnhanceInput): String =
    if (data.excerpt != null && data.excerpt.nonEmpty) data.excerpt
    else Option(data.textContent).getOrElse("").take(10000)

  /** enhancer.ts:23. */
  def contextOf(data: EnhanceInput): String =
    s"Title: ${data.title}\nURL: ${data.url}\n\nContent:\n${contentOf(data)}"

  // -- prompt templates (enhancer.ts:204-255, byte-for-byte) --
  def summarizePrompt(context: String): String =
    s"Summarize the following content in 2-3 concise sentences:\n\n$context"
  def tagsPrompt(context: String): String =
    s"Extract 5-10 relevant tags or keywords from the following content. Focus on technologies, concepts, and topics mentioned:\n\n$context"
  def entitiesPrompt(context: String): String =
    s"Extract named entities from the following content. Identify people, organizations, technologies, locations, and key concepts:\n\n$context"
  def classifyPrompt(context: String): String =
    "Classify the following content into one of these categories:\n" +
    "- article: Blog post, news article, essay\n" +
    "- repo: Code repository, open source project\n" +
    "- docs: Documentation, API reference, guides\n" +
    "- package: npm/pip package page\n" +
    "- video: Video content, YouTube\n" +
    "- tool: Software tool, web application\n" +
    "- product: Commercial product, e-commerce\n\n" + context

  /** enhancer.ts:111-127 — `{{title}}/{{url}}/{{content}}/{{description}}/
    * {{excerpt}}/{{domain}}` substitution. */
  def applyPlaceholders(prompt: String, data: EnhanceInput, content: String): String = {
    val domain = graft.urlx.WUrl.parse(data.url).map(_.hostname).getOrElse("")
    prompt
      .replace("{{title}}", Option(data.title).getOrElse(""))
      .replace("{{url}}", Option(data.url).getOrElse(""))
      .replace("{{content}}", content)
      .replace("{{description}}", Option(data.description).getOrElse(""))
      .replace("{{excerpt}}", Option(data.excerpt).getOrElse(""))
      .replace("{{domain}}", domain)
  }

  private def strings(n: JsonNode, field: String): Seq[String] = {
    val a = n.get(field)
    if (a == null || !a.isArray) Seq.empty
    else {
      val b = Seq.newBuilder[String]
      a.forEach(v => b += v.asText())
      b.result()
    }
  }

  /** L1 `enhance` (enhancer.ts:14-65): run the requested enhancement types
    * and merge — classify applied only when confidence > 0.7. The reference
    * runs them in parallel promises; per-row sequential execution is the
    * Spark-partition equivalent (parallelism comes from partitions). */
  def enhance(data: EnhanceInput, provider: LLMProvider, types: Seq[String]): Enhanced = {
    val context = contextOf(data)
    var out = Enhanced()
    // per-type schemas mirroring types.ts:56-77 (SummarySchema/TagsSchema/
    // EntitiesSchema/ClassifySchema) in the mini-schema language — routed
    // through completeJsonWithSchema so HTTP providers assemble the
    // schema prompt + JSON-mode request exactly like completeJSON
    if (types.contains("summarize")) {
      val n = mapper.readTree(provider.completeJsonWithSchema(
        summarizePrompt(context), Map("summary" -> "string")))
      out = out.copy(summary = Option(n.get("summary")).map(_.asText()))
    }
    if (types.contains("tags")) {
      val n = mapper.readTree(provider.completeJsonWithSchema(
        tagsPrompt(context), Map("tags" -> "string[]")))
      out = out.copy(suggestedTags = Some(strings(n, "tags")))
    }
    if (types.contains("entities")) {
      val n = mapper.readTree(provider.completeJsonWithSchema(
        entitiesPrompt(context), Map(
          "people" -> "string[]", "organizations" -> "string[]",
          "technologies" -> "string[]", "locations" -> "string[]",
          "concepts" -> "string[]")))
      out = out.copy(entities = Some(Entities(
        strings(n, "people"), strings(n, "organizations"), strings(n, "technologies"),
        strings(n, "locations"), strings(n, "concepts"))))
    }
    if (types.contains("classify")) {
      val n = mapper.readTree(provider.completeJsonWithSchema(
        classifyPrompt(context), Map("contentType" -> "string", "confidence" -> "number")))
      val ct = Option(n.get("contentType")).map(_.asText()).filter(ClassifyEnum.contains)
      val conf = Option(n.get("confidence")).map(_.asDouble()).getOrElse(0.0)
      if (conf > 0.7) out = out.copy(contentType = ct) // enhancer.ts:55 gate
    }
    out
  }

  /** L2 `extract` (enhancer.ts:132-199): mini-schema
    * (`string|number|boolean|string[]|number[]`, `?` = optional) → validated
    * canonical JSON. Throws on schema violation (zod-equivalent); callers in
    * a Spark stage catch into the error column. */
  def extractSchema(
      data: EnhanceInput,
      provider: LLMProvider,
      schema: Map[String, String],
      promptTemplate: Option[String] = None): String = {
    val content = Option(data.textContent).getOrElse("").take(4000) // enhancer.ts:171
    val prompt = promptTemplate match {
      case Some(t) =>
        val p = applyPlaceholders(t, data, content)
        if (!t.contains("{{content}}")) p + s"\n\nContext:\n$content" else p
      case None =>
        s"Extract the following information from this content:\n\nTitle: ${data.title}\nURL: ${data.url}\n\nContent:\n$content\n\nExtract these fields:\n" +
        schema.toSeq.sortBy(_._1).map { case (k, t) => s"- $k ($t)" }.mkString("\n")
    }
    val node = mapper.readTree(provider.completeJson(prompt))
    validateSchema(node, schema)
    mapper.writeValueAsString(node)
  }

  /** zod-shape check for the mini-schema (enhancer.ts:139-169). Public so
    * the L4 HTTP providers' completeJSON path reuses the same validation. */
  def validateSchema(node: JsonNode, schema: Map[String, String]): Unit = {
    schema.foreach { case (key, tpe) =>
      val optional = tpe.endsWith("?")
      val base = if (optional) tpe.dropRight(1) else tpe
      val v = node.get(key)
      if (v == null || v.isNull) {
        if (!optional) throw new IllegalArgumentException(s"missing required field '$key'")
      } else {
        val ok = base match {
          case "number"   => v.isNumber
          case "boolean"  => v.isBoolean
          case "string[]" => v.isArray && { var r = true; v.forEach(e => r &&= e.isTextual); r }
          case "number[]" => v.isArray && { var r = true; v.forEach(e => r &&= e.isNumber); r }
          case _          => v.isTextual // string + unknown types default to string
        }
        if (!ok) throw new IllegalArgumentException(s"field '$key' is not a $base")
      }
    }
  }

  /** L3 `ask` (enhancer.ts:81-106): templated custom question → `custom[key]`.
    * With a schema, routes through [[extractSchema]]; else a plain completion.
    * Returns the result as canonical JSON text (string responses JSON-quoted)
    * so the `custom` MapType column has one uniform value encoding. */
  def ask(
      data: EnhanceInput,
      provider: LLMProvider,
      prompt: String,
      key: String = "response",
      schema: Option[Map[String, String]] = None): Enhanced = {
    val content = contentOf(data)
    val processed = applyPlaceholders(prompt, data, content)
    schema match {
      case Some(sc) =>
        Enhanced(custom = Map(key -> extractSchema(data, provider, sc, Some(prompt))))
      case None =>
        val fullPrompt =
          if (prompt.contains("{{content}}")) processed
          else s"$processed\n\nTitle: ${data.title}\nURL: ${data.url}\n\nContent:\n$content"
        val response = provider.complete(fullPrompt)
        Enhanced(custom = Map(key -> mapper.writeValueAsString(response)))
    }
  }
}

/**
 * Deterministic offline provider: derives every response as a pure function
 * of the prompt (dispatching on the enhancer's own prompt markers, like the
 * reference's test mock, `/root/reference/test/llm/enhancer.test.ts:7-36`).
 * Rules are simple enough to re-encode independently in the DuckDB oracle
 * (`llm_enhance` query).
 */
final class StubLLMProvider extends LLMProvider {
  def name = "stub"

  /** "stub:" + first 12 hex of sha256(prompt) — pins the exact prompt bytes,
    * so templating/assembly errors change the output. */
  def complete(prompt: String): String =
    "stub:" + TextOps.sha256Hex(prompt).substring(0, 12)

  private def embeddedContent(prompt: String): String = {
    val m = prompt.indexOf("\n\nContent:\n")
    if (m < 0) "" else prompt.substring(m + "\n\nContent:\n".length)
  }
  private def embeddedUrl(prompt: String): String = {
    val s = prompt.indexOf("\nURL: ")
    if (s < 0) return ""
    val from = s + "\nURL: ".length
    val e = prompt.indexOf('\n', from)
    if (e < 0) prompt.substring(from) else prompt.substring(from, e)
  }

  def completeJson(prompt: String): String = {
    val mapper = new ObjectMapper()
    val o = mapper.createObjectNode()
    val content = embeddedContent(prompt)
    if (prompt.startsWith("Summarize")) {
      // first sentence (up to and including the first '.'), else whole content
      val dot = content.indexOf('.')
      o.put("summary", if (dot >= 0) content.substring(0, dot + 1) else content)
    } else if (prompt.startsWith("Extract 5-10 relevant tags")) {
      val a = o.putArray("tags")
      // first 5 distinct lowercased words of length >= 6, in appearance order
      val seen = scala.collection.mutable.LinkedHashSet.empty[String]
      content.split("[^\\p{L}]+").iterator
        .map(_.toLowerCase(java.util.Locale.ROOT)).filter(_.length >= 6)
        .takeWhile(_ => seen.size < 5).foreach(seen += _)
      seen.take(5).foreach(a.add)
    } else if (prompt.startsWith("Extract named entities")) {
      // capitalized tokens after position 0 of each sentence → people bucket
      val caps = content.split("[^\\p{L}]+").iterator.drop(1)
        .filter(w => w.length >= 4 && w.head.isUpper).take(3).toSeq
      val p = o.putArray("people"); caps.foreach(p.add)
      o.putArray("organizations"); o.putArray("technologies")
      o.putArray("locations")
      val c = o.putArray("concepts"); if (content.nonEmpty) c.add("content")
    } else if (prompt.startsWith("Classify")) {
      val url = embeddedUrl(prompt)
      val (ct, conf) =
        if (url.contains("/docs/")) ("docs", 0.9)
        else if (url.contains("/news/")) ("article", 0.9)
        else if (url.contains("/blog/")) ("article", 0.6) // below the 0.7 gate
        else ("unknown", 0.8)
      o.put("contentType", ct)
      o.put("confidence", conf)
    } else {
      // extract-schema default: echo deterministic field stubs
      o.put("response", complete(prompt))
    }
    mapper.writeValueAsString(o)
  }
}
