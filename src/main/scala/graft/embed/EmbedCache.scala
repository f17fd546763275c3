package graft.embed

import graft.ops.TextOps

/**
 * E7 — content-addressable embedding cache keys, re-expressing
 * `/root/reference/src/embeddings/cache.ts:41-67`. At cluster scale the LRU
 * becomes `dropDuplicates(cache_key)` before provider calls plus a persisted
 * `(cache_key → vector)` table left-anti-joined against the work set
 * (SURVEY.md §2.6 E7) — the key derivation is the deterministic core.
 */
object EmbedCache {

  /** Fingerprint view of a PiiRedactionConfig (types.ts:159-172) — the
    * serializer emits every boolean with the reference's `?? false`
    * defaulting (cache.ts:102-111), and customPatterns as `source/flags`
    * strings only when present. */
  final case class PiiFingerprint(
      creditCard: Boolean = true, email: Boolean = true, phone: Boolean = true,
      ssn: Boolean = true, ipAddress: Boolean = true,
      customPatterns: Option[Seq[String]] = None)

  /** Fingerprint view of a SafetyConfig (types.ts:174-195; serialized at
    * cache.ts:90-98). `allowSensitiveCallbacks` is deliberately absent: the
    * reference's serializeSafetyConfig omits it, so it never reaches a key. */
  final case class SafetyFingerprint(
      piiRedaction: Option[PiiFingerprint] = None,
      minTextLength: Option[Int] = None,
      maxTokens: Option[Int] = None)

  final case class CacheConfig(
      providerKey: String,
      model: String = "provider-default",
      dimensions: String = "default",
      aggregation: String = "average",
      inputType: String = "textContent",
      chunkSize: Int = Embed.DefaultChunkSize,
      chunkOverlap: Int = Embed.DefaultOverlap,
      /** None ⇔ a reference call with `safety` undefined (key dropped by
        * normalizeObject). The always-redacting pipeline passes the active
        * config via [[EmbedPipeline.cacheConfigFor]] (VERDICT r4 #3). */
      safety: Option[SafetyFingerprint] = None,
      cacheKeySalt: String = "")

  /** JSON.stringify-compatible string escaping (the reference's
    * stableStringify delegates strings to JSON.stringify — raw
    * concatenation produced malformed fingerprints for quote/backslash
    * values and therefore different keys). */
  private def jsonStr(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 2)
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      ch match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
    sb.toString
  }

  /** Stable (sorted-key) JSON fingerprint — cache.ts `stableStringify` over
    * the generateCacheKey params (cache.ts:41-60), with the serializers'
    * exact shapes: chunking includes `tokenizer:"heuristic"`
    * (serializeChunkingConfig, cache.ts:79-87), input carries the
    * hasCustomText/hasTransform booleans (cache.ts:69-77 — both false
    * here; config-level transforms are not modeled), numeric `dimensions`
    * is emitted unquoted like a JS number, and an empty cacheKeySalt is an
    * undefined key, which normalizeObject DROPS. Byte-compatible with a
    * reference run that passes input+chunking configs (this pipeline always
    * does); a reference run with every optional config absent omits the
    * input/chunking keys entirely. */
  def fingerprint(c: CacheConfig): String = {
    val dims = if (c.dimensions.forall(_.isDigit) && c.dimensions.nonEmpty) c.dimensions
               else jsonStr(c.dimensions)
    val fields = Seq.newBuilder[(String, String)]
    fields += "aggregation" -> jsonStr(c.aggregation)
    if (c.cacheKeySalt.nonEmpty) fields += "cacheKeySalt" -> jsonStr(c.cacheKeySalt)
    fields += "chunking" ->
      s"""{"overlap":${c.chunkOverlap},"size":${c.chunkSize},"tokenizer":"heuristic"}"""
    fields += "dimensions" -> dims
    fields += "input" ->
      s"""{"hasCustomText":false,"hasTransform":false,"type":${jsonStr(c.inputType)}}"""
    fields += "model" -> jsonStr(c.model)
    fields += "providerKey" -> jsonStr(c.providerKey)
    // safety (cache.ts:55,90-111): serializeSafetyConfig → normalizeObject
    // with sorted keys and undefined members dropped; piiRedaction's five
    // booleans are always emitted (`?? false`), customPatterns only when the
    // caller supplied patterns. An absent SafetyConfig drops the key.
    c.safety.foreach { sf =>
      val sfFields = Seq.newBuilder[(String, String)]
      sf.maxTokens.foreach(v => sfFields += "maxTokens" -> v.toString)
      sf.minTextLength.foreach(v => sfFields += "minTextLength" -> v.toString)
      sf.piiRedaction.foreach { p =>
        val pFields = Seq.newBuilder[(String, String)]
        pFields += "creditCard" -> p.creditCard.toString
        p.customPatterns.foreach(ps =>
          pFields += "customPatterns" -> ps.map(jsonStr).mkString("[", ",", "]"))
        pFields += "email" -> p.email.toString
        pFields += "ipAddress" -> p.ipAddress.toString
        pFields += "phone" -> p.phone.toString
        pFields += "ssn" -> p.ssn.toString
        sfFields += "piiRedaction" -> pFields.result().sortBy(_._1)
          .map { case (k, v) => jsonStr(k) + ":" + v }.mkString("{", ",", "}")
      }
      fields += "safety" -> sfFields.result().sortBy(_._1)
        .map { case (k, v) => jsonStr(k) + ":" + v }.mkString("{", ",", "}")
    }
    fields.result().sortBy(_._1)
      .map { case (k, v) => jsonStr(k) + ":" + v }.mkString("{", ",", "}")
  }

  /** sha256(fingerprint + '\0' + content) hex — the content-addressable key. */
  def cacheKey(config: CacheConfig, content: String): String =
    TextOps.sha256Hex(fingerprint(config) + "\u0000" + content)

  /** sha256 first 16 hex — content checksum (cache.ts:65-67). */
  def checksum(content: String): String =
    TextOps.sha256Hex(content).substring(0, 16)
}
