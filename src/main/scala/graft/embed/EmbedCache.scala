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

  final case class CacheConfig(
      providerKey: String,
      model: String = "provider-default",
      dimensions: String = "default",
      aggregation: String = "average",
      inputType: String = "textContent",
      chunkSize: Int = Embed.DefaultChunkSize,
      chunkOverlap: Int = Embed.DefaultOverlap,
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
