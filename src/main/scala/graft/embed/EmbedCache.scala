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

  /** Stable (sorted-key) JSON fingerprint — cache.ts `stableStringify`. */
  def fingerprint(c: CacheConfig): String = {
    // keys emitted in sorted order, values JSON-encoded
    val fields = Seq(
      "aggregation" -> ("\"" + c.aggregation + "\""),
      "cacheKeySalt" -> ("\"" + c.cacheKeySalt + "\""),
      "chunking" -> s"""{"overlap":${c.chunkOverlap},"size":${c.chunkSize}}""",
      "dimensions" -> ("\"" + c.dimensions + "\""),
      "input" -> s"""{"type":"${c.inputType}"}""",
      "model" -> ("\"" + c.model + "\""),
      "providerKey" -> ("\"" + c.providerKey + "\"")
    )
    fields.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
  }

  /** sha256(fingerprint + '\0' + content) hex — the content-addressable key. */
  def cacheKey(config: CacheConfig, content: String): String =
    TextOps.sha256Hex(fingerprint(config) + "\u0000" + content)

  /** sha256 first 16 hex — content checksum (cache.ts:65-67). */
  def checksum(content: String): String =
    TextOps.sha256Hex(content).substring(0, 16)
}
