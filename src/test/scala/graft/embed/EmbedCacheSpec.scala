package graft.embed

import org.scalatest.funsuite.AnyFunSuite
import graft.embed.EmbedCache.{cacheKey, checksum, CacheConfig}

/** Ported key-derivation assertions from
  * `/root/reference/test/embeddings/cache.test.ts:13-140`. The LRU/TTL store
  * itself is intentionally NOT ported — at cluster scale the cache is a
  * persisted `(cache_key, vector, …)` table (EmbedPipeline), where eviction
  * is retention policy, not an in-process data structure. */
class EmbedCacheSpec extends AnyFunSuite {

  private val base = CacheConfig(providerKey = "openai-style")

  test("consistent keys for identical inputs (cache.test.ts:13-26)") {
    assert(cacheKey(base, "some content") == cacheKey(base, "some content"))
  }

  test("different content → different keys (cache.test.ts:28-41)") {
    assert(cacheKey(base, "content a") != cacheKey(base, "content b"))
  }

  test("different providers → different keys (cache.test.ts:43-56)") {
    assert(cacheKey(base, "x") != cacheKey(base.copy(providerKey = "other-provider"), "x"))
  }

  test("different models → different keys (cache.test.ts:58-71)") {
    assert(cacheKey(base, "x") != cacheKey(base.copy(model = "model-v2"), "x"))
  }

  test("different dimensions → different keys (cache.test.ts:73-88)") {
    assert(cacheKey(base, "x") != cacheKey(base.copy(dimensions = "256"), "x"))
  }

  test("different input/chunking configs → different keys (cache.test.ts:90-105)") {
    assert(cacheKey(base, "x") != cacheKey(base.copy(inputType = "title+summary"), "x"))
    assert(cacheKey(base, "x") != cacheKey(base.copy(chunkSize = 256), "x"))
    assert(cacheKey(base, "x") != cacheKey(base.copy(chunkOverlap = 0), "x"))
  }

  test("cache salt changes keys (cache.test.ts:107-124)") {
    assert(cacheKey(base, "x") != cacheKey(base.copy(cacheKeySalt = "v2"), "x"))
  }

  test("checksums: consistent, content-sensitive, 16 hex chars (cache.test.ts:126-140)") {
    assert(checksum("hello") == checksum("hello"))
    assert(checksum("hello") != checksum("world"))
    val c = checksum("anything at all")
    assert(c.length == 16)
    assert(c.forall(ch => "0123456789abcdef".contains(ch)))
  }

  test("keys are full sha256 hex (content-addressable table join key)") {
    val k = cacheKey(base, "x")
    assert(k.length == 64)
    assert(k.forall(ch => "0123456789abcdef".contains(ch)))
  }
}
