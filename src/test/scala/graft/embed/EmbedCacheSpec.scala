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

  test("redaction-enabled fingerprint matches hand-evaluated stableStringify (cache.ts:41-111)") {
    // Expected string computed BY HAND from the reference serializers for
    //   generateCacheKey({providerKey:'stub', safety:{piiRedaction:{email:true,
    //     phone:true, creditCard:true, ssn:true, ipAddress:true},
    //     minTextLength:10}, input:{type:'textContent'},
    //     chunking:{size:500, overlap:50}})
    // — normalizeObject sorts keys and drops undefined (maxTokens,
    // customPatterns, cacheKeySalt); serializePiiConfig emits all five
    // booleans via `?? false`; numbers/booleans stringify unquoted.
    val cfg = CacheConfig(providerKey = "stub",
      safety = Some(EmbedCache.SafetyFingerprint(
        piiRedaction = Some(EmbedCache.PiiFingerprint()),
        minTextLength = Some(10))))
    val expected =
      """{"aggregation":"average","chunking":{"overlap":50,"size":500,"tokenizer":"heuristic"},""" +
      """"dimensions":"default","input":{"hasCustomText":false,"hasTransform":false,"type":"textContent"},""" +
      """"model":"provider-default","providerKey":"stub",""" +
      """"safety":{"minTextLength":10,"piiRedaction":{"creditCard":true,"email":true,"ipAddress":true,"phone":true,"ssn":true}}}"""
    assert(EmbedCache.fingerprint(cfg) == expected)
  }

  test("safety config variants change keys; absent safety drops the key (cache.ts:90-111)") {
    val withSafety = base.copy(safety = Some(EmbedCache.SafetyFingerprint(
      piiRedaction = Some(EmbedCache.PiiFingerprint()), minTextLength = Some(10))))
    assert(!EmbedCache.fingerprint(base).contains("safety"))
    assert(cacheKey(base, "x") != cacheKey(withSafety, "x"))
    // disabling one pattern, changing minTextLength, adding maxTokens,
    // adding customPatterns — each must produce a distinct key
    val variants = Seq(
      withSafety.copy(safety = withSafety.safety.map(s =>
        s.copy(piiRedaction = s.piiRedaction.map(_.copy(ssn = false))))),
      withSafety.copy(safety = withSafety.safety.map(_.copy(minTextLength = Some(20)))),
      withSafety.copy(safety = withSafety.safety.map(_.copy(maxTokens = Some(8192)))),
      withSafety.copy(safety = withSafety.safety.map(s => s.copy(piiRedaction =
        s.piiRedaction.map(_.copy(customPatterns = Some(Seq("\\bfoo\\b/g"))))))))
    val keys = (withSafety +: variants).map(c => cacheKey(c, "x"))
    assert(keys.distinct.size == keys.size)
    // customPatterns serialize as source/flags JSON strings inside an array
    assert(EmbedCache.fingerprint(variants.last).contains(""""customPatterns":["\\bfoo\\b/g"]"""))
  }

  test("keys are full sha256 hex (content-addressable table join key)") {
    val k = cacheKey(base, "x")
    assert(k.length == 64)
    assert(k.forall(ch => "0123456789abcdef".contains(ch)))
  }
}
