package graft.embed

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{TextOps, VectorOps}

/** Provider boundary for the embedding stage. Real deployments plug an HTTP
  * provider here (per-partition batched calls); the sandbox ships the
  * deterministic [[HashStubProvider]] so the whole stage is testable offline.
  * Re-expresses `/root/reference/src/embeddings/providers/base.ts` as a
  * Serializable trait (one instance per executor via task serialization). */
trait EmbeddingProvider extends Serializable {
  def name: String
  /** Embed a batch of chunk texts. Called per partition with bounded batches. */
  def embed(texts: Seq[String]): Seq[Array[Float]]
}

/** Deterministic stub provider: dimension d of the vector is byte d of
  * sha256(text) scaled to [0,1]. Fully SQL-expressible, which gives the fused
  * E8 stage a DuckDB oracle (`embed_pipeline*` queries). */
class HashStubProvider(val dims: Int = 8) extends EmbeddingProvider {
  def name = "stub"
  def embed(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
    val hex = TextOps.sha256Hex(t)
    Array.tabulate(dims)(d => Integer.parseInt(hex.substring(2 * d, 2 * d + 2), 16) / 255.0f)
  }
}


final case class EmbedConfig(
    inputType: String = "textContent",
    // reference default is TRUE (input.ts:14 via pipeline.ts:61 passing
    // undefined) — must match selectInput's own default or the scalar
    // replay path diverges on documents that carry normalizedText
    preferNormalized: Boolean = true,
    minTextLength: Int = 10,
    piiRedaction: Boolean = true,
    chunkSize: Int = Embed.DefaultChunkSize,
    chunkOverlap: Int = Embed.DefaultOverlap,
    aggregation: String = "average",
    providerKey: String = "stub",
    model: String = "provider-default",
    /** provider batch size per partition-local embed() call */
    batchSize: Int = 32,
    /** partition-local retry for transient provider failures
      * (resilience.ts defaults: 3 attempts, 1s backoff ×2) */
    retry: graft.util.Resilience.RetryConfig = graft.util.Resilience.RetryConfig(),
    /** circuit breaker: after `breakerThreshold` consecutive provider
      * failures within a partition, remaining rows skip without calling the
      * provider (pipeline.ts:163-167 "Circuit breaker is open" skip) */
    breakerThreshold: Int = 5,
    breakerResetMs: Long = 30000)

/** Per-row prepared state after the deterministic front half (select →
  * validate → redact → key). Top-level so Catalyst's generated projections
  * can construct it (a private nested class would fail codegen). */
private[embed] final case class EmbedPrep(
    doc_id: Long, valid: Boolean, reason: String, inputText: String,
    cache_key: String, checksum: String, pii_redacted: Boolean)

/** One output row per input document — never-throws contract: failures become
  * `status = "skipped"` rows with a reason (pipeline.ts:64-66,129-131,269-277). */
final case class EmbedRow(
    doc_id: Long,
    status: String,        // "success" | "skipped"
    reason: String,        // skip reason, "" on success
    cache_key: String,
    checksum: String,
    n_chunks: Int,
    tokens: Int,
    pii_redacted: Boolean,
    cached: Boolean,
    vector: Array[Float])

/**
 * E8 — the fused embedding-pipeline stage, re-expressing
 * `/root/reference/src/embeddings/pipeline.ts:49-278` stage ordering as one
 * Spark job: select input → validate → PII-redact → cache left-join (hits
 * skip the provider entirely) → chunk → provider.embed (batched per
 * partition) → aggregate → union hits + computed + skipped.
 *
 * Scale shape (100 TB): the per-row work (select/validate/redact/chunk) is a
 * narrow mapPartitions; the only wide op is the cache join, an equi-join on
 * the content-addressable `cache_key` (hash-partitionable, no skew: keys are
 * sha256). The cache table is the cluster replacement for the reference's
 * in-process LRU (SURVEY §2.6 E7): content-identical documents across the
 * corpus hit one cached vector instead of N provider calls.
 */
object EmbedPipeline {

  /** The cache-key config a reference run with THIS pipeline's behavior
    * produces (VERDICT r4 #3): the pipeline always passes an explicit
    * `safety` object — `piiRedaction` with the full default pattern set when
    * redaction is on (safety.ts:115-124 `redactPii` defaults), and the
    * always-explicit `minTextLength` (the repo config carries it
    * unconditionally, unlike the reference's optional-with-default-10) — so
    * its keys are byte-identical to a reference call that passes
    * `safety: {piiRedaction: {email/phone/creditCard/ssn/ipAddress: true},
    * minTextLength: cfg.minTextLength}`. */
  def cacheConfigFor(cfg: EmbedConfig): EmbedCache.CacheConfig =
    EmbedCache.CacheConfig(
      providerKey = cfg.providerKey, model = cfg.model,
      aggregation = cfg.aggregation, inputType = cfg.inputType,
      chunkSize = cfg.chunkSize, chunkOverlap = cfg.chunkOverlap,
      safety = Some(EmbedCache.SafetyFingerprint(
        piiRedaction = if (cfg.piiRedaction) Some(EmbedCache.PiiFingerprint()) else None,
        minTextLength = Some(cfg.minTextLength))))

  private def prepare(
      docId: Long, data: Embed.InputData, cfg: EmbedConfig,
      customText: Option[String] = None): EmbedPrep = {
    // Step 2: select input (pipeline.ts:61) — cleanText'd fallback chain
    val raw = Embed.selectInput(data, cfg.inputType, customText, cfg.preferNormalized)
    val validation = Embed.validateInput(raw, cfg.minTextLength)
    if (!validation.valid)
      return EmbedPrep(docId, valid = false, validation.reason.getOrElse(""), "", "", "", pii_redacted = false)
    // Step 3: PII redaction on the validated input (pipeline.ts:71-78)
    val validated = validation.text.get
    val (inputText, redacted) =
      if (cfg.piiRedaction) {
        val r = Embed.redactPii(validated)
        (r.text, r.redacted)
      } else (validated, false)
    // Step 4: content-addressable cache key over the redacted input
    // (pipeline.ts:83-93 — content = inputText AFTER redaction)
    val cc = cacheConfigFor(cfg)
    EmbedPrep(docId, valid = true, "", inputText,
      EmbedCache.cacheKey(cc, inputText), EmbedCache.checksum(inputText), redacted)
  }

  /** Chunk + embed + aggregate one prepared document (pipeline.ts:122-245).
    * Total per row: any provider failure → skipped row, never a thrown task.
    * Provider calls run behind partition-local retry + circuit breaker
    * (pipeline.ts:148-211 resilience wrapping). */
  private def embedOne(
      p: EmbedPrep, provider: EmbeddingProvider, cfg: EmbedConfig,
      breaker: graft.util.CircuitBreaker): EmbedRow = {
    try {
      val chunks = Embed.chunkText(p.inputText, cfg.chunkSize, cfg.chunkOverlap)
      if (chunks.isEmpty)
        return EmbedRow(p.doc_id, "skipped", "No content after chunking",
          p.cache_key, p.checksum, 0, 0, p.pii_redacted, cached = false, Array.empty)
      // breaker OUTSIDE retry (resilience.ts:570-590 withResilience: open
      // check first, then the full retry sequence, then ONE recordSuccess/
      // recordFailure) — retry inside the breaker would count every
      // transient attempt as a breaker failure and open ~maxAttempts×
      // too early
      val vectors = chunks.grouped(cfg.batchSize).flatMap { b =>
        breaker.execute(
          graft.util.Resilience.withRetry(cfg.retry)(provider.embed(b.map(_.text)))._1)
      }.toSeq
      val agg = VectorOps.aggregate(vectors, cfg.aggregation)
      val tokens = chunks.iterator.map(_.tokens).sum
      EmbedRow(p.doc_id, "success", "", p.cache_key, p.checksum,
        chunks.length, tokens, p.pii_redacted, cached = false, agg)
    } catch {
      case e: Exception =>
        EmbedRow(p.doc_id, "skipped", s"${e.getClass.getSimpleName}: ${e.getMessage}",
          p.cache_key, p.checksum, 0, 0, p.pii_redacted, cached = false, Array.empty)
    }
  }

  /** Scalar single-record entry — the reference's `generateEmbeddings(data,
    * options)` shape (pipeline.ts:49-278) for one document, sharing the exact
    * per-row code the Spark stage runs. Used to replay the reference test
    * suite without a cluster; `aggregation = "all"` is deliberately absent:
    * at table scale "keep every chunk vector" is the exploded chunk-level
    * layout, not a ragged column. */
  def embedRecord(
      data: Embed.InputData,
      provider: EmbeddingProvider,
      cfg: EmbedConfig = EmbedConfig(),
      docId: Long = 0L,
      customText: Option[String] = None): EmbedRow = {
    val prep = prepare(docId, data, cfg, customText)
    if (!prep.valid)
      return EmbedRow(docId, "skipped", prep.reason, "", "", 0, 0,
        pii_redacted = false, cached = false, Array.empty)
    embedOne(prep, provider, cfg,
      new graft.util.CircuitBreaker(cfg.breakerThreshold, cfg.breakerResetMs))
  }

  /** Schema of the persisted cache table: one row per content-addressed key. */
  def emptyCache(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.emptyDataset[(String, Array[Float], Int, Int)]
      .toDF("cache_key", "vector", "n_chunks", "tokens")
  }

  /** Result rows → cache-table rows (dedup by key: identical content embeds
    * identically, keep one). */
  def toCacheRows(results: Dataset[EmbedRow]): DataFrame =
    results.toDF()
      .filter(col("status") === "success")
      .select("cache_key", "vector", "n_chunks", "tokens")
      .dropDuplicates("cache_key")

  /** Run metrics — the persisted-table analogue of the reference cache's
    * hit/miss counters (`cache.ts` stats surface): Spark accumulators, one
    * increment per row as it flows through the stage (read after an action).
    * AT-LEAST-ONCE semantics: updates happen inside transformations, so a
    * task retry, speculative duplicate, or a second action over the result
    * re-counts those rows — Spark guarantees exactly-once only for
    * accumulators updated in actions. Use them as live job telemetry;
    * for exact reporting derive counts from the materialized output with
    * [[exactCounters]]. */
  final case class EmbedCounters(
      cacheHits: org.apache.spark.util.LongAccumulator,
      cacheMisses: org.apache.spark.util.LongAccumulator,
      skipped: org.apache.spark.util.LongAccumulator) {
    def hitRate: Double = {
      val total = cacheHits.value + cacheMisses.value
      if (total == 0) 0.0 else cacheHits.value.toDouble / total
    }
  }

  def newCounters(spark: SparkSession): EmbedCounters = EmbedCounters(
    spark.sparkContext.longAccumulator("embed_cache_hits"),
    spark.sparkContext.longAccumulator("embed_cache_misses"),
    spark.sparkContext.longAccumulator("embed_skipped"))

  final case class CounterSnapshot(cacheHits: Long, cacheMisses: Long, skipped: Long) {
    def hitRate: Double = {
      val total = cacheHits + cacheMisses
      if (total == 0) 0.0 else cacheHits.toDouble / total
    }
  }

  /** EXACT counters from a materialized result — one aggregation over the
    * output rows, immune to stage retries and repeated actions. Provider-path
    * rows always carry a non-empty `cache_key` (validation skips carry ""),
    * so: hits = cached rows, misses = non-cached rows that reached the
    * provider path (including provider-failure skips), skipped = rows
    * rejected before the cache join. */
  def exactCounters(result: Dataset[EmbedRow]): CounterSnapshot = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, sum, when}
    val row = result.toDF().agg(
      coalesce(sum(when(col("cached"), 1L).otherwise(0L)), lit(0L)).as("h"),
      coalesce(sum(when(!col("cached") && col("cache_key") =!= "", 1L).otherwise(0L)), lit(0L)).as("m"),
      coalesce(sum(when(col("status") === "skipped" && col("cache_key") === "", 1L).otherwise(0L)), lit(0L)).as("s")
    ).head()
    CounterSnapshot(row.getLong(0), row.getLong(1), row.getLong(2))
  }

  /** Table-level stats of a plain (un-timestamped) cache relation — size +
    * utilization against a logical capacity. The FULL `getStats()` /
    * LRU / TTL surface (`cache.ts:195-315`) lives in [[CacheRetention]]
    * over the timestamped table variant: expiry filter/sweep, access-time
    * touch, max-entries cut via the distributed prefix sum, and the
    * one-batch [[CacheRetention.absorb]] commit. */
  final case class CacheTableStats(size: Long, maxEntries: Long, utilization: Double)

  def cacheStats(cache: DataFrame, maxEntries: Long = 10000): CacheTableStats = {
    val size = cache.count()
    CacheTableStats(size, maxEntries, size.toDouble / math.max(1L, maxEntries))
  }

  /**
   * The fused stage. `docs` must have columns (doc_id: Long, text: String);
   * `cache` is the persisted (cache_key, vector, n_chunks, tokens) table or
   * None for a cold run. `counters`, when supplied, record per-row
   * hit/miss/skip totals as the action runs.
   */
  def embedDocuments(
      spark: SparkSession,
      docs: DataFrame,
      cache: Option[DataFrame],
      provider: EmbeddingProvider,
      cfg: EmbedConfig = EmbedConfig(),
      counters: Option[EmbedCounters] = None): Dataset[EmbedRow] = {
    import spark.implicits._

    val prepped = docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        prepare(id, Embed.InputData(textContent = Option(text)), cfg)
      })

    // ONE pass over the prepared rows: the cache hit (if any) is attached by
    // a single left join on the sha256 key, then one mapPartitions routes
    // each row to skip / hit / provider. The former three-branch union
    // (skipped ∪ hits ∪ computed) re-scanned `docs` and re-ran prepare's
    // five-regex redaction + sha256 once per branch — a second-and-third
    // full pass over the corpus at scale. Equi-join on the sha256 key:
    // uniformly distributed, skew-free; AQE broadcasts the cache side when
    // small and shuffle-hash-joins otherwise — no hint needed. Invalid rows
    // ride the join with cache_key = "" and can never match (the cache
    // stores success rows only, whose keys are non-empty) — and the !valid
    // route wins regardless.
    val withHit: Dataset[(EmbedPrep, Option[(Array[Float], Int, Int)])] = cache match {
      case Some(c) =>
        prepped.toDF().join(
          c.select(col("cache_key"),
            col("vector").as("c_vector"), col("n_chunks").as("c_chunks"),
            col("tokens").as("c_tokens")),
          Seq("cache_key"), "left")
          .select(col("doc_id"), col("valid"), col("reason"), col("inputText"),
            col("cache_key"), col("checksum"), col("pii_redacted"),
            col("c_vector"), col("c_chunks"), col("c_tokens"))
          .as[(Long, Boolean, String, String, String, String, Boolean,
               Option[Array[Float]], Option[Int], Option[Int])]
          .map { case (id, valid, reason, inputText, key, sum, pii, v, nch, tok) =>
            (EmbedPrep(id, valid, reason, inputText, key, sum, pii),
             v.flatMap(vec => nch.flatMap(n => tok.map(t => (vec, n, t)))))
          }
      case None => prepped.map(p => (p, Option.empty[(Array[Float], Int, Int)]))
    }

    // Steps 5-10: chunk → batched provider calls → aggregate, per partition.
    // The breaker is partition-local: once a provider melts down, the rest of
    // the partition's rows skip fast instead of hammering it.
    withHit.mapPartitions { it =>
      val breaker = new graft.util.CircuitBreaker(cfg.breakerThreshold, cfg.breakerResetMs)
      it.map {
        case (p, _) if !p.valid =>
          counters.foreach(_.skipped.add(1))
          EmbedRow(p.doc_id, "skipped", p.reason, "", "", 0, 0, pii_redacted = false,
            cached = false, Array.empty)
        case (p, Some((vec, nch, tok))) =>
          counters.foreach(_.cacheHits.add(1))
          EmbedRow(p.doc_id, "success", "", p.cache_key, p.checksum, nch, tok,
            p.pii_redacted, cached = true, vec)
        case (p, None) =>
          counters.foreach(_.cacheMisses.add(1))
          embedOne(p, provider, cfg, breaker)
      }
    }
  }
}
