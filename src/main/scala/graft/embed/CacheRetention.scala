package graft.embed

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Retention semantics for the PERSISTED embedding-cache table — the
 * cluster-scale re-expression of the reference's in-memory LRU+TTL cache
 * (`/root/reference/src/embeddings/cache.ts:195-315`,
 * `InMemoryEmbeddingCache`): per-entry `createdAt` / `expiresAt` /
 * `accessedAt` bookkeeping, TTL expiry on read, access-time updates for
 * LRU, `cleanup()` sweeping expired entries, max-entries eviction by
 * least-recent access, and the `getStats()` surface including the
 * expired count.
 *
 * Mapping to a table (documented equivalence): the reference evicts ONE
 * minimum-`accessedAt` entry per overflowing `set()`; with a monotonic
 * clock the state after any sequence of sets/gets is exactly "the
 * `maxEntries` most-recently-accessed unexpired entries" — which is what
 * [[enforceMaxEntries]] computes in one batch. Ties (same `accessed_at`)
 * break by later `created_at`, then key — the reference's tie order is
 * Map-iteration incidental, so the table picks a DETERMINISTIC one.
 *
 * Scale shape: expiry and touch are narrow ops; the LRU cut ranks the
 * whole table by recency through [[graft.ops.PrefixSum]] — one logical
 * group range-split across partitions, so a 10^9-row cache never sorts
 * in a single task and nothing collects to the driver. All operators
 * take the clock as an argument (`nowMs`) — no hidden `Date.now`, so
 * runs replay deterministically and the DuckDB oracle can follow.
 */
object CacheRetention {

  /** cache.ts:15 / :20 — the reference defaults. */
  val DefaultMaxEntries: Long = 1000L
  val DefaultTtlMs: Long = 60L * 60L * 1000L

  private val TsCols = Seq("created_at", "expires_at", "accessed_at")

  /** Stamp plain cache rows (the `set()` path): created/accessed = now,
    * expires = now + ttl. */
  def withTimestamps(cacheRows: DataFrame, nowMs: Long,
                     ttlMs: Long = DefaultTtlMs): DataFrame =
    cacheRows
      .withColumn("created_at", lit(nowMs))
      .withColumn("expires_at", lit(nowMs + ttlMs))
      .withColumn("accessed_at", lit(nowMs))

  /** The lookup view (drop bookkeeping) — what the embed pipeline's cache
    * join consumes. */
  def asLookup(cache: DataFrame): DataFrame = cache.drop(TsCols: _*)

  /** `get()`'s TTL check as a filter: only entries with `now <= expires_at`
    * may hit (cache.ts:221-226 deletes on read; the table form filters on
    * read and physically drops in [[cleanup]]). */
  def unexpired(cache: DataFrame, nowMs: Long): DataFrame =
    cache.filter(col("expires_at") >= lit(nowMs))

  /** `get()`'s access-time update for LRU (cache.ts:228-229): entries whose
    * key is in `hitKeys(cache_key)` get `accessed_at = now`. Left join on
    * the content-hash key — hash-partitionable, skew-free. */
  def touch(cache: DataFrame, hitKeys: DataFrame, nowMs: Long): DataFrame =
    cache
      .join(hitKeys.select(col("cache_key")).distinct()
        .withColumn("__hit", lit(true)), Seq("cache_key"), "left")
      .withColumn("accessed_at",
        when(col("__hit"), lit(nowMs)).otherwise(col("accessed_at")))
      .drop("__hit")

  /** `cleanup()` (cache.ts:283-295): physically drop expired entries;
    * returns (remaining, evicted count). */
  def cleanup(cache: DataFrame, nowMs: Long): (DataFrame, Long) = {
    val keep = cache.filter(lit(nowMs) <= col("expires_at"))
    // one pass: total and surviving counts from a single aggregate instead
    // of the r7 two-count (two full jobs) form — same evicted value
    val row = cache.agg(
      count(lit(1)).as("n"),
      sum(when(lit(nowMs) <= col("expires_at"), 1L).otherwise(0L)).as("kept")).head()
    val evicted = row.getLong(0) - (if (row.isNullAt(1)) 0L else row.getLong(1))
    (keep, evicted)
  }

  /** LRU retention (the batch form of cache.ts:300-315 `evictLRU`): keep
    * the `maxEntries` most-recently-accessed rows. Ranked by
    * (accessed_at desc, created_at desc, cache_key asc) through the
    * distributed prefix sum — no single-task sort, no `orderBy().limit(N)`
    * driver materialization. */
  def enforceMaxEntries(cache: DataFrame, maxEntries: Long): DataFrame = {
    require(maxEntries > 0, "maxEntries must be positive")
    if (cache.count() <= maxEntries) cache
    else {
      val cols = cache.columns
      graft.ops.PrefixSum.rankAndRunningSum(
          cache
            .withColumn("__g", lit(1))
            .withColumn("__neg_acc", -col("accessed_at"))
            .withColumn("__neg_created", -col("created_at")),
          groupCols = Seq("__g"),
          orderCols = Seq("__neg_acc", "__neg_created", "cache_key"),
          rankName = "__recency_rank")
        .filter(col("__recency_rank") <= maxEntries)
        .select(cols.head, cols.tail: _*)
    }
  }

  /** `getStats()` (cache.ts:262-281) — size, capacity, count of expired-
    * but-not-yet-swept entries, utilization. */
  final case class Stats(size: Long, maxEntries: Long, expired: Long,
                         utilization: Double)

  def stats(cache: DataFrame, maxEntries: Long, nowMs: Long): Stats = {
    val row = cache.agg(
      count(lit(1)).as("n"),
      coalesce(sum(when(lit(nowMs) > col("expires_at"), 1L).otherwise(0L)),
        lit(0L)).as("exp")).head()
    val n = row.getLong(0)
    Stats(n, maxEntries, row.getLong(1), n.toDouble / math.max(1L, maxEntries))
  }

  /** The full post-run `set()` lifecycle as ONE batch commit: touch the
    * hit keys, insert the new rows (first-writer-wins on duplicate keys —
    * both against the existing table AND within the batch itself: a Map
    * can never hold two entries per key, so neither may the table), sweep
    * expired, cut to capacity.
    *
    * DELIBERATE DEVIATION from the reference `set()` (ADVICE r7): the
    * reference unconditionally overwrites a live key (refreshing value and
    * all timestamps; `has()` is only consulted for eviction), while this
    * batch commit keeps the EXISTING unexpired row and drops the incoming
    * duplicate — a re-set of a live key therefore retains the original
    * TTL. Rationale: the batch form has no per-call ordering, so
    * last-writer-wins would be nondeterministic within a batch; the
    * pipeline's only caller re-sets a key solely on a cache MISS (the hit
    * path goes through `touch`), so the divergent case is unreachable from
    * [[graft.embed.EmbedPipeline]]. The `cache_retention_fixture` oracle
    * pins this first-writer-wins semantics.
    *
    * The unioned relation is localCheckpoint'ed once: it would otherwise
    * recompute the touch join + union for enforceMaxEntries' count, each
    * prefix-sum pass, and the caller's final write (4+ traversals). */
  def absorb(cache: DataFrame, newRows: DataFrame, hitKeys: DataFrame,
             nowMs: Long, ttlMs: Long = DefaultTtlMs,
             maxEntries: Long = DefaultMaxEntries): DataFrame = {
    val touched = touch(cache, hitKeys, nowMs)
    // within-batch dedupe: one row per cache_key. A batch has no arrival
    // order, so pick the deterministic min over the row's data columns
    // (duplicate keys are the same content hash, so the rows agree in
    // practice — this only pins a replayable choice).
    val dataCols = newRows.columns.filterNot(_ == "cache_key")
    val oneNew = newRows
      .groupBy("cache_key")
      .agg(min(struct(dataCols.map(col): _*)).as("__row"))
      .select(col("cache_key") +: dataCols.map(c => col(s"__row.$c").as(c)): _*)
    // insert-if-absent against the UNEXPIRED keys only: an expired entry is
    // dead (get() deletes it on read in the reference, so set() re-stores) —
    // anti-joining against ALL keys would drop the fresh row AND the sweep
    // below would drop the stale one, silently losing the key entirely
    val fresh = withTimestamps(oneNew, nowMs, ttlMs)
      .join(unexpired(cache, nowMs).select("cache_key"), Seq("cache_key"), "left_anti")
    // direct filter, not cleanup(): absorb discards the eviction count, so
    // the two count() jobs cleanup pays to produce it would be pure waste
    val alive = unexpired(touched.unionByName(fresh), nowMs)
      .localCheckpoint(true)
    enforceMaxEntries(alive, maxEntries)
  }

  /** `validateCachedResult` (cache.ts:334-354): non-success rows are
    * always valid; with no expected dimension everything passes; success
    * rows must carry a vector of exactly the expected dimension. */
  def validateCachedRow(status: String, vector: Array[Float],
                        expectedDimensions: Option[Int]): Boolean =
    status != "success" ||
      expectedDimensions.forall(d => vector != null && vector.length == d)
}
