package graft.embed

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Driver fixture for [[CacheRetention]] — a scripted retention sequence
 * over planted timestamped entries, REPLAYED by the DuckDB oracle (filter
 * for TTL, CASE for touch, row_number window for the LRU cut — the window
 * is fine in an oracle; the operator under test is the one that must not
 * window). Sequence:
 *
 *  1. five entries with staggered created/expires/accessed times;
 *  2. `cleanup` at t=1050 — k1 (expires 1000) is swept, k4 (expires 1100)
 *     survives the boundary;
 *  3. `touch(k2, k5, k_missing)` at t=1060 — LRU access-time update,
 *     missing key ignored;
 *  4. `enforceMaxEntries(3)` — k4 (oldest access) evicted; the k2/k5 tie
 *     at 1060 breaks by created_at desc then key;
 *  5. `stats(maxEntries=3)` at t=1060 and the validateCachedResult rows.
 */
object CacheRetentionFixture {

  private val planted: Seq[(String, Long, Long, Long)] = Seq(
    // (key, created_at, expires_at, accessed_at)
    ("k1", 0L, 1000L, 0L),
    ("k2", 100L, 5000L, 100L),
    ("k3", 200L, 5000L, 900L),
    ("k4", 300L, 1100L, 300L),
    ("k5", 400L, 9000L, 400L))

  def fixtureDf(s: SparkSession): DataFrame = {
    import s.implicits._
    val t0 = planted.map { case (k, c, e, a) =>
      (k, Array(0.1f, 0.2f), 1, 1, c, e, a)
    }.toDF("cache_key", "vector", "n_chunks", "tokens",
      "created_at", "expires_at", "accessed_at")
    val (alive, evicted) = CacheRetention.cleanup(t0, nowMs = 1050L)
    val touched = CacheRetention.touch(alive,
      Seq("k2", "k5", "k_missing").toDF("cache_key"), nowMs = 1060L)
    val cut = CacheRetention.enforceMaxEntries(touched, maxEntries = 3L)
    val st = CacheRetention.stats(cut, maxEntries = 3L, nowMs = 1060L)
    val survivors = cut.select("cache_key", "accessed_at").collect()
      .map(r => (s"survivor:${r.getString(0)}", r.getLong(1).toString)).toSeq
    val rows = survivors ++ Seq(
      "evicted_expired" -> evicted.toString,
      "stats_size" -> st.size.toString,
      "stats_expired" -> st.expired.toString,
      // Locale.ROOT: the f interpolator uses the JVM default locale, and a
      // comma-decimal locale would break the hash vs DuckDB's printf
      "stats_utilization" ->
        String.format(java.util.Locale.ROOT, "%.2f", Double.box(st.utilization)),
      "validate_skipped_always" ->
        CacheRetention.validateCachedRow("skipped", null, Some(256)).toString,
      "validate_dim_match" ->
        CacheRetention.validateCachedRow("success", Array(1f, 2f, 3f), Some(3)).toString,
      "validate_dim_mismatch" ->
        CacheRetention.validateCachedRow("success", Array(1f, 2f, 3f), Some(5)).toString,
      "validate_no_expectation" ->
        CacheRetention.validateCachedRow("success", Array(1f), None).toString)
    rows.toDF("item", "value").orderBy("item")
  }

  /** DuckDB replay of the same sequence over the same planted VALUES. */
  def fixtureOracle: String = {
    val values = planted.map { case (k, c, e, a) => s"('$k', $c, $e, $a)" }
      .mkString(", ")
    s"WITH t0(cache_key, created_at, expires_at, accessed_at) AS (VALUES $values), " +
      "alive AS (SELECT * FROM t0 WHERE 1050 <= expires_at), " +
      "touched AS (SELECT cache_key, created_at, expires_at, " +
      "CASE WHEN cache_key IN ('k2', 'k5') THEN 1060 ELSE accessed_at END AS accessed_at FROM alive), " +
      "ranked AS (SELECT *, row_number() OVER (ORDER BY accessed_at DESC, created_at DESC, cache_key) AS r FROM touched), " +
      "cut AS (SELECT * FROM ranked WHERE r <= 3), " +
      "rows AS (" +
      "SELECT 'survivor:' || cache_key AS item, CAST(accessed_at AS VARCHAR) AS value FROM cut " +
      "UNION ALL SELECT 'evicted_expired', CAST((SELECT count(*) FROM t0) - (SELECT count(*) FROM alive) AS VARCHAR) " +
      "UNION ALL SELECT 'stats_size', CAST((SELECT count(*) FROM cut) AS VARCHAR) " +
      "UNION ALL SELECT 'stats_expired', CAST((SELECT count(*) FROM cut WHERE 1060 > expires_at) AS VARCHAR) " +
      "UNION ALL SELECT 'stats_utilization', printf('%.2f', (SELECT count(*) FROM cut) / 3.0) " +
      "UNION ALL SELECT 'validate_skipped_always', 'true' " +
      "UNION ALL SELECT 'validate_dim_match', 'true' " +
      "UNION ALL SELECT 'validate_dim_mismatch', 'false' " +
      "UNION ALL SELECT 'validate_no_expectation', 'true') " +
      "SELECT item, value FROM rows ORDER BY item"
  }
}
