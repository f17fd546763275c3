package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Crawl-to-crawl change detection — the snapshot-diff and revisit-dedup
 * operators a recurring web crawl runs between ingests (the semantics CDX
 * "revisit" records encode in web archives: store a payload only when its
 * content hash differs from the previous capture of the same URL).
 * Beyond-reference surface; pure relational Spark.
 *
 * Scale shape: [[diff]] is one url equi-join (shuffle hash join; AQE
 * handles skew/broadcast), [[fetchHistory]] is one window over
 * (url, fetch order) — a single shuffle on url; no driver state, no
 * collects.
 */
object CrawlDelta {

  /** Diff two crawl snapshots `(url, hash)` → one row per url in either
    * snapshot with `status` added | removed | changed | unchanged and both
    * hashes (null on the missing side).
    *
    * Precondition: each snapshot carries AT MOST ONE row per url (a
    * snapshot is by definition one capture per url) — duplicate urls
    * would multiply through the full-outer join. A multi-capture table
    * is [[fetchHistory]]'s input, not this one's; reduce it to a
    * snapshot first (e.g. max fetch_seq per url). */
  def diff(prev: DataFrame, curr: DataFrame,
           keyCol: String = "url", hashCol: String = "hash"): DataFrame = {
    // presence is decided by join-side markers, not hash nullability — a
    // captured-but-hashless row (fetch failed) must still count as present
    val p = prev.select(col(keyCol).cast("string").as("url"),
      col(hashCol).as("prev_hash"), lit(true).as("in_prev"))
    val c = curr.select(col(keyCol).cast("string").as("url"),
      col(hashCol).as("curr_hash"), lit(true).as("in_curr"))
    p.join(c, Seq("url"), "full_outer")
      .withColumn("status",
        when(col("in_prev").isNull, "added")
          .when(col("in_curr").isNull, "removed")
          .when(col("prev_hash") <=> col("curr_hash"), "unchanged")
          .otherwise("changed"))
      .select("url", "prev_hash", "curr_hash", "status")
  }

  /** Classify each fetch of a `(url, fetch_seq, hash)` history:
    * `new` (first capture of the url), `revisit` (hash equals the previous
    * capture's — the CDX revisit case; `stored=false`), `changed`
    * (differs; stored). `fetch_seq` is any totally-ordered capture key
    * (timestamp, crawl id) — unique per url, or the lag order (and thus
    * the classification of the tied captures) is not deterministic. */
  def fetchHistory(history: DataFrame,
                   urlCol: String = "url", seqCol: String = "fetch_seq",
                   hashCol: String = "hash"): DataFrame = {
    val w = Window.partitionBy(col("url")).orderBy(col("fetch_seq"))
    history.select(col(urlCol).cast("string").as("url"),
        col(seqCol).cast("long").as("fetch_seq"), col(hashCol).as("hash"))
      .withColumn("prev_hash", lag(col("hash"), 1).over(w))
      // "new" = first capture by position (null-hash captures included),
      // then null-safe hash comparison for revisit/changed
      .withColumn("status",
        when(row_number().over(w) === 1, "new")
          .when(col("prev_hash") <=> col("hash"), "revisit")
          .otherwise("changed"))
      .withColumn("stored", col("status") =!= "revisit")
  }
}
