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
    * hashes (null on the missing side). */
  def diff(prev: DataFrame, curr: DataFrame,
           keyCol: String = "url", hashCol: String = "hash"): DataFrame = {
    val p = prev.select(col(keyCol).cast("string").as("url"),
      col(hashCol).as("prev_hash"))
    val c = curr.select(col(keyCol).cast("string").as("url"),
      col(hashCol).as("curr_hash"))
    p.join(c, Seq("url"), "full_outer")
      .withColumn("status",
        when(col("prev_hash").isNull, "added")
          .when(col("curr_hash").isNull, "removed")
          .when(col("prev_hash") === col("curr_hash"), "unchanged")
          .otherwise("changed"))
  }

  /** Classify each fetch of a `(url, fetch_seq, hash)` history:
    * `new` (first capture of the url), `revisit` (hash equals the previous
    * capture's — the CDX revisit case; `stored=false`), `changed`
    * (differs; stored). `fetch_seq` is any totally-ordered capture key
    * (timestamp, crawl id). */
  def fetchHistory(history: DataFrame,
                   urlCol: String = "url", seqCol: String = "fetch_seq",
                   hashCol: String = "hash"): DataFrame = {
    val w = Window.partitionBy(col("url")).orderBy(col("fetch_seq"))
    history.select(col(urlCol).cast("string").as("url"),
        col(seqCol).cast("long").as("fetch_seq"), col(hashCol).as("hash"))
      .withColumn("prev_hash", lag(col("hash"), 1).over(w))
      .withColumn("status",
        when(col("prev_hash").isNull, "new")
          .when(col("prev_hash") === col("hash"), "revisit")
          .otherwise("changed"))
      .withColumn("stored", col("status") =!= "revisit")
  }
}
