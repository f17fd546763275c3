package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * WARC → input-table ingest: turns `format("warc")` record scans into the
 * `(url, warc_ts, html, text, lang)` PageRow table the whole pipeline runs
 * on ([[PagesGen]] shape, the BASELINE input_hint). The crawl-archive leg
 * the reference's live fetchers imply at archive scale.
 *
 * Scale shape: the scan parallelism is shard-count (see
 * [[graft.sources.WarcDataSource]]), the warc_type/status filter prunes
 * rows before anything downstream, and the output is a plain column-pruned
 * projection — zero exchanges between file bytes and the extraction
 * mapPartitions that follows.
 */
object WarcIngest {

  /** Raw record table for a path/glob of WARC shards. */
  def records(spark: SparkSession, path: String): DataFrame =
    spark.read.format("warc").load(path)

  /** 200-OK captured documents as the canonical input table. `text`/`lang`
    * start empty — they are extraction OUTPUTS; a Common-Crawl WET-style
    * corpus would populate them, a WARC one does not. */
  def pages(spark: SparkSession, path: String): Dataset[PageRow] = {
    import spark.implicits._
    records(spark, path)
      .where(col("warc_type") === "response" && col("http_status") === 200)
      .select(col("url"), col("warc_ts"), col("payload").as("html"))
      .as[(String, Option[Timestamp], Array[Byte])]
      .map { case (url, ts, html) =>
        PageRow(url, ts.getOrElse(new Timestamp(0L)), html, "", "")
      }
  }
}
