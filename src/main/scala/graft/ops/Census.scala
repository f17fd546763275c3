package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus census — the per-stratum aggregate a training-mix curator reads
 * first. Two tiers of the same report:
 *
 *  - [[exact]]: `count_distinct` over the content hash — the shape the
 *    `doc_corpus_stats` oracle gates. Exact distinct is a full shuffle of
 *    one hash per row per group; fine to sf-scale and for final reports.
 *  - [[approx]]: `approx_count_distinct` (HyperLogLog++) at a chosen
 *    relative-error target. At 10^12 documents this is the census you run
 *    ROUTINELY: the sketch is fixed-size per group, merges map-side, and
 *    never shuffles row-level hashes — the whole census is one partial-agg
 *    pass whatever the corpus size. CensusSpec pins the approximation
 *    inside the configured error bound against the exact tier on the
 *    fixture corpus.
 *
 * Both return one row per stratum: `(strata…, n_docs, sum_chars,
 * n_distinct_texts, min_id, max_id)`.
 */
object Census {

  private def aggs(distinctTexts: org.apache.spark.sql.Column) = Seq(
    count(lit(1)).as("n_docs"),
    sum(length(col("text"))).cast("long").as("sum_chars"),
    distinctTexts.as("n_distinct_texts"),
    min(col("doc_id")).as("min_id"),
    max(col("doc_id")).as("max_id"))

  def exact(docs: DataFrame, strata: Seq[String]): DataFrame = {
    val a = aggs(countDistinct(expr("substring(sha2(text, 256), 1, 32)")))
    docs.groupBy(strata.map(col): _*)
      .agg(a.head, a.tail: _*)
      .orderBy(strata.map(col): _*)
  }

  /** `rsd` = target relative standard deviation of the distinct estimate
    * (Spark default 0.05; smaller = bigger sketch, still fixed-size). */
  def approx(docs: DataFrame, strata: Seq[String], rsd: Double = 0.05): DataFrame = {
    val a = aggs(
      approx_count_distinct(expr("substring(sha2(text, 256), 1, 32)"), rsd))
    docs.groupBy(strata.map(col): _*)
      .agg(a.head, a.tail: _*)
      .orderBy(strata.map(col): _*)
  }
}
