package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Cross-document paragraph deduplication — the frequency-based boilerplate
 * removal step of published web-corpus pipelines (CCNet's paragraph dedup,
 * Wenzek et al. 2020; RefinedWeb's line-level correction, Penedo et al.
 * 2023): a paragraph that recurs across many documents (cookie banners,
 * nav footers, subscribe prompts) is boilerplate and is dropped from every
 * document; paragraphs are compared after trimming, by 64-bit hash.
 *
 * Semantics (deterministic):
 *  - paragraphs = `split(splitRegex)`, trimmed, empties dropped; document
 *    order preserved by index;
 *  - a paragraph is boilerplate iff its document frequency (number of
 *    DISTINCT documents containing it, not occurrence count) is
 *    ≥ `minDocFreq`;
 *  - every occurrence of a boilerplate paragraph is removed (including the
 *    first — the goal is cleaning, not global uniqueness);
 *  - output keeps EVERY input document (empty `text_deduped` when all
 *    paragraphs drop), with `paras_total` / `paras_removed` /
 *    `chars_removed` accounting columns.
 *
 * Scale shape: one flatMap (narrow) → one hash-aggregate on the 64-bit
 * paragraph hash (partial/map-side combine; the aggregate output is only
 * the paragraphs with df ≥ threshold, which is tiny — boilerplate is by
 * definition high-frequency, so there are few distinct values) → one
 * equi-join of segments against that small relation (AQE broadcasts it)
 * → one shuffle back on the document id to reassemble in index order via
 * `array_sort(collect_list(struct(idx, para)))`. Per-task memory is one
 * document's paragraph list. Hash collisions (xxhash64) would conflate
 * two paragraphs at ~2^-64 per pair — the standard trade every published
 * pipeline makes at this step.
 */
object ParaDedup {

  /** Returns `(id, text_deduped, paras_total, paras_removed, chars_removed)`
    * — one row per input row, ids stringified.
    *
    * The paragraph segmentation is consumed twice (doc-freq aggregate +
    * mark join), so it is persisted. With `toRelease` (the
    * [[graft.pipeline.Curate.ledgerPlan]] pattern) the result stays LAZY
    * and the caller releases the persist after materializing; without it,
    * the result is materialized here (eager localCheckpoint) and the
    * persist released before returning — standalone callers leak no
    * cached blocks. */
  def dedupParagraphs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minDocFreq: Int = 3,
      splitRegex: String = "\n{2,}",
      toRelease: scala.collection.mutable.ArrayBuffer[DataFrame] = null): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val base = df.select(col(idCol).cast("string").as("id"), col(textCol).as("text"))

    val segs = base.as[(String, String)]
      .flatMap { case (id, text) =>
        val t = if (text == null) "" else text
        t.split(splitRegex).iterator.map(_.trim).filter(_.nonEmpty)
          .zipWithIndex.map { case (p, i) => (id, i, p) }
      }
      .toDF("id", "idx", "para")
      .withColumn("phash", xxhash64(col("para")))
      // consumed twice (doc-freq aggregate + mark join): persist so the
      // flatMap segmentation runs once, not once per consumer
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // document frequency per distinct paragraph; only the boilerplate tail
    // (df >= threshold) survives the aggregate — a small relation
    val boiler = segs.groupBy("phash")
      .agg(countDistinct(col("id")).as("doc_freq"))
      .filter(col("doc_freq") >= minDocFreq)
      .select(col("phash"), lit(true).as("drop"))

    val marked = segs.join(boiler, Seq("phash"), "left")
      .withColumn("drop", coalesce(col("drop"), lit(false)))

    val rebuilt = marked.groupBy("id").agg(
      concat_ws("\n\n",
        expr("transform(array_sort(collect_list(CASE WHEN NOT drop THEN struct(idx, para) END)), x -> x.para)"))
        .as("text_deduped"),
      count(lit(1)).cast("long").as("paras_total"),
      sum(when(col("drop"), 1L).otherwise(0L)).as("paras_removed"),
      sum(when(col("drop"), length(col("para")).cast("long")).otherwise(0L)).as("chars_removed"))

    // re-attach paragraph-less documents (empty/whitespace text)
    val out = base.select(col("id"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("text_deduped"), lit("")).as("text_deduped"),
        coalesce(col("paras_total"), lit(0L)).as("paras_total"),
        coalesce(col("paras_removed"), lit(0L)).as("paras_removed"),
        coalesce(col("chars_removed"), lit(0L)).as("chars_removed"))
    if (toRelease != null) { toRelease += segs; out }
    else {
      val materialized = out.localCheckpoint(true)
      segs.unpersist(false)
      materialized
    }
  }
}
