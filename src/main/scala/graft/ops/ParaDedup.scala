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
    * Plan shape (optimization round 8, guide §2.3/§8 — decide with small
    * rows, move big rows never): the r7 form regrouped the FULL paragraph
    * text through a `groupBy(id).collect_list(struct(idx, para))` exchange
    * — one whole-corpus text shuffle purely to reassemble rows that were
    * already assembled in the input. This form shuffles only proxies:
    *
    *  1. a narrow flatMap emits `(id, idx, phash)` — hashes, never text;
    *  2. the doc-freq aggregate runs over those light rows;
    *  3. dropped positions `(id, dropIdxs)` come from segs ⋈ boiler
    *     (boiler is tiny by definition — AQE broadcasts it) + a
    *     `collect_list(idx)` regroup of INTS;
    *  4. the input re-attaches the drop list by id (dropped docs are a
    *     small relation in real corpora → AQE broadcast; worst case one
    *     text shuffle, never worse than r7) and a narrow map re-splits
    *     each document ONCE to rebuild `text_deduped` + the accounting
    *     columns — byte-identical output (same split/trim/join, same
    *     xxhash64 keys, `chars_removed` counted in code points exactly
    *     like SQL `length`).
    *
    * The light seg relation is persisted (consumed by the aggregate and
    * the drop join). With `toRelease` (the
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
    // compiled once on the driver and serialized into the task closures —
    // String.split(regex) recompiles the pattern on every call
    val splitPat = java.util.regex.Pattern.compile(splitRegex)

    // light seg relation: (id, idx, phash) — paragraph text never leaves
    // the narrow stage (xxhash64 over the trimmed paragraph, computed by
    // the same codegen expression as r7 so the keys are bit-identical)
    val segs = base.as[(String, String)]
      .flatMap { case (id, text) =>
        val t = if (text == null) "" else text
        splitPat.split(t).iterator.map(_.trim).filter(_.nonEmpty)
          .zipWithIndex.map { case (p, i) => (id, i, p) }
      }
      .toDF("id", "idx", "para")
      .select(col("id"), col("idx"), xxhash64(col("para")).as("phash"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // document frequency per distinct paragraph; only the boilerplate tail
    // (df >= threshold) survives the aggregate — a small relation
    val boiler = segs.groupBy("phash")
      .agg(countDistinct(col("id")).as("doc_freq"))
      .filter(col("doc_freq") >= minDocFreq)
      .select(col("phash"))

    // positions to drop, regrouped per doc — int lists, not text
    val dropLists = segs.join(boiler, Seq("phash"))
      .groupBy("id").agg(collect_list(col("idx")).as("drop_idxs"))

    // rebuild each doc in ONE narrow map over the original rows: re-split,
    // skip dropped positions, rejoin with "\n\n" — the exact output bytes
    // of the r7 array_sort(collect_list) regroup, with zero text shuffled
    val out = base
      .join(dropLists, Seq("id"), "left")
      .select(col("id"), col("text"),
        coalesce(col("drop_idxs"), array().cast("array<int>")).as("drop_idxs"))
      .as[(String, String, Array[Int])]
      .map { case (id, text, dropIdxs) =>
        val t = if (text == null) "" else text
        val paras = splitPat.split(t).iterator.map(_.trim).filter(_.nonEmpty).toArray
        val drop = new java.util.HashSet[Int](math.max(8, dropIdxs.length * 2))
        dropIdxs.foreach(drop.add(_))
        val sb = new java.lang.StringBuilder
        var removed = 0L
        var charsRemoved = 0L
        var i = 0
        while (i < paras.length) {
          val p = paras(i)
          if (drop.contains(i)) {
            removed += 1L
            // SQL length() counts code points, not UTF-16 units — keep the
            // accounting byte-identical to the r7 column expression
            charsRemoved += p.codePointCount(0, p.length).toLong
          } else {
            if (sb.length > 0) sb.append("\n\n")
            sb.append(p)
          }
          i += 1
        }
        (id, sb.toString, paras.length.toLong, removed, charsRemoved)
      }
      .toDF("id", "text_deduped", "paras_total", "paras_removed", "chars_removed")
    if (toRelease != null) { toRelease += segs; out }
    else {
      val materialized = out.localCheckpoint(true)
      segs.unpersist(false)
      materialized
    }
  }
}
