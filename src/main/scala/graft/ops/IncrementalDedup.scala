package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Incremental dedup against history — the ingest-time shape of corpus
 * dedup at 10^12 documents: crawls arrive in batches, and each batch must
 * dedup against everything accepted before it WITHOUT rescanning the
 * corpus. The history index is two relations:
 *
 *  - `hashes(hash, id)` — content hash of every accepted document;
 *  - `sigs(id, sh, sig)` — sorted shingle-hash set + MinHash signature of
 *    every accepted document (bands are recomputed from `sig` on use:
 *    64 longs per doc, cheaper to store once than 16 band rows).
 *
 * A batch flows: exact-vs-history (equi-join on hash) → exact-in-batch
 * (min-id keeper per hash) → near-vs-history (batch bands ⋈ history
 * bands → estimate prefilter → exact-Jaccard verify; history bands are
 * first LEFT-SEMI-restricted to buckets the batch touches, so nothing
 * history-wide is ever COUNTED — and when the batch is small relative to
 * history, AQE broadcasts the batch keys and history bands never shuffle
 * at all. Buckets larger than `maxBucket` on EITHER side are suppressed
 * via the ONE shared [[DedupOps.suppressMegaBuckets]] rule) →
 * near-in-batch (banded self-join → verify → CC survivors). The
 * per-batch history cost that remained — recomputing bands from `sigs`
 * (a narrow map over all history) and, for batches too large to
 * broadcast, one history-band shuffle into the join — is eliminated by
 * the PERSISTED BAND STORE ([[appendBandsToTable]] /
 * [[dedupeAndCommitIndexed]]): the band relation lives as a third store
 * table bucketed on the full join key (band_idx, band_key) — the
 * [[AnnIndex]] layout — so batch N+1 scans it pre-partitioned for the
 * band join: the history side arrives exchange-free, and only the batch
 * side shuffles (or broadcasts) into the bucket layout. Appends reuse the table's own
 * bucket spec, so commit stays O(batch).
 *
 * [[dedupeBatch]] returns the batch ledger plus the index DELTA — the
 * accepted documents' index rows ONLY, materialized at O(batch) cost.
 * History is never copied: an in-session caller extends its index with
 * [[extended]] (a lazy union of materialized leaves — plan metadata, not
 * data movement), and a production ingest loop uses the parquet-backed
 * store ([[openStore]] / [[appendToStore]] / [[dedupeAndCommit]]): each
 * batch APPENDS files, so the store survives executor loss and session
 * restarts, batch N+1 plans against plain file-scan leaves, and commit
 * cost stays O(batch) forever. (The two appends of one batch are not
 * atomic together — a single-writer loop that can crash mid-commit
 * should stage them, e.g. write both under a batch=N temp dir and
 * rename; the read path tolerates a missing store but not a half one.)
 */
object IncrementalDedup {

  /** Dedup history: `hashes(hash, id)` + `sigs(id, sh, sig)`. */
  final case class Index(hashes: DataFrame, sigs: DataFrame)

  /** One batch's outcome: per-document ledger + the index rows the
    * accepted documents contribute (both eagerly materialized). */
  final case class BatchResult(ledger: DataFrame, delta: Index)

  def emptyIndex(spark: SparkSession): Index = {
    import spark.implicits._
    Index(
      Seq.empty[(String, String)].toDF("hash", "id"),
      Seq.empty[(String, Array[Long], Array[Long])].toDF("id", "sh", "sig"))
  }

  /** Extend an in-memory index with a batch delta: a union of already-
    * materialized leaves — O(1) plan metadata, no history copy. */
  def extended(index: Index, delta: Index): Index =
    Index(index.hashes.union(delta.hashes), index.sigs.union(delta.sigs))

  /** Open the parquet-backed history store; an absent store is an empty
    * index (first batch bootstraps it). */
  def openStore(spark: SparkSession, dir: String): Index = {
    val p = new org.apache.hadoop.fs.Path(dir, "hashes")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) emptyIndex(spark)
    else Index(
      spark.read.parquet(s"$dir/hashes"),
      spark.read.parquet(s"$dir/sigs"))
  }

  /** Append one batch's accepted rows to the store — files are added,
    * history is never rewritten (`sigs` first so a torn commit leaves at
    * worst near-dup rows without their exact-hash twin, not the reverse). */
  def appendToStore(dir: String, delta: Index): Unit = {
    delta.sigs.write.mode("append").parquet(s"$dir/sigs")
    delta.hashes.write.mode("append").parquet(s"$dir/hashes")
  }

  /** Ingest-loop step: dedup `batch` against the store at `dir`, append
    * the accepted delta, return the ledger. */
  def dedupeAndCommit(batch: DataFrame, idCol: String, textCol: String,
                      dir: String,
                      shingleN: Int = 3, minhashK: Int = 64, bandSize: Int = 4,
                      jaccardThreshold: Double = 0.8, estFloor: Double = 0.55,
                      maxBucket: Int = 64): DataFrame = {
    val r = dedupeBatch(batch, idCol, textCol,
      openStore(batch.sparkSession, dir),
      shingleN, minhashK, bandSize, jaccardThreshold, estFloor, maxBucket)
    appendToStore(dir, r.delta)
    r.ledger
  }

  /** Append one batch's accepted band rows `(id, band_idx, band_key)` to
    * the bucketed band store table, creating it on first use. The table is
    * BUCKETED on the FULL band-join key (band_idx, band_key) — the
    * [[AnnIndex]] layout generalized to a composite key: scans report
    * `HashPartitioning(band_idx, band_key, numBuckets)`, which exactly
    * matches the band join's clustering (Spark's default
    * `requireAllClusterKeysForCoPartition` rejects subset-key
    * co-partitioning), so history bands reach the join without an
    * Exchange. Appends mirror the table's OWN catalog bucket spec — a
    * mismatched hand-passed count would silently split buckets across
    * incompatible layouts. */
  def appendBandsToTable(deltaSigs: DataFrame, tableName: String,
                         bandSize: Int, numBuckets: Int = 16): Unit = {
    val spark = deltaSigs.sparkSession
    val bands = DedupOps.explodeBands(deltaSigs, bandSize)
    if (!spark.catalog.tableExists(tableName)) {
      bands.write.bucketBy(numBuckets, "band_idx", "band_key")
        .sortBy("band_idx", "band_key")
        .saveAsTable(tableName)
    } else {
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(tableName))
      val spec = meta.bucketSpec.getOrElse(throw new IllegalStateException(
        s"$tableName has no bucket spec — not a band store table"))
      val w = bands.write.mode("append")
        .bucketBy(spec.numBuckets, spec.bucketColumnNames.head,
          spec.bucketColumnNames.tail: _*)
      spec.sortColumnNames.headOption
        .fold(w)(sc => w.sortBy(sc, spec.sortColumnNames.tail: _*))
        .saveAsTable(tableName)
    }
  }

  /** Ingest-loop step with the persisted band store: dedup `batch` against
    * the parquet store at `dir` using the BUCKETED band table as the
    * history band relation (no per-batch band recompute from history
    * `sigs`, no history-side shuffle into the band join), then append the
    * accepted delta to both. The first batch bootstraps the table — from
    * the FULL store history plus the delta, so a store dir populated
    * before the band table existed (e.g. via [[dedupeAndCommit]]) seeds a
    * complete table rather than one whose older history is invisible to
    * every later band join.
    *
    * The two appends are still not one atomic commit, but their ORDER is
    * load-bearing: bands are written FIRST. A crash between them leaves
    * orphan band rows (harmless — the verify join drops pairs with no
    * `sigs` row, and the retried batch's re-append only adds duplicates
    * that `dropDuplicates(id_a, id_b)` absorbs), never store documents
    * with missing bands, which would silently accept their near-
    * duplicates forever. */
  def dedupeAndCommitIndexed(batch: DataFrame, idCol: String, textCol: String,
                             dir: String, bandTable: String,
                             shingleN: Int = 3, minhashK: Int = 64, bandSize: Int = 4,
                             jaccardThreshold: Double = 0.8, estFloor: Double = 0.55,
                             maxBucket: Int = 64, numBuckets: Int = 16): DataFrame = {
    val spark = batch.sparkSession
    val tableExists = spark.catalog.tableExists(bandTable)
    val hist = openStore(spark, dir)
    val r = dedupeBatch(batch, idCol, textCol, hist,
      shingleN, minhashK, bandSize, jaccardThreshold, estFloor, maxBucket,
      histBands = if (tableExists) spark.table(bandTable) else null)
    val bandSigs =
      if (tableExists) r.delta.sigs
      else hist.sigs.unionByName(r.delta.sigs)
    appendBandsToTable(bandSigs, bandTable, bandSize, numBuckets)
    appendToStore(dir, r.delta)
    r.ledger
  }

  /** Exactly-once micro-batch commit for Structured Streaming's
    * `foreachBatch` (which is AT-LEAST-once: a failed trigger replays the
    * same batchId). The store layout is batch-partitioned —
    * `dir/{hashes,sigs}/ingest_batch=<batchId>/` — and a replay is
    * idempotent by construction: it (a) opens the history EXCLUDING its
    * own partition, so a torn previous attempt can never dedup the batch
    * against itself, and (b) OVERWRITES only its own partition, so final
    * state is identical however many times the batchId runs. `sigs` is
    * written before `hashes` (the [[appendToStore]] ordering rationale).
    * Do NOT mix this layout with [[appendToStore]]'s flat files in one
    * store dir — partition discovery rejects the mixture. */
  def dedupeAndCommitIdempotent(batch: DataFrame, idCol: String, textCol: String,
                                dir: String, batchId: Long,
                                shingleN: Int = 3, minhashK: Int = 64, bandSize: Int = 4,
                                jaccardThreshold: Double = 0.8, estFloor: Double = 0.55,
                                maxBucket: Int = 64): DataFrame = {
    val spark = batch.sparkSession
    val opened = openStore(spark, dir)
    def ownPartitionExcluded(df: DataFrame): DataFrame =
      if (df.columns.contains("ingest_batch"))
        df.filter(col("ingest_batch") =!= batchId).drop("ingest_batch")
      else df
    val hist = Index(ownPartitionExcluded(opened.hashes), ownPartitionExcluded(opened.sigs))
    val r = dedupeBatch(batch, idCol, textCol, hist,
      shingleN, minhashK, bandSize, jaccardThreshold, estFloor, maxBucket)
    r.delta.sigs.write.mode("overwrite").parquet(s"$dir/sigs/ingest_batch=$batchId")
    r.delta.hashes.write.mode("overwrite").parquet(s"$dir/hashes/ingest_batch=$batchId")
    r.ledger
  }

  /** Dedup one batch against itself and the history; returns the batch
    * ledger `(id, kept, stage, reason)` with stage ∈ {"", exact_dup_hist,
    * exact_dup_batch, near_dup_hist, near_dup_batch} plus the index DELTA.
    * Ledger and delta are materialized (localCheckpoint) so the internal
    * persisted frames release before returning and the caller holds
    * leaves, not the batch's whole plan. */
  def dedupeBatch(batch: DataFrame, idCol: String, textCol: String,
                  index: Index,
                  shingleN: Int = 3, minhashK: Int = 64, bandSize: Int = 4,
                  jaccardThreshold: Double = 0.8, estFloor: Double = 0.55,
                  maxBucket: Int = 64,
                  histBands: DataFrame = null): BatchResult = {

    val spark = batch.sparkSession
    import spark.implicits._
    val hashed = batch.select(col(idCol).cast("string").as("id"),
        col(textCol).as("text"))
      .withColumn("hash", expr("substring(sha2(text, 256), 1, 32)"))
      .persist()

    // Bootstrap short-circuit (r8): when the history index is the literal
    // empty LocalRelation (fresh store — openStore found nothing) and no
    // band table exists, every history join is an identity/empty transform
    // — but each still costs AQE jobs (broadcast builds + shuffle stages;
    // measured ~20 of the first batch's 74 jobs at fixture scale). A
    // plan-level check (no data scanned) skips them; output is identical
    // because joining an empty relation yields nothing.
    val emptyHist = histBands == null && Seq(index.hashes, index.sigs).forall {
      df => df.queryExecution.optimizedPlan match {
        // optimizedPlan: ConvertToLocalRelation collapses the toDF Project
        // so an emptyIndex frame IS a LocalRelation here
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l.data.isEmpty
        case _ => false
      }
    }
    def emptyDrops(): DataFrame =
      Seq.empty[(String, String, String)].toDF("id", "stage", "reason")

    // 1. exact vs history
    val histDrops =
      if (emptyHist) emptyDrops()
      else hashed
        .join(index.hashes.select(col("hash"), col("id").as("hist_id")), Seq("hash"))
        .groupBy(col("id")).agg(min(col("hist_id")).as("reason"))
        .select(col("id"), lit("exact_dup_hist").as("stage"), col("reason"))
    val afterHist =
      if (emptyHist) hashed
      else hashed.join(histDrops.select("id"), Seq("id"), "left_anti")

    // 2. exact within the batch
    val keepers = afterHist.groupBy("hash").agg(min(col("id")).as("keeper"))
    val withKeeper = afterHist.join(keepers, "hash")
    val batchExactDrops = withKeeper.filter(col("id") =!= col("keeper"))
      .select(col("id"), lit("exact_dup_batch").as("stage"),
        col("keeper").as("reason"))
    val uniq = withKeeper.filter(col("id") === col("keeper")).select("id", "text")

    // 3/4. near-dup: ONE signature pass for the batch; bands persisted —
    // they feed the history join and (minus history drops) the in-batch
    // self-join, which would otherwise recompute 16 band keys per doc
    val sigs = DedupOps.minhashSignatures(uniq, "id", "text", shingleN, minhashK)
      .persist()
    val batchBands = DedupOps.explodeBands(sigs, bandSize).persist()

    val bucketKey = Seq("band_idx", "band_key")
    val toUnpersist = scala.collection.mutable.ArrayBuffer[DataFrame](
      hashed, sigs, batchBands)
    val nearHistDrops: DataFrame = if (emptyHist) emptyDrops() else {
    // vs history: batch id on the left, history id on the right. Both
    // sides get the ONE shared mega-bucket rule (template boilerplate =
    // O(|batch bucket| × |hist bucket|) near-zero-precision pairs). The
    // history side is restricted to buckets the batch TOUCHES before
    // anything is counted: a history-wide groupBy would shuffle all
    // history bands every batch — O(history) per commit, breaking the
    // O(batch) commit contract. Restricting first keeps per-bucket counts
    // exact (an inner join on the bucket key keeps EVERY row of a touched
    // bucket), shrinks the count to batch-sized input, and lets AQE
    // broadcast the touched-key list when batch ≪ history.
    val cappedBatch = DedupOps.suppressMegaBuckets(batchBands, bucketKey, maxBucket)
      .persist() // two consumers: the touched-key semi-join and the join itself
    toUnpersist += cappedBatch
    // left_semi: restricts WITHOUT multiplying and dedupes its build side
    // internally — no separate distinct() shuffle. With a persisted band
    // store (histBands != null) the history side is a bucketed-table scan
    // already partitioned on band_key — no recompute from sigs, no
    // history-side exchange; otherwise bands are recomputed narrowly.
    val histBandRel =
      if (histBands != null) histBands
      else DedupOps.explodeBands(index.sigs, bandSize)
    // dropDuplicates AFTER the batch-touched restriction (so the dedupe is
    // O(touched), not O(history)): a crash-retried commit re-appends its
    // band rows to the persisted table, and duplicate rows would INFLATE
    // suppressMegaBuckets' counts — a bucket of 40 real members + 40
    // duplicates reads as 80 > maxBucket and is suppressed forever, which
    // is exactly the silent near-dup miss the bands-first commit order
    // exists to prevent. The table's (band_idx, band_key) bucketing
    // satisfies the aggregation's clustering (subset key), so no exchange.
    val histTouched = histBandRel
      .join(cappedBatch.select("band_idx", "band_key"), bucketKey, "left_semi")
      .dropDuplicates("id", "band_idx", "band_key")
    val histPairs = cappedBatch
      .join(DedupOps.suppressMegaBuckets(histTouched, bucketKey, maxBucket)
          .select(col("id").as("hist_id"), col("band_idx"), col("band_key")),
        bucketKey)
      .select(col("id").as("id_a"), col("hist_id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val nh = DedupOps.verifyPairs(histPairs, sigs, index.sigs,
        estFloor, jaccardThreshold)
      .groupBy(col("id_a").as("id")).agg(min(col("id_b")).as("reason"))
      .select(col("id"), lit("near_dup_hist").as("stage"), col("reason"))
      .persist() // read by the anti-join below and by the ledger union
    toUnpersist += nh
    nh
    }

    // within the batch, among docs that survived the history check
    val stillBands =
      if (emptyHist) batchBands
      else batchBands.join(nearHistDrops.select("id"), Seq("id"), "left_anti")
    val batchPairs = DedupOps.candidatePairs(stillBands,
      Seq("band_idx", "band_key"), "id", maxBucket)
    val nearBatchDrops = DedupOps.clusterRepresentatives(
        DedupOps.verifyPairs(batchPairs, sigs, sigs, estFloor, jaccardThreshold))
      .filter(col("id") =!= col("label"))
      .select(col("id").cast("string").as("id"),
        lit("near_dup_batch").as("stage"), col("label").cast("string").as("reason"))

    // ledger + the accepted documents' index delta
    val drops = histDrops.union(batchExactDrops).union(nearHistDrops)
      .union(nearBatchDrops)
    val ledger = hashed.select("id")
      .join(drops, Seq("id"), "left")
      .select(col("id"), col("stage").isNull.as("kept"),
        coalesce(col("stage"), lit("")).as("stage"),
        coalesce(col("reason"), lit("")).as("reason"))
      .localCheckpoint(true)

    // ONE materialization for both delta relations (r8): every accepted
    // doc that entered `uniq` has a sigs row, so the fused
    // (id, hash, sh, sig) join checkpoints once and both deltas are lazy
    // projections of the leaf (was: two separate checkpoint executions,
    // each paying its own broadcast-build + shuffle jobs). The sigs side
    // joins LEFT so a theoretical null-hash doc (null text never enters
    // the hash-keyed uniq join) still lands in deltaHashes exactly as
    // before; the sh-not-null filter keeps deltaSigs' rows identical.
    val accepted = ledger.filter(col("kept")).select("id")
    val deltaAll = hashed.select(col("id"), col("hash"))
      .join(accepted, Seq("id"))
      .join(sigs, Seq("id"), "left")
      .localCheckpoint(true)
    val deltaHashes = deltaAll.select(col("hash"), col("id"))
    val deltaSigs = deltaAll.filter(col("sh").isNotNull)
      .select(col("id"), col("sh"), col("sig"))

    toUnpersist.foreach(_.unpersist(false))
    (BatchResult(ledger, Index(deltaHashes, deltaSigs)))
  }
}
