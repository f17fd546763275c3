package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Incremental dedup against history — the ingest-time shape of corpus
 * dedup at 10^12 documents: crawls arrive in batches, and each batch must
 * dedup against everything accepted before it WITHOUT rescanning the
 * corpus. The history is two append-only relations (the same pattern as
 * the persisted IVF index in [[AnnIndex]]):
 *
 *  - `hashes(hash, id)` — content hash of every accepted document;
 *  - `sigs(id, sh, sig)` — sorted shingle-hash set + MinHash signature of
 *    every accepted document (bands are recomputed from `sig` on use:
 *    64 longs per doc, cheaper to store once than 16 band rows).
 *
 * A batch flows: exact-vs-history (equi-join on hash) → exact-in-batch
 * (min-id keeper per hash) → near-vs-history (batch bands ⋈ history
 * bands → exact-Jaccard verify; the history side never moves — only its
 * matching band rows shuffle) → near-in-batch (the usual banded
 * self-join → verify → CC survivors). Output is a ledger row per batch
 * document plus the UPDATED index containing the accepted documents —
 * feeding batch N+1 without recomputing batches 1..N.
 */
object IncrementalDedup {

  /** Append-only dedup history. */
  final case class Index(hashes: DataFrame, sigs: DataFrame)

  def emptyIndex(spark: SparkSession): Index = {
    import spark.implicits._
    Index(
      Seq.empty[(String, String)].toDF("hash", "id"),
      Seq.empty[(String, Array[Long], Array[Long])].toDF("id", "sh", "sig"))
  }

  /** Dedup one batch against itself and the history; returns the batch
    * ledger `(id, kept, stage, reason)` with stage ∈ {"", exact_dup_hist,
    * exact_dup_batch, near_dup_hist, near_dup_batch} and the updated
    * index. Ledger and index are materialized (localCheckpoint) so the
    * internal persisted frames release before returning and batch N+1
    * plans against leaves, not the whole batch-1..N lineage. */
  def dedupeBatch(batch: DataFrame, idCol: String, textCol: String,
                  index: Index,
                  shingleN: Int = 3, minhashK: Int = 64, bandSize: Int = 4,
                  jaccardThreshold: Double = 0.8): (DataFrame, Index) = {
    val spark = batch.sparkSession
    import spark.implicits._

    val hashed = batch.select(col(idCol).cast("string").as("id"),
        col(textCol).as("text"))
      .withColumn("hash", expr("substring(sha2(text, 256), 1, 32)"))
      .persist()

    // 1. exact vs history
    val histDrops = hashed
      .join(index.hashes.select(col("hash"), col("id").as("hist_id")), Seq("hash"))
      .groupBy(col("id")).agg(min(col("hist_id")).as("reason"))
      .select(col("id"), lit("exact_dup_hist").as("stage"), col("reason"))
    val afterHist = hashed.join(histDrops.select("id"), Seq("id"), "left_anti")

    // 2. exact within the batch
    val keepers = afterHist.groupBy("hash").agg(min(col("id")).as("keeper"))
    val withKeeper = afterHist.join(keepers, "hash")
    val batchExactDrops = withKeeper.filter(col("id") =!= col("keeper"))
      .select(col("id"), lit("exact_dup_batch").as("stage"),
        col("keeper").as("reason"))
    val uniq = withKeeper.filter(col("id") === col("keeper")).select("id", "text")

    // 3/4. near-dup: batch signatures once; bands from batch + history sigs
    val sigs = uniq.as[(String, String)].map { case (id, t) =>
      val sh = TextOps.shingles(t, shingleN)
      (id, TextOps.shingleHashes(sh), TextOps.minHash(sh, minhashK))
    }.toDF("id", "sh", "sig").persist()

    def bandsOf(s: DataFrame): DataFrame =
      s.select("id", "sig").as[(String, Array[Long])]
        .flatMap { case (id, sig) =>
          TextOps.lshBands(sig, bandSize).zipWithIndex
            .map { case (b, i) => (id, i, b) }
        }.toDF("id", "band_idx", "band_key")

    val batchBands = bandsOf(sigs)
    val histBands = bandsOf(index.sigs)

    def verify(pairs: DataFrame, rightSigs: DataFrame): DataFrame =
      pairs
        .join(sigs.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(rightSigs.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .select("id_a", "id_b", "sh_a", "sh_b")
        .as[(String, String, Array[Long], Array[Long])]
        .flatMap { case (a, b, sha, shb) =>
          if (TextOps.jaccardSorted(sha, shb) >= jaccardThreshold) Some((a, b)) else None
        }.toDF("id_a", "id_b")

    // vs history: batch id on the left, history id on the right
    val histPairs = batchBands
      .join(histBands.select(col("id").as("hist_id"), col("band_idx"), col("band_key")),
        Seq("band_idx", "band_key"))
      .select(col("id").as("id_a"), col("hist_id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val nearHistDrops = verify(histPairs, index.sigs)
      .groupBy(col("id_a").as("id")).agg(min(col("id_b")).as("reason"))
      .select(col("id"), lit("near_dup_hist").as("stage"), col("reason"))

    // within the batch, among docs that survived the history check
    val stillIn = sigs.join(nearHistDrops.select("id"), Seq("id"), "left_anti")
      .persist()
    val batchPairs = DedupOps.candidatePairs(bandsOf(stillIn),
      Seq("band_idx", "band_key"), "id")
    val nearBatchDrops = DedupOps.clusterRepresentatives(
        verify(batchPairs, stillIn))
      .filter(col("id") =!= col("label"))
      .select(col("id").cast("string").as("id"),
        lit("near_dup_batch").as("stage"), col("label").cast("string").as("reason"))

    // ledger + updated index
    val drops = histDrops.union(batchExactDrops).union(nearHistDrops)
      .union(nearBatchDrops)
    val ledger = hashed.select("id")
      .join(drops, Seq("id"), "left")
      .select(col("id"), col("stage").isNull.as("kept"),
        coalesce(col("stage"), lit("")).as("stage"),
        coalesce(col("reason"), lit("")).as("reason"))
      .localCheckpoint(true)

    val accepted = ledger.filter(col("kept")).select("id")
    val newHashes = index.hashes.union(
        hashed.join(accepted, Seq("id")).select(col("hash"), col("id")))
      .localCheckpoint(true)
    val newSigs = index.sigs.union(sigs.join(accepted, Seq("id")))
      .localCheckpoint(true)

    hashed.unpersist(false)
    sigs.unpersist(false)
    stillIn.unpersist(false)
    (ledger, Index(newHashes, newSigs))
  }
}
