package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Cross-row dedup plumbing shared by the MinHash / SimHash / Jaccard /
 * embedding-LSH families (SparkEntry dedup queries).
 *
 * Scale contract (100 TB):
 *  - the self-joined relation carries ONLY the bucket key + row id — payloads
 *    (signatures, shingle hashes, embeddings) are re-attached by id AFTER the
 *    candidate pairs are deduped, so they never multiply through the
 *    quadratic part of the shuffle;
 *  - mega-bucket suppression: a bucket shared by more than `maxBucket` rows
 *    is non-discriminative template boilerplate — joining it contributes
 *    O(bucket²) candidate pairs of near-zero precision, so it is dropped
 *    entirely. This bounds the join fan-out per bucket regardless of corpus
 *    size (the standard guard in production near-dup pipelines).
 */
object DedupOps {

  /**
   * Candidate pairs from an LSH band/bucket relation.
   *
   * @param bands     relation with columns (`idCol`, bucket columns…)
   * @param bucketCols the bucket key columns (e.g. band_idx+band_key, or
   *                   table+bucket)
   * @param idCol     row-identity column name (url / vec_id)
   * @param maxBucket suppression threshold (buckets larger than this are
   *                  dropped before the self-join)
   * @return distinct (id_a, id_b) with id_a < id_b
   */
  def candidatePairs(
      bands: DataFrame,
      bucketCols: Seq[String],
      idCol: String,
      maxBucket: Int = 64): DataFrame = {
    val keyCols = bucketCols.map(col)
    val bucketSizes = bands.groupBy(keyCols: _*).count()
    val small = bands.join(bucketSizes.filter(col("count") <= maxBucket), bucketCols)
      .select((bucketCols :+ idCol).map(col): _*)
    val a = small.toDF(bucketCols :+ "id_a": _*)
    val b = small.toDF(bucketCols :+ "id_b": _*)
    a.join(b, bucketCols)
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
  }
}
