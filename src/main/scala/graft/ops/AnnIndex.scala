package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * PERSISTENT IVF index: build once, query many — the shape ANN takes at
 * 100 TB, where the corpus is indexed by an offline job and every later
 * query job must not re-shuffle (or re-assign) a billion vectors.
 *
 *  - `build` trains the coarse quantizer ([[Ann.trainCentroids]], bounded
 *    sample), assigns every vector to its nearest cell (narrow map over a
 *    broadcast centroid array), and writes the assignment relation as a
 *    table BUCKETED BY `cell` plus a tiny `<table>_centroids` side table.
 *  - `query` re-loads the centroids (k × dim floats — broadcastable at any
 *    corpus size), probes the `nProbe` nearest cells per query, and joins
 *    the probe list against the bucketed assignment table on `cell`: the
 *    bucketed side is already hash-clustered on the join key, so the big
 *    relation never crosses an exchange (asserted in AnnSpec).
 *
 * Results are byte-identical to the in-memory IVF path for the same
 * centroids — the index is storage layout, not a different algorithm.
 */
object AnnIndex {

  /** Train + assign + persist. Returns the trained centroids. Column names
    * of `emb` are normalized to (vec_id, embedding) up front, so tuple
    * datasets with default `_1`/`_2` columns work too (ADVICE r3). */
  def build(
      emb: Dataset[(Long, Array[Float])],
      tableName: String,
      k: Int,
      sampleSize: Int,
      numBuckets: Int = 16): Array[Array[Float]] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val named = emb.toDF("vec_id", "embedding").as[(Long, Array[Float])]
    // bounded training sample = the sampleSize LOWEST ids (TakeOrdered — no
    // full shuffle, no dense-0-based-id assumption; works for sparse or
    // offset vec_ids). For contiguous 0-based ids this is exactly
    // `filter(_._1 < sampleSize)`, keeping centroid byte-identity with the
    // in-memory IVF query path.
    val sample = named.orderBy("vec_id").limit(sampleSize)
      .collect().sortBy(_._1).map(_._2)
    val centroids = Ann.trainCentroids(sample, k)
    val cB = spark.sparkContext.broadcast(centroids)
    val indexed = named
      .map { case (id, v) => (id, v, Ann.nearestCentroid(v, cB.value)) }
      .toDF("vec_id", "embedding", "cell")
    graft.pipeline.ExtractJob.writeBucketed(indexed, tableName, "cell", numBuckets)
    val centTable = s"${tableName}_centroids"
    graft.pipeline.ExtractJob.dropTableAndLocation(spark, centTable)
    centroids.zipWithIndex
      .map { case (c, i) => (i, c) }.toSeq
      .toDF("cell", "centroid")
      .write.mode("overwrite").saveAsTable(centTable)
    centroids
  }

  /** Incremental index ingest: assign NEW vectors to the EXISTING (frozen)
    * coarse quantizer and append them to the bucketed assignment table —
    * the standard IVF ingest shape. No retrain, no rewrite of the indexed
    * corpus; commit cost is O(new vectors) however large the index has
    * grown (the [[graft.ops.IncrementalDedup]] store economics). Queries
    * see old + new immediately, and the append reuses the table's OWN
    * bucket spec from the catalog so the probe join stays exchange-free —
    * a mismatched hand-passed bucket count could silently split cells
    * across incompatible bucketings. Quantizer drift (new data far from
    * the frozen centroids piling into few cells) is a REBUILD decision:
    * watch cell occupancy with a census over the assignment table. */
  def append(emb: Dataset[(Long, Array[Float])], tableName: String): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(tableName))
    val spec = meta.bucketSpec.getOrElse(throw new IllegalStateException(
      s"$tableName has no bucket spec — not an AnnIndex table"))
    val cB = spark.sparkContext.broadcast(loadCentroids(spark, tableName))
    val assigned = emb.toDF("vec_id", "embedding").as[(Long, Array[Float])]
      .map { case (id, v) => (id, v, Ann.nearestCentroid(v, cB.value)) }
      .toDF("vec_id", "embedding", "cell")
      .write.mode("append")
      .bucketBy(spec.numBuckets, spec.bucketColumnNames.head)
    // mirror the table's own sort spec (absent on a bucketed-only table)
    spec.sortColumnNames.headOption
      .fold(assigned)(s => assigned.sortBy(s, spec.sortColumnNames.tail: _*))
      .saveAsTable(tableName)
  }

  /** Centroids of a built index, cell-ordered. */
  def loadCentroids(spark: SparkSession, tableName: String): Array[Array[Float]] = {
    import spark.implicits._
    spark.table(s"${tableName}_centroids")
      .as[(Int, Array[Float])].collect().sortBy(_._1).map(_._2)
  }

  /** The ONE scoring tail every IVF path shares (in-memory query, persisted
    * index, spec reference): probe-join on `cell`, self-match filter,
    * candidate dedupe, 5-decimal cosine, row_number ranking with `vec_id`
    * as the deterministic tiebreak, top-`topK`. Byte-
    * identity between the paths is the product contract — keep exactly one
    * definition. `probes` = (query_id, q_emb, cell); `indexed` =
    * (vec_id, embedding, cell). */
  def scoreProbes(probes: DataFrame, indexed: DataFrame, topK: Int): DataFrame = {
    val spark = probes.sparkSession
    graft.plans.GraftExtensions.registerNative(spark)
    // scoring runs as the native codegen `cosine_sim5` expression — the
    // ArrayData buffers are read in place (no per-row encoder round trip)
    // and the 5-decimal rounding uses JDK Math.round inside the helper, so
    // the column path is byte-identical to the scalar
    // `math.round(VectorOps.cosine(..)*1e5)/1e5` by construction.
    val scored = probes.join(indexed, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .dropDuplicates("query_id", "vec_id")
      .select(col("query_id"), col("vec_id"),
        expr("cosine_sim5(q_emb, embedding)").as("cos"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long")).filter(col("rank") <= topK)
      .select("query_id", "rank", "vec_id", "cos")
      .orderBy("query_id", "rank")
  }

  /** Top-`topK` neighbors per query via the persisted index. The probe list
    * (queries × nProbe rows) is the small side; the bucketed assignment
    * table joins on `cell` without an exchange. */
  def query(
      spark: SparkSession,
      tableName: String,
      queries: Dataset[(Long, Array[Float])],
      nProbe: Int = 4,
      topK: Int = 5): DataFrame = {
    import spark.implicits._
    val centroids = loadCentroids(spark, tableName)
    val cB = spark.sparkContext.broadcast(centroids)
    val probes = queries
      .flatMap { case (qid, v) => Ann.probeCells(v, cB.value, nProbe).map(c => (qid, v, c)) }
      .toDF("query_id", "q_emb", "cell")
    scoreProbes(probes, spark.table(tableName), topK)
  }
}
