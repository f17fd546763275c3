package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Training-sequence packing, concat-and-chunk semantics: documents are
 * concatenated in a deterministic order within a shard and the token
 * stream is cut every `budget` tokens — the packing GPT-style training
 * pipelines run (documents may straddle a cut; the alternative greedy
 * bin-packing trades determinism for fewer straddles). Each document's
 * placement is closed-form from the exclusive cumulative token sum, so
 * the whole operator is two window functions — no stateful scan, no
 * driver loop, and the identical assignment at any parallelism.
 *
 * Shard assignment is `id % numShards` (deterministic, cluster-size
 * independent); within a shard, order is ascending id. Output: one row
 * per document with `(id, shard, tokens, cum_before, first_chunk,
 * last_chunk, straddles)` where chunks are `budget`-token windows of the
 * shard's concatenated stream. Zero-token docs occupy no span: they sit
 * at `first_chunk = last_chunk = floor(cum_before / budget)`.
 */
object Pack {

  def concatChunk(docs: DataFrame, idCol: String, tokenCol: String,
                  budget: Int, numShards: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(numShards > 0, "numShards must be positive")
    val base = docs.select(col(idCol).cast("long").as("id"),
        col(tokenCol).cast("long").as("tokens"))
      .withColumn("shard", pmod(col("id"), lit(numShards.toLong)))
    val w = Window.partitionBy(col("shard")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("cum_before", coalesce(sum(col("tokens")).over(w), lit(0L)))
      // integer DIV, not floor(x / y): true division casts through double,
      // and a shard's cumulative token sum past 2^53 (≈9e15 — reachable at
      // the corpus scale this targets with few shards) would round through
      // an inexact double and mis-assign chunks near a boundary
      .withColumn("first_chunk", expr(s"cum_before DIV ${budget}L"))
      .withColumn("last_chunk",
        when(col("tokens") > 0,
          expr(s"(cum_before + tokens - 1) DIV ${budget}L"))
          .otherwise(expr(s"cum_before DIV ${budget}L")))
      .withColumn("straddles", col("last_chunk") > col("first_chunk"))
      .select("id", "shard", "tokens", "cum_before",
        "first_chunk", "last_chunk", "straddles")
  }
}
