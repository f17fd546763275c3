package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Training-sequence packing, concat-and-chunk semantics: documents are
 * concatenated in a deterministic order within a shard and the token
 * stream is cut every `budget` tokens — the packing GPT-style training
 * pipelines run (documents may straddle a cut; the alternative greedy
 * bin-packing trades determinism for fewer straddles). Each document's
 * placement is closed-form from the exclusive cumulative token sum,
 * computed by [[PrefixSum]]'s distributed two-phase scan — no per-shard
 * single-task window, no driver loop, and the identical assignment at any
 * parallelism.
 *
 * Shard assignment is `id % numShards` (deterministic, cluster-size
 * independent); within a shard, order is ascending id. Output: one row
 * per document with `(id, shard, tokens, cum_before, first_chunk,
 * last_chunk, straddles)` where chunks are `budget`-token windows of the
 * shard's concatenated stream. Zero-token docs occupy no span: they sit
 * at `first_chunk = last_chunk = floor(cum_before / budget)`.
 */
object Pack {

  /** Deterministic seeded corpus shuffle — the shuffle-before-pack step of
    * a training run. Sequential crawl ids are heavily correlated (host,
    * time, topic); training wants them interleaved, REPRODUCIBLY: the same
    * (corpus, seed) must give the same order on any cluster size, so
    * `rand()` is out. Each id gets a mix key from two MINSTD
    * multiplicative rounds mod the Mersenne prime 2^31-1 with xor-shift
    * stirring between them — every intermediate stays below 2^31, so the
    * 64-bit products never overflow (ANSI-safe in Spark, and the identical
    * expression runs in DuckDB: this operator is oracle-checked
    * cross-engine, not just self-consistent). Not cryptographic; ids
    * congruent mod 2^31-1 collide — the (skey, id) order stays total and
    * deterministic regardless.
    *
    * Output: `(id, skey, shard, pos)` — `shard = skey mod numShards`
    * (size-balanced since skey is uniform-ish), `pos` the 1-based rank by
    * `(skey, id)` within the shard. `pos` is computed by
    * [[PrefixSum.rankAndRunningSum]] — a range-shuffle + per-partition
    * streaming rank, NOT a `Window.partitionBy(shard)` (which would pull
    * an entire corpus/numShards-row shard into ONE task's sort); the key
    * derivation itself is a narrow codegen'd projection. */
  def seededShuffle(docs: DataFrame, idCol: String, seed: Long,
                    numShards: Int): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    val M = 2147483647L // 2^31 - 1
    val base = docs.select(col(idCol).cast("long").as("id"))
      .withColumn("x0", pmod(col("id") + lit(seed), lit(M)))
      .withColumn("x1", expr(s"(48271L * x0) % ${M}L"))
      .withColumn("x2", expr("x1 ^ shiftright(x1, 15)"))
      .withColumn("x3", expr(s"(69621L * x2) % ${M}L"))
      .withColumn("skey", expr("x3 ^ shiftright(x3, 13)"))
      .withColumn("shard", pmod(col("skey"), lit(numShards.toLong)))
    PrefixSum.rankAndRunningSum(base, Seq("shard"), Seq("skey", "id"), "pos")
      // pos stays int for schema parity with the row_number() oracle; a
      // shard rank past Int.MaxValue (reachable at ~2^31 rows/shard) must
      // fail loudly instead of wrapping negative (ADVICE r7). The guard is
      // a codegen'd branch on the already-computed rank — no extra pass.
      .withColumn("pos",
        when(col("pos") <= lit(Int.MaxValue.toLong), col("pos"))
          .otherwise(raise_error(concat(
            lit("Pack.seededShuffle: shard rank "), col("pos"),
            lit(" exceeds Int.MaxValue — pos:int would overflow; use more shards"))))
        .cast("int"))
      .select("id", "skey", "shard", "pos")
  }

  def concatChunk(docs: DataFrame, idCol: String, tokenCol: String,
                  budget: Int, numShards: Int): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    val base = docs.select(col(idCol).cast("long").as("id"),
        col(tokenCol).cast("long").as("tokens"))
      .withColumn("shard", pmod(col("id"), lit(numShards.toLong)))
    concatChunkBy(base, "id", "tokens", "shard", "id", budget)
      .select("id", "shard", "tokens", "cum_before",
        "first_chunk", "last_chunk", "straddles")
  }

  /** [[concatChunk]] over EXPLICIT shard and order columns — composed
    * pipelines pack in SHUFFLED order ([[seededShuffle]]'s `skey` / shard),
    * not id order. `idCol` stays the deterministic tiebreak; any id type. */
  def concatChunkBy(docs: DataFrame, idCol: String, tokenCol: String,
                    shardCol: String, orderCol: String, budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val base = docs.select(col(idCol).as("id"),
      col(tokenCol).cast("long").as("tokens"),
      col(shardCol).as("shard"), col(orderCol).as("ord"))
    // exclusive per-shard running token sum via the distributed two-phase
    // prefix sum — never a Window.partitionBy(shard) single-task scan
    PrefixSum.rankAndRunningSum(base, Seq("shard"), Seq("ord", "id"),
        "__rank", valueCol = Some("tokens"), sumName = "cum_before")
      .drop("__rank")
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
      .select("id", "shard", "ord", "tokens", "cum_before",
        "first_chunk", "last_chunk", "straddles")
  }
}
