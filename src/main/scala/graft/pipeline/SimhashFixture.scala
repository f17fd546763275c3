package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.TextOps

/**
 * Fixed 40-doc corpus with planted SimHash near-dup structure (VERDICT r4
 * #5) — the oracle anchor for the chunk-LSH → hamming-verify chain that
 * `dedup_simhash_pages` runs at corpus scale.
 *
 * Layout (all derived from [[TextOps.mix64]], fully deterministic):
 *  - 10 families `k = 0..9`: docs `sim-{2k}` / `sim-{2k+1}`, each 150
 *    pseudo-tokens. At `k % 3 == 0` the pair is an exact duplicate
 *    (hamming 0 by definition); otherwise `sim-{2k+1}` swaps the token at
 *    position 7 — a one-word edit whose hamming equals the number of
 *    simhash bit-votes the swap flips across the 150-word majority.
 *  - 20 singletons `sim-020..sim-039` from disjoint seed ranges: unrelated
 *    150-word docs sit near hamming ≈ 32; the measured cross-family
 *    minimum for THIS corpus is 19, far above the ≤3 output threshold.
 *
 * Expected rows were computed once from the frozen corpus and
 * cross-checked against an independent Python reimplementation of the
 * chain's scalar core (FNV-1a 64 with the published offset/prime, the
 * splitmix64 finalizer, per-bit ±1 votes over the word sequence). Chunk
 * recall at hamming ≤ 3 is pigeonhole-guaranteed (4 disjoint 16-bit
 * chunks), so the oracle pins BOTH no-false-negative and
 * no-false-positive behavior of the distributed chain.
 */
object SimhashFixture {

  private def word(seed: Long): String =
    "tok" + java.lang.Math.floorMod(TextOps.mix64(seed), 5000L)

  /** The frozen (url, text) corpus. */
  def corpus: Seq[(String, String)] = {
    val families = (0 until 10).flatMap { k =>
      val base = (0 until 150).map(i => word(k * 1000L + i))
      val a = base.mkString(" ")
      val b = if (k % 3 == 0) a else base.updated(7, word(k * 1000L + 777)).mkString(" ")
      Seq((f"sim-${2 * k}%03d", a), (f"sim-${2 * k + 1}%03d", b))
    }
    val singletons = (0 until 20).map { sid =>
      (f"sim-${20 + sid}%03d", (0 until 150).map(i => word(100000L + sid * 1000L + i)).mkString(" "))
    }
    families ++ singletons
  }

  /** Run the shared pair chain over the fixture corpus; output keyed by the
    * numeric doc index so the DuckDB oracle is corpus-layout-independent. */
  def query(s: SparkSession, pairsFrom: DataFrame => DataFrame): DataFrame = {
    import s.implicits._
    val hashed = s.createDataset(corpus).repartition(4)
      .map { case (url, text) => (url, TextOps.simHash(text)) }
      .toDF("url", "simhash")
    pairsFrom(hashed)
      .withColumn("idx_a", regexp_extract(col("url_a"), "sim-(\\d+)", 1).cast("long"))
      .withColumn("idx_b", regexp_extract(col("url_b"), "sim-(\\d+)", 1).cast("long"))
      .select(col("idx_a"), col("idx_b"), col("hamming").cast("long").as("hamming"))
      .orderBy("idx_a", "idx_b")
  }
}
