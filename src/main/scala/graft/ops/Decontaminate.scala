package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Train/test decontamination — the n-gram-overlap check every published
 * LLM corpus pipeline runs before training (GPT-3's 13-gram rule, Brown
 * et al. 2020; PaLM/Llama variants): a training document is contaminated
 * if it shares any word n-gram with a held-out benchmark document.
 *
 * Semantics: words = `\s+` split of trimmed text; grams are adjacent
 * n-word windows joined with one space (exact tokens); a training doc's
 * `shared_grams` = DISTINCT gram overlap count with the union of all
 * benchmark grams; `contaminated` = shared_grams > 0. Docs shorter than
 * n words have no grams and pass clean.
 *
 * Scale shape: the benchmark gram set is tiny next to the corpus
 * (benchmarks are MBs against TBs), so the overlap join is an equi-join
 * against a relation Spark broadcasts — the training corpus is never
 * shuffled, the whole check is one narrow flatMap + broadcast semi-join
 * + per-doc count. No driver collects.
 */
object Decontaminate {

  /** `(id, shared_grams, contaminated)` for every row of `train`.
    * `broadcastBench=false` drops the broadcast hint for an unusually
    * large benchmark set (a forced broadcast would pressure the driver);
    * the overlap join then shuffles on the gram key instead — same
    * result, still an equi-join. */
  def flag(train: DataFrame, bench: DataFrame,
           idCol: String, textCol: String, benchTextCol: String,
           n: Int = 8, broadcastBench: Boolean = true): DataFrame = {
    val spark = train.sparkSession
    import spark.implicits._

    def grams(text: String): Iterator[String] = {
      val t = if (text == null) "" else text.trim
      if (t.isEmpty) Iterator.empty
      else {
        val ws = t.split("\\s+")
        if (ws.length < n) Iterator.empty
        else (0 to ws.length - n).iterator.map(i => ws.slice(i, i + n).mkString(" "))
      }
    }

    val benchGrams = bench.select(col(benchTextCol).as("t")).as[String]
      .flatMap(grams).toDF("gram").distinct()

    // NOT deduplicated before the join: a pre-join distinct would shuffle
    // the full exploded gram relation (far larger than the corpus text);
    // the broadcast join filters narrowly first, and the per-doc distinct
    // count then aggregates only the tiny matched set
    val trainGrams = train.select(col(idCol).cast("string").as("id"),
        col(textCol).as("t"))
      .as[(String, String)]
      .flatMap { case (id, t) => grams(t).map((id, _)) }
      .toDF("id", "gram")

    val benchSide = if (broadcastBench) broadcast(benchGrams) else benchGrams
    val shared = trainGrams.join(benchSide, Seq("gram"))
      .groupBy("id").agg(countDistinct(col("gram")).as("shared_grams"))

    train.select(col(idCol).cast("string").as("id"))
      .join(shared, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("shared_grams"), lit(0L)).as("shared_grams"),
        (coalesce(col("shared_grams"), lit(0L)) > 0).as("contaminated"))
  }
}
