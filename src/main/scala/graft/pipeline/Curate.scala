package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{DedupOps, ParaDedup, RepetitionOps}

/**
 * The composed curation pipeline a training-data run executes between
 * extraction and tokenization, in the published stage order (CCNet /
 * Gopher / RefinedWeb): cross-document boilerplate-paragraph removal →
 * Gopher/C4 quality gate on the CLEANED text (order matters: boilerplate
 * would otherwise trip the repetition rules) → exact dedup by content
 * hash → MinHash-LSH near-dup with exact-Jaccard verification and
 * connected-component survivor selection.
 *
 * Output is a per-document LEDGER, not just the survivor set: every input
 * id gets exactly one row `(id, kept, stage, reason, paras_removed)` where
 * `stage` ∈ {"", quality, exact_dup, near_dup} and `reason` carries the
 * filter reasons (quality) or the surviving representative's id (dedup
 * stages) — the lineage a curator needs to audit why any document died.
 *
 * Scale shape, stage by stage: ParaDedup (one hash-agg + broadcast mark
 * join + id regroup), quality (narrow map), exact dedup (hash-agg keyed by
 * content hash), near-dup (the same banded-LSH chain the dedup_survivors
 * oracle gates: payload-free band self-join with mega-bucket suppression,
 * estimate prefilter, exact verify only on candidates, O(log d)
 * pointer-jumping CC on id-only relations). No stage collects to the
 * driver; every join is an equi-join AQE can broadcast or shuffle.
 */
object Curate {

  final case class Config(
      paraMinDocFreq: Int = 3,
      thresholds: RepetitionOps.Thresholds = RepetitionOps.Thresholds(),
      nearDup: Boolean = true,
      shingleN: Int = 3,
      minhashK: Int = 64,
      bandSize: Int = 4,
      estFloor: Double = 0.55,
      jaccardThreshold: Double = 0.8)

  /** Deterministic stratified sampling — training-mix composition: keep a
    * different fraction of each stratum (language, source, quality tier) so
    * the sampled corpus hits a target mix. The keep decision is a pure
    * function of the CONTENT (first 8 hex chars of sha256(text), compared
    * lexicographically against the stratum's rate threshold — lowercase
    * fixed-width hex compares numerically), so:
    *
    *  - the same (corpus, rates) gives the same sample on any cluster size
    *    or partitioning — no `sample()`/rand() nondeterminism;
    *  - identical texts sample identically (content-keyed, like
    *    `doc_sample`), so a sample never splits an exact-dup family;
    *  - resolution is 2^32 (rate quantized to floor(rate·2^32)/2^32).
    *
    * Rates join in via one broadcast side table (strata counts are small by
    * definition); unknown strata fall back to `defaultRate`. The filter is
    * a narrow codegen'd projection over the scan — scale-free. */
  def stratifiedSample(docs: DataFrame, textCol: String, strataCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0.0 && r <= 1.0),
      "rates must be in [0, 1]")
    val spark = docs.sparkSession
    import spark.implicits._
    // "g" sorts above every hex char: rate 1.0 keeps ALL rows (a 2^32
    // threshold doesn't fit 8 hex chars)
    def thr(rate: Double): String =
      if (rate >= 1.0) "g" else f"${(rate * 4294967296.0).toLong}%08x"
    val thrDf = rates.toSeq.map { case (k, v) => (k, thr(v)) }
      .toDF("__stratum", "__thr")
    docs
      .join(broadcast(thrDf), docs(strataCol) === col("__stratum"), "left")
      .withColumn("__thr", coalesce(col("__thr"), lit(thr(defaultRate))))
      // coalesce: NULL text must follow its stratum's rate like any other
      // row (sha2(NULL) is NULL and a NULL predicate silently drops the
      // row even at rate 1.0); it samples as the empty-string hash, so all
      // no-content rows still move atomically. Column functions, not an
      // interpolated expr — a textCol needing quoting must keep working.
      .filter(substring(sha2(coalesce(col(textCol), lit("")), 256), 1, 8)
        < col("__thr"))
      .drop("__stratum", "__thr")
  }

  /** Closed-form sampling rates from a census against a per-stratum mass
    * budget: `rate(s) = min(1, target(s) / available(s))`. Collects only
    * the census (one row per stratum — small by definition), never data;
    * strata missing a target get no rate (pair with
    * [[stratifiedSample]]'s `defaultRate`). A target above the available
    * mass caps at 1.0 — sampling cannot mint data; upsampling/epochs are a
    * training-loop decision, not a corpus one. Rates are mass-ratio
    * approximations: the sampled MASS lands within binomial noise of the
    * target (CurateSpec pins it end-to-end census → rates → sample). */
  def ratesForBudget(census: DataFrame, strataCol: String, massCol: String,
                     targets: Map[String, Double]): Map[String, Double] =
    census.select(col(strataCol).cast("string"), col(massCol).cast("double"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      .flatMap { case (s, avail) =>
        targets.get(s).map(t =>
          s -> (if (avail <= 0.0) 0.0 else math.min(1.0, t / avail)))
      }

  /** [[trainingSet]] knobs beyond the curation [[Config]]. */
  final case class TrainingConfig(
      curate: Config = Config(),
      decontamN: Int = 5,
      mixRates: Map[String, Double] = Map.empty,
      defaultRate: Double = 1.0,
      shuffleSeed: Long = 2026L,
      packBudget: Int = 2048,
      numShards: Int = 16,
      // packing budget unit: "whitespace" (token_count) or "bpe"
      // (bpe_token_count with `bpeMerges` — real subword budgeting)
      tokenizer: String = "whitespace",
      bpeMerges: String = graft.ops.Bpe.FixtureSpec)

  /** One row per input id in `ledger` (final disposition across ALL
    * stages); `packed` = chunk placement of every surviving document. */
  final case class TrainingResult(ledger: DataFrame, packed: DataFrame)

  /** The WHOLE training-set assembly in one call — the composition a run
    * executes between extraction and tokenization:
    *
    *   curation ledger ([[curate]]: para-dedup → quality → exact dedup →
    *   near-dup) → benchmark decontamination
    *   ([[graft.ops.Decontaminate.flag]], skipped when `benchmark` is
    *   None) → training-mix sampling ([[stratifiedSample]] by
    *   `strataCol`) → reproducible shuffle
    *   ([[graft.ops.Pack.seededShuffle]] — requires numeric-castable ids)
    *   → concat-and-chunk packing in SHUFFLED order
    *   ([[graft.ops.Pack.concatChunkBy]], tokens = the native
    *   `token_count` of the original text).
    *
    * The ledger extends the curation ledger's stage vocabulary with
    * `contaminated` and `mix_sampled_out`; every input id appears exactly
    * once, `kept` marks survivors of ALL stages. Both outputs are
    * materialized (localCheckpoint) so internal persists release before
    * returning. Each stage is the already-oracle-gated operator — this
    * method adds composition, not new semantics; the `training_run` driver
    * query replays the SQL-expressible configuration end-to-end in DuckDB. */
  def trainingSet(docs: DataFrame, idCol: String, textCol: String,
                  strataCol: String, benchmark: Option[DataFrame],
                  cfg: TrainingConfig = TrainingConfig()): TrainingResult = {
    val spark = docs.sparkSession
    graft.plans.GraftExtensions.registerNative(spark)
    val base = docs.select(col(idCol).cast("string").as("id"),
        col(textCol).cast("string").as("text"),
        col(strataCol).cast("string").as("stratum"))
      .persist()

    val curLedger = curate(base, "id", "text", cfg.curate)
    val curKept = base.join(curLedger.filter(col("kept")).select("id"), Seq("id"))

    val postDrops = {
      val contaminated = benchmark match {
        case Some(b) =>
          graft.ops.Decontaminate.flag(curKept, b, "id", "text", "text", cfg.decontamN)
            .filter(col("contaminated"))
            .select(col("id").cast("string").as("id"),
              lit("contaminated").as("post_stage"))
        case None => base.select(col("id"), lit("x").as("post_stage")).limit(0)
      }
      val afterDecon = curKept.join(contaminated.select("id"), Seq("id"), "left_anti")
      val sampled = stratifiedSample(afterDecon, "text", "stratum",
        cfg.mixRates, cfg.defaultRate)
      val sampledOut = afterDecon
        .join(sampled.select("id"), Seq("id"), "left_anti")
        .select(col("id"), lit("mix_sampled_out").as("post_stage"))
      contaminated.unionByName(sampledOut)
    }

    val ledger = curLedger
      .join(postDrops, Seq("id"), "left")
      .select(col("id"),
        (col("kept") && col("post_stage").isNull).as("kept"),
        coalesce(col("post_stage"), col("stage")).as("stage"),
        when(col("post_stage").isNotNull, lit("")).otherwise(col("reason")).as("reason"),
        col("paras_removed"))
      .localCheckpoint(true)

    val finalKept = base
      .join(ledger.filter(col("kept")).select("id"), Seq("id"))
    val shuffled = graft.ops.Pack.seededShuffle(
      finalKept.select(col("id").cast("long").as("docid")), "docid",
      cfg.shuffleSeed, cfg.numShards)
    // budget unit: whitespace runs or real BPE subwords — both native
    // codegen'd expressions, both a narrow per-row map
    val tokenExpr = cfg.tokenizer match {
      case "whitespace" => expr("token_count(text)")
      case "bpe" =>
        call_function("bpe_token_count", col("text"), lit(cfg.bpeMerges))
      case other => throw new IllegalArgumentException(
        s"unknown tokenizer '$other' (want whitespace | bpe)")
    }
    val withTokens = shuffled
      .join(finalKept.select(col("id").cast("long").as("id"),
        tokenExpr.cast("long").as("tokens")), Seq("id"))
    val packed = graft.ops.Pack.concatChunkBy(withTokens,
        "id", "tokens", "shard", "skey", cfg.packBudget)
      .localCheckpoint(true)

    base.unpersist(false)
    TrainingResult(ledger, packed)
  }

  /** Run the ledger pipeline over `(idCol, textCol)` rows. The returned
    * ledger is materialized (eager localCheckpoint) so the internal
    * persisted intermediates can be released before returning — repeated
    * `curate` calls in a long-lived session leak no cached blocks. */
  def curate(input: DataFrame, idCol: String, textCol: String,
             cfg: Config = Config()): DataFrame = {
    val toRelease = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val ledger = ledgerPlan(input, idCol, textCol, cfg, toRelease)
      .localCheckpoint(true)
    toRelease.foreach(_.unpersist(false))
    ledger
  }

  /** The LAZY ledger plan (PlanAuditSpec audits this shape; `curate`
    * materializes it and releases `toRelease`). */
  private[graft] def ledgerPlan(
      input: DataFrame, idCol: String, textCol: String, cfg: Config,
      toRelease: scala.collection.mutable.ArrayBuffer[DataFrame]): DataFrame = {
    val spark = input.sparkSession
    import spark.implicits._

    // stage 1: cross-document boilerplate-paragraph removal (lazy: its
    // internal segs persist lands in toRelease with the rest)
    val cleaned = ParaDedup.dedupParagraphs(input, idCol, textCol,
      cfg.paraMinDocFreq, toRelease = toRelease)

    // stage 2: quality verdict on the cleaned text. `judged` feeds three
    // consumers (quality drops, the dedup stages, the final ledger join),
    // so it is persisted — without this every ledger branch would re-run
    // the paragraph regroup and the profile pass (measured 77 s vs ~7 s
    // over the 20k-page corpus)
    val judged = cleaned.select(col("id"), col("text_deduped"), col("paras_removed"))
      .as[(String, String, Long)]
      .map { case (id, text, pr) =>
        val v = RepetitionOps.gopherFilter(RepetitionOps.profile(text), cfg.thresholds)
        (id, text, pr, v.keep, v.reasons.mkString("+"))
      }
      .toDF("id", "text", "paras_removed", "q_keep", "q_reasons")
      .persist()
    toRelease += judged
    val qualityDrops = judged.filter(!col("q_keep"))
      .select(col("id"), lit("quality").as("stage"), col("q_reasons").as("reason"))

    // stage 3: exact dedup by content hash (minimum id survives)
    val hashed = judged.filter(col("q_keep"))
      .withColumn("hash", expr("substring(sha2(text, 256), 1, 32)"))
    val keepers = hashed.groupBy("hash").agg(min(col("id")).as("keeper"))
    val withKeeper = hashed.join(keepers, "hash")
    val exactDrops = withKeeper.filter(col("id") =!= col("keeper"))
      .select(col("id"), lit("exact_dup").as("stage"), col("keeper").as("reason"))
    val uniq = withKeeper.filter(col("id") === col("keeper")).select("id", "text")

    // stage 4: near-dup survivors (banded LSH → estimate prefilter →
    // exact Jaccard verify → CC min-label)
    val nearDrops: DataFrame =
      if (!cfg.nearDup) spark.emptyDataset[(String, String, String)]
        .toDF("id", "stage", "reason")
      else {
        // persisted: read by the band explode and by BOTH sides of the
        // candidate-pair join — unpersisted, each reader would recompute
        // shingling + the 64-permutation MinHash over the whole corpus
        val sigs = DedupOps.minhashSignatures(uniq, "id", "text",
            cfg.shingleN, cfg.minhashK)
          .persist()
        toRelease += sigs
        val bands = DedupOps.explodeBands(sigs, cfg.bandSize)
        val cands = DedupOps.candidatePairs(bands, Seq("band_idx", "band_key"), "id")
        val verified = DedupOps.verifyPairs(cands, sigs, sigs,
          cfg.estFloor, cfg.jaccardThreshold)
        DedupOps.clusterRepresentatives(verified)
          .filter(col("id") =!= col("label"))
          .select(col("id").cast("string").as("id"),
            lit("near_dup").as("stage"), col("label").cast("string").as("reason"))
      }

    // ledger: one row per input id
    val drops = qualityDrops.union(exactDrops).union(nearDrops)
    judged.select(col("id"), col("paras_removed"))
      .join(drops, Seq("id"), "left")
      .select(col("id"), col("stage").isNull.as("kept"),
        coalesce(col("stage"), lit("")).as("stage"),
        coalesce(col("reason"), lit("")).as("reason"),
        col("paras_removed"))
  }
}
