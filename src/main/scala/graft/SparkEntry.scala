package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{RepetitionOps, TextOps, VectorOps}
import graft.pipeline._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Two query families:
  *  - `extract_*` / `*_pages`: the scrapex-semantics extraction pipeline over
  *    the deterministic synthetic pages corpus (PagesGen; seed-fixed, scaled
  *    by sfDir). DOM semantics are not SQL-expressible → rows-only checks;
  *    correctness is carried by the ported reference test suite + goldens
  *    (`sbt -batch test`).
  *  - oracle-checked queries over the driver's parquet tables (documents /
  *    embeddings / events / part / lineitem) with DuckDB-equivalent SQL in
  *    `oracleSql` — hash/tokens/dedup/quality/langid/knn/urlops/aggregation.
  */
object SparkEntry {

  /** Flagship: full extraction over the synthetic corpus at smoke scale. */
  def entry(spark: SparkSession): DataFrame = {
    val pages = PagesGen.generate(spark, 200)
    ExtractJob.extract(pages, numPartitions = 8).toDF()
      .select("url", "domain", "title", "word_count", "content_type", "norm_hash", "status")
  }

  // ---- shared cached extraction per sfDir (queries share one pass) ----
  // Entries are bound to the SparkSession that created them: a stale entry
  // from a stopped/replaced session is unpersisted and re-extracted. Each
  // cache keeps exactly ONE entry — on any miss (new sfDir or new session)
  // every existing entry is unpersisted first, so a session that walks
  // several SF dirs never accumulates persisted relations no query will
  // read again.
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, (SparkSession, Dataset[ScrapedRow])]()

  private def evictAll[T](c: java.util.concurrent.ConcurrentHashMap[String, (SparkSession, T)])(
      unpersist: T => Unit): Unit = {
    c.values().forEach { case (_, v) => scala.util.Try(unpersist(v)) }
    c.clear()
  }

  private def extracted(spark: SparkSession, sfDir: String): Dataset[ScrapedRow] = synchronized {
    val hit = cache.get(sfDir)
    if (hit != null && (hit._1 eq spark)) hit._2
    else {
      evictAll(cache)(_.unpersist())
      // the signature/candidate relations derive from the evicted
      // extraction — drop them in the same breath, or a session that walks
      // to a new SF dir without running another dedup query keeps them
      // resident indefinitely
      evictAll(sigCache)(_.unpersist())
      evictAll(candCache)(_.unpersist())
      evictAll(verifiedCache)(_.unpersist())
      val n = PagesGen.pagesFor(sfDir)
      val parts = spark.sparkContext.defaultParallelism
      // SPARK_GRAFT_CORPUS=heavy swaps in the markup-inflated corpus
      // (real-web ~10:1 markup:text) for the whole *_pages query family —
      // the per-round byte-ratio probe (VERDICT r4 #7). The driver's
      // correctness runs never set it, and every oracle-gated fixture query
      // builds its own corpus explicitly, so the knob can only affect the
      // rows-only families it exists to probe.
      val gen =
        if (sys.env.get("SPARK_GRAFT_CORPUS").contains("heavy")) PagesGen.generateHeavy(spark, n)
        else PagesGen.generate(spark, n)
      val ds = ExtractJob.extract(gen, parts).persist()
      cache.put(sfDir, (spark, ds))
      ds
    }
  }

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  // Shared near-dup relations (VERDICT r2 nit): ONE pass over `extracted()`
  // computes the 3-gram shingle hash set AND its minhash-64 signature; ONE
  // banded LSH self-join produces the candidate pairs both queries verify —
  // dedup_minhash estimates similarity from signature agreement,
  // dedup_jaccard verifies exactly on the shingle sets. The classic
  // LSH → estimate → verify pipeline as two views over shared persisted
  // relations instead of two independent recomputations.
  //
  // DELIBERATE semantic unification vs round 2: sharing needs one shingle
  // set, so minhash now estimates 3-gram Jaccard (r2: 5-gram — more
  // permissive at the same 0.5 threshold; the planted near-dups are found
  // either way, DedupOpsSpec), and jaccard's candidates come from 16 bands
  // of a 64-slot signature (r2: 8 of 32 — candidate recall can only
  // increase; its exact-Jaccard verify and 0.8 threshold are unchanged).
  private val sigCache = new java.util.concurrent.ConcurrentHashMap[String, (SparkSession, DataFrame)]()
  private val candCache = new java.util.concurrent.ConcurrentHashMap[String, (SparkSession, DataFrame)]()

  private def signatures(spark: SparkSession, sfDir: String): DataFrame = synchronized {
    val hit = sigCache.get(sfDir)
    if (hit != null && (hit._1 eq spark)) hit._2
    else {
      evictAll(sigCache)(_.unpersist())
      val df = signaturesFrom(extracted(spark, sfDir)).persist()
      sigCache.put(sfDir, (spark, df))
      df
    }
  }

  /** MinHash estimate-prefilter floor for the exact-Jaccard verify
    * (VERDICT r3 #2): exact shingle-set Jaccard runs ONLY on candidate pairs
    * whose signature-agreement estimate ≥ 0.8 − ε with ε = 0.25. With 64
    * signature slots, `est ~ Binomial(64, J)/64`, so for a true pair at the
    * J = 0.8 verify threshold P[est < 0.55] ≈ Φ(−4.9) ≈ 5e-7 — the
    * prefilter changes no output row in practice (DedupOpsSpec pins the
    * estimate-vs-exact agreement property), while skipping the O(|shingles|)
    * exact merge for the great mass of low-similarity band collisions. */
  private val JaccardPrefilterFloor = 0.55

  /** Banded-LSH candidate pairs over the shared signatures — 16 bands × 4
    * slots, mega-bucket suppression, payload-free self-join (DedupOps) —
    * WITH the signature-agreement estimate attached: the 512 B signatures
    * are joined back by url once, AFTER pair dedup, and the estimate is
    * computed a single time for all three downstream views (minhash output,
    * jaccard prefilter, survivor prefilter). */
  private def nearDupCandidates(spark: SparkSession, sfDir: String): DataFrame = synchronized {
    val hit = candCache.get(sfDir)
    if (hit != null && (hit._1 eq spark)) hit._2
    else {
      evictAll(candCache)(_.unpersist())
      val pairs = candidatesFrom(signatures(spark, sfDir)).persist()
      candCache.put(sfDir, (spark, pairs))
      pairs
    }
  }

  /** Signature relation (url, sh3, sig64) for an arbitrary extracted corpus
    * — the ONE definition of the shingle/minhash front half, shared by the
    * sfDir-cached path and the fixed-corpus fixture chain. */
  private def signaturesFrom(extractedDs: Dataset[ScrapedRow]): DataFrame = {
    val spark = extractedDs.sparkSession
    import spark.implicits._
    extractedDs.map { r =>
      val (sh3, sig64) = TextOps.shingleHashSig(r.normalized_text, 3, 64)
      (r.url, sh3, sig64)
    }.toDF("url", "sh3", "sig64")
  }

  /** Banded-LSH candidates + signature-agreement estimate from a signature
    * relation (the ONE definition of the candidate middle stage). */
  private def candidatesFrom(sigs: DataFrame): DataFrame = {
    val spark = sigs.sparkSession
    import spark.implicits._
    val bands = sigs.select("url", "sig64")
      .as[(String, Array[Long])].flatMap { case (url, sig) =>
        TextOps.lshBands(sig, 4).zipWithIndex.map { case (b, i) => (url, i, b) }
      }.toDF("url", "band_idx", "band_key")
    val pairs0 = graft.ops.DedupOps.candidatePairs(bands, Seq("band_idx", "band_key"), "url")
      .withColumnRenamed("id_a", "url_a").withColumnRenamed("id_b", "url_b")
    val sigCols = sigs.select(col("url"), col("sig64"))
    pairs0
      .join(sigCols.select(col("url").as("url_a"), col("sig64").as("sig_a")), "url_a")
      .join(sigCols.select(col("url").as("url_b"), col("sig64").as("sig_b")), "url_b")
      .select("url_a", "url_b", "sig_a", "sig_b")
      .as[(String, String, Array[Long], Array[Long])]
      .map { case (a, b, sa, sb) =>
        (a, b, math.round(TextOps.minHashSimilarity(sa, sb) * 100000) / 100000.0)
      }
      .toDF("url_a", "url_b", "est_jaccard")
  }

  /** The shared verify stage of the jaccard / survivor queries: candidates
    * → minhash-estimate prefilter (≥ [[JaccardPrefilterFloor]]) → exact
    * shingle-set Jaccard on the survivors of the prefilter only. Shingle
    * sets ship as distinct-sorted 64-bit hashes (8 B/shingle vs ~40-char
    * strings) — exact Jaccard modulo 64-bit collisions. The 5-decimal
    * rounding is shared so all views agree at the threshold boundary. */
  private def verifiedFrom(sigs: DataFrame, cands: DataFrame): DataFrame = {
    val spark = sigs.sparkSession
    import spark.implicits._
    val shingled = sigs.select(col("url"), col("sh3").as("shingles"))
    cands
      .filter(col("est_jaccard") >= JaccardPrefilterFloor)
      .join(shingled.select(col("url").as("url_a"), col("shingles").as("sh_a")), "url_a")
      .join(shingled.select(col("url").as("url_b"), col("shingles").as("sh_b")), "url_b")
      .select("url_a", "url_b", "sh_a", "sh_b")
      .as[(String, String, Array[Long], Array[Long])]
      .map { case (a, b, sa, sb) =>
        (a, b, math.round(TextOps.jaccardSorted(sa, sb) * 100000) / 100000.0)
      }
      .toDF("url_a", "url_b", "jaccard")
      .filter(col("jaccard") >= 0.8)
  }

  private val verifiedCache = new java.util.concurrent.ConcurrentHashMap[String, (SparkSession, DataFrame)]()

  /** Exact-verified near-dup pairs behind the same one-entry persist cache
    * as the relations they derive from (VERDICT r4 #2): without it,
    * `dedup_jaccard_pages` and `dedup_survivors_pages` each re-ran the
    * shingle-set verify map over the prefiltered candidates — most of the
    * survivors query's 6.9 s bench line was that recomputation. */
  private def jaccardVerified(s: SparkSession, dir: String): DataFrame = synchronized {
    val hit = verifiedCache.get(dir)
    if (hit != null && (hit._1 eq s)) hit._2
    else {
      evictAll(verifiedCache)(_.unpersist())
      val df = verifiedFrom(signatures(s, dir), nearDupCandidates(s, dir)).persist()
      verifiedCache.put(dir, (s, df))
      df
    }
  }

  /** SimHash near-dup pairs from a `(url, simhash)` relation — the ONE
    * definition of the chunk-LSH → hamming-verify chain, shared by
    * `dedup_simhash_pages` (corpus scale) and `simhash_fixture` (planted
    * oracle). Runs through the SAME candidate-pair operator as the
    * minhash/embedding families (DedupOps.candidatePairs: payload-free
    * self-join + mega-bucket suppression in one definition) — the band key
    * is one of the 4 16-bit simhash chunks (pigeonhole: pairs within
    * hamming distance ≤ 3 share at least one chunk), and the 8-byte hashes
    * are re-attached by url AFTER pair dedup. */
  private def simhashPairsFrom(hashed0: DataFrame): DataFrame = {
    // the (url, simhash) relation feeds THREE consumers (the chunk
    // explode and both sides of the pair re-attach join); without a cut
    // each consumer re-ran the full SimHash map over the corpus — 3× the
    // per-doc hash compute (r8; the blocks are reclaimed by the
    // ContextCleaner once the query's DataFrame is dropped, the
    // clusterRepresentatives generation pattern)
    val hashed = hashed0.localCheckpoint(true)
    val bands = hashed.select(col("url"),
      explode(array((0 until 4).map(i => struct(lit(i).as("i"),
        shiftright(col("simhash"), i * 16).bitwiseAND(lit(0xffffL)).as("c"))): _*)).as("ch"))
      .select(col("url"), col("ch.i").as("chunk_idx"), col("ch.c").as("chunk_key"))
    val pairs = graft.ops.DedupOps.candidatePairs(
      bands, Seq("chunk_idx", "chunk_key"), "url", maxBucket = 64)
      .withColumnRenamed("id_a", "url_a").withColumnRenamed("id_b", "url_b")
    pairs
      .join(hashed.select(col("url").as("url_a"), col("simhash").as("h_a")), "url_a")
      .join(hashed.select(col("url").as("url_b"), col("simhash").as("h_b")), "url_b")
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .filter(col("hamming") <= 3)
      .select("url_a", "url_b", "hamming")
      .orderBy("url_a", "url_b")
  }

  private val embedPairCache = new java.util.concurrent.ConcurrentHashMap[String, (SparkSession, DataFrame)]()

  /** Embedding-cosine near-dup pairs, LSH scale path (shared by
    * `dedup_embed_lsh` and `dedup_embed_survivors` through the same
    * one-entry persist cache as the text-side relations): multi-table
    * random-hyperplane bucketing → payload-free candidate self-join →
    * exact cosine verify on candidates only (native codegen `cosine_sim5`).
    * The bucket relation carries only (table, bucket, vec_id); the 256 B
    * embedding payloads are re-attached by id AFTER pair dedup, so they
    * never ride the quadratic part of the shuffle. Corpus-adaptive width
    * pins expected occupancy at ~64 vectors/bucket at ANY corpus size
    * (nBits = ceil(log2(n/64))). No count-based suppression: hyperplane
    * buckets are coarse BY DESIGN and occupancy is already pinned — a count
    * cap would suppress every bucket in a degenerate all-dup corpus
    * (exactly the rows a dedup query must surface). */
  private def embedLshVerified(s: SparkSession, dir: String): DataFrame = synchronized {
    val hit = embedPairCache.get(dir)
    if (hit != null && (hit._1 eq s)) hit._2
    else {
      evictAll(embedPairCache)(_.unpersist())
      val pairs = embedLshVerifiedUncached(s, dir).persist()
      embedPairCache.put(dir, (s, pairs))
      pairs
    }
  }

  private def embedLshVerifiedUncached(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    val nBits = graft.ops.Ann.adaptiveNBits(emb.count(), targetBucket = 64)
    val buckets = emb.as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        (0 until 8).map(t => (id, t, VectorOps.cosineLshBucket(v, nBits, t)))
      }
      .toDF("vec_id", "table", "bucket")
    val pairs = graft.ops.DedupOps.candidatePairs(
      buckets, Seq("table", "bucket"), "vec_id", maxBucket = Int.MaxValue)
    graft.plans.GraftExtensions.registerNative(s)
    pairs
      .join(emb.select(col("vec_id").as("id_a"), col("embedding").as("emb_a")), "id_a")
      .join(emb.select(col("vec_id").as("id_b"), col("embedding").as("emb_b")), "id_b")
      .select(col("id_a"), col("id_b"), expr("cosine_sim5(emb_a, emb_b)").as("cos"))
      .filter(col("cos") >= 0.35)
  }

  /** Force-materialize the shared cached relations for `sfDir` and return
    * named timings — bench accounting (VERDICT r3 #1): without an explicit
    * pre-warm, whichever query first touches `extracted()`/`signatures()`/
    * the candidate relation absorbs the whole shared cost into its own
    * bench line (the round-3 `dedup_exact_pages` 15 s mystery), masking both
    * its real cost and regressions in the materialization itself. */
  def prewarmShared(spark: SparkSession, sfDir: String): Seq[(String, Double)] = {
    def timed(name: String)(f: => Any): (String, Double) = {
      val t0 = System.nanoTime(); f; (name, (System.nanoTime() - t0) / 1e9)
    }
    Seq(
      timed("extracted")(extracted(spark, sfDir).count()),
      timed("signatures")(signatures(spark, sfDir).count()),
      timed("candidates")(nearDupCandidates(spark, sfDir).count()),
      timed("jaccard_verified")(jaccardVerified(spark, sfDir).count()),
      timed("embed_lsh_pairs")(embedLshVerified(spark, sfDir).count()))
  }

  /** Input for the E8 queries: the documents table plus three planted rows
    * exercising each skip reason of the never-throws contract. Planted ids
    * are NEGATIVE — the documents table ids are non-negative at every SF, so
    * no corpus growth can ever collide with them (ADVICE r2). */
  private def embedPipelineDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val planted = Seq(
      // 5009 chars → 3 chunks of the 500-token/50-overlap chunker. The text
      // is deliberately BREAK-POINT-FREE past its 9-char head (no sentence
      // punctuation, no spaces), so chunk boundaries are pure arithmetic
      // (stride 1800 chars) and the multi-chunk oracle formula is exact.
      (-4L, "ab cd ef " + "x" * 5000), // -> success, n_chunks = 3
      (-3L, ""),                 // -> "No input text available"
      (-2L, "tiny"),             // -> too short
      (-1L, "aaaa b c d e f")    // -> too few words of len > 1
    ).toDF("doc_id", "text")
    docs(s, dir).select(col("doc_id").cast("long"), col("text")).unionByName(planted)
  }

  private def embedPipelineRun(s: SparkSession, dir: String): DataFrame =
    graft.embed.EmbedPipeline.embedDocuments(
      s, embedPipelineDocs(s, dir), None, new graft.embed.HashStubProvider(8)).toDF()

  /** Per-variant floors for the `ann_recall` driver gate, set at
    * measured-minus-margin (VERDICT r4 #6). Measured recall@10 is
    * deterministic per SF (fixed corpus, fixed hyperplanes/centroids):
    * sf0.001 → lsh 0.70 / multiprobe 0.94 / ivf 1.00; sf0.01 → 0.56 /
    * 0.88 / 1.00; sf0.1 → 0.60 / 0.88 / 0.92. Floors sit one recall-step
    * (0.06+) under the cross-SF minimum; the RAW values additionally go
    * into the bench JSON so a drift inside the margin is still visible.
    *
    * Tier decision (VERDICT r5 #7): **multi-probe is the recommended LSH
    * tier** — 0.88 recall at near-identical suite cost to single-probe's
    * 0.60 (0.48 s vs 0.53 s measured), because probing Hamming-1 buckets
    * buys the recall that extra tables would, without extra index memory.
    * Its floor is accordingly held to the IVF-grade 0.8. Single-probe
    * `lsh` stays available as the explicit cheap opt-in (one bucket per
    * query — the minimum-candidate path for latency-first callers) with a
    * floor that gates catastrophic regression only, not production recall. */
  private val AnnRecallFloors = Seq("ivf" -> 0.8, "lsh" -> 0.5, "multiprobe" -> 0.8)

  /** Measured recall@10 per approximate ANN surface (single-probe LSH,
    * multi-probe LSH, IVF) against the exact top-10 over planted true
    * neighbors — the computation behind the `ann_recall` query, shared with
    * graft.Bench which emits the raw values. Last result is stashed in
    * [[lastAnnRecalls]] so a bench run that already executed the query
    * suite does not recompute the chain. */
  @volatile private[graft] var lastAnnRecalls: Map[String, Double] = Map.empty

  def annRecalls(s: SparkSession, dir: String): Map[String, Double] = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    graft.plans.GraftExtensions.registerNative(s)
    val raw = s.read.parquet(s"$dir/embeddings.parquet").select("vec_id", "embedding")
    val orig = raw.as[(Long, Array[Float])]
    val topK = 10
    val nQueries = 5

    // plant 10 neighbors per query: p = normalize(q̂ + 0.5·û) with û a
    // deterministic per-(query, j) unit noise vector → cos(p, q) ≈ 0.89
    val qVecs = orig.filter(_._1 < nQueries).collect().sortBy(_._1)
    val planted: Seq[(Long, Array[Float])] = qVecs.toSeq.flatMap { case (qid, qv) =>
      val qn = VectorOps.normalize(qv)
      (0 until topK).map { j =>
        val noise = Array.tabulate(qv.length) { d =>
          (TextOps.mix64(0x616e6eL ^ (qid * 1000 + j * 100 + d)) >>> 11).toFloat / (1L << 53).toFloat - 0.5f
        }
        val un = VectorOps.normalize(noise)
        val p = VectorOps.normalize(Array.tabulate(qv.length)(d => qn(d) + 0.5f * un(d)))
        (-(qid * topK + j + 1), p)
      }
    }
    val emb = orig.union(s.createDataset(planted))
    val corpus = emb.toDF("vec_id", "embedding")
    // same value as corpus.count() (orig rows + the 50 planted), but the
    // parquet side resolves from footer metadata instead of scanning the
    // union (r8 — one less full-scan job in the chain)
    val n = raw.count() + planted.size

    val q = corpus.filter(col("vec_id") >= 0 && col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    val exactTop = corpus.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"), expr("cosine_sim5(q_emb, embedding)").as("cos"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
      .select("query_id", "vec_id")
      .persist()

    def recallOf(approx: DataFrame): Double =
      approx.join(exactTop, Seq("query_id", "vec_id")).count().toDouble / (nQueries.toDouble * topK)

    // single-probe LSH (embed_knn_lsh shape); the bucketed relation is
    // persisted — single-probe and multi-probe score against the same
    // index, and without the persist each scoreProbes action re-hashes
    // the whole corpus
    val nBits = graft.ops.Ann.adaptiveNBits(n, targetBucket = 128)
    val indexed = emb.map { case (id, v) => (id, v, VectorOps.cosineLshBucket(v, nBits)) }
      .toDF("vec_id", "embedding", "cell")
      .persist()
    val lshProbes = indexed.filter(col("vec_id") >= 0 && col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("cell"))
    val lshTop = graft.ops.AnnIndex.scoreProbes(lshProbes, indexed, topK)
      .select("query_id", "vec_id")

    // multi-probe LSH (embed_knn_multiprobe shape)
    val mpProbes = indexed.filter(col("vec_id") >= 0 && col("vec_id") < nQueries)
      .as[(Long, Array[Float], Int)]
      .flatMap { case (id, v, _) =>
        graft.ops.Ann.multiProbeBuckets(v, nBits, 0, 3).map(b => (id, v, b))
      }.toDF("query_id", "q_emb", "cell")
    val mpTop = graft.ops.AnnIndex.scoreProbes(mpProbes, indexed, topK)
      .select("query_id", "vec_id")

    // IVF (embed_knn_ivf shape); centroids train on the ORIGINAL corpus
    // sample (lowest non-planted ids), as a real index would
    val k = graft.ops.Ann.adaptiveIvfK(n)
    val sample = orig.filter(_._1 < graft.ops.Ann.ivfSampleSize(k)).collect().sortBy(_._1).map(_._2)
    val cB = s.sparkContext.broadcast(graft.ops.Ann.trainCentroids(sample, k))
    val ivfIndexed = emb.map { case (id, v) => (id, v, graft.ops.Ann.nearestCentroid(v, cB.value)) }
      .toDF("vec_id", "embedding", "cell")
    val ivfProbes = ivfIndexed.filter(col("vec_id") >= 0 && col("vec_id") < nQueries)
      .as[(Long, Array[Float], Int)]
      .flatMap { case (id, v, _) =>
        graft.ops.Ann.probeCells(v, cB.value, 4).map(c => (id, v, c))
      }.toDF("query_id", "q_emb", "cell")
    val ivfTop = graft.ops.AnnIndex.scoreProbes(ivfProbes, ivfIndexed, topK)
      .select("query_id", "vec_id")

    val recalls = Map("lsh" -> recallOf(lshTop), "multiprobe" -> recallOf(mpTop),
      "ivf" -> recallOf(ivfTop))
    System.err.println(s"[ann_recall] n=$n nBits=$nBits k=$k recalls=$recalls")
    exactTop.unpersist()
    indexed.unpersist()
    lastAnnRecalls = recalls
    recalls
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ======== extraction family (rows-only; DOM semantics not SQL-expressible) ========
    // keywords is Array[String] internally; the driver's pandas row check
    // cannot hash array cells, so driver-facing output stringifies it.
    "extract_meta" -> ((s, dir) => extracted(s, dir).toDF()
      .select(col("url"), col("title"), col("description"), col("canonical_url"),
        col("language"), concat_ws(",", col("keywords")).as("keywords"),
        col("author"), col("published_at"))
      .orderBy("url")),

    "extract_content" -> ((s, dir) => extracted(s, dir).toDF()
      .select("url", "text_content", "word_count", "excerpt", "content_type")
      .orderBy("url")),

    "extract_markdown" -> ((s, dir) => extracted(s, dir).toDF()
      .select("url", "content")
      .orderBy("url")),

    "extract_links" -> ((s, dir) => extracted(s, dir).toDF()
      .select(col("url"), explode(col("links")).as("link"))
      .select(col("url"), col("link.url").as("link_url"), col("link.text").as("link_text"), col("link.is_external"))
      .orderBy("url", "link_url")),

    "extract_normalized" -> ((s, dir) => extracted(s, dir).toDF()
      .select(col("url"), col("normalized_text"), col("norm_hash"),
        col("norm_meta.char_count").as("char_count"),
        col("norm_meta.token_estimate").as("token_estimate"),
        col("norm_meta.blocks_total").as("blocks_total"),
        col("norm_meta.blocks_accepted").as("blocks_accepted"))
      .orderBy("url")),

    // ======== fixture-anchored extraction oracles (reference-asserted) ========
    // Expected values transcribed from the reference's OWN test assertions
    // (core-scraping.test.ts / normalizer.test.ts) into VALUES oracles —
    // independent ground truth for M1/C1/B7 in the driver's hard gate.
    "extract_fixture_meta" -> ((s, dir) => FixtureQueries.fixtureMeta(s)),
    "extract_fixture_checks" -> ((s, dir) => FixtureQueries.fixtureChecks(s)),
    "normalize_values" -> ((s, dir) => FixtureQueries.normalizeValues(s)),
    // same pattern for the feed (K4–K10) and markdown (K1–K3) parser
    // families: reference-asserted VALUES oracles (rss.test.ts /
    // markdown.test.ts) over the vendored fixtures + inline snippets
    "feed_fixture_items" -> ((s, dir) => FeedFixtureQueries.feedFixtureItems(s)),
    "markdown_fixture" -> ((s, dir) => FeedFixtureQueries.markdownFixture(s)),
    "github_fixture" -> ((s, dir) => FeedFixtureQueries.githubFixture(s)),
    "paginate_fixture" -> ((s, dir) => FeedFixtureQueries.paginateFixture(s)),
    // multimodal: planted-parameter ground truth through the REAL ImageIO
    // decode path (dims/format are generator inputs, not frozen outputs)
    "media_fixture" -> ((s, dir) => graft.multimodal.MediaFixtureQueries.mediaFixture(s)),
    "chunk_fixture" -> ((s, dir) => FixtureQueries.chunkFixture(s)),
    "feed_utils_fixture" -> ((s, dir) => FeedFixtureQueries.feedUtilsFixture(s)),
    "blocks_fixture" -> ((s, dir) => FixtureQueries.blocksFixture(s)),
    "meta_fixture" -> ((s, dir) => ExtractorFixtureQueries.metaFixture(s)),
    "links_fixture" -> ((s, dir) => ExtractorFixtureQueries.linksFixture(s)),
    "jsonld_fixture" -> ((s, dir) => ExtractorFixtureQueries.jsonldFixture(s)),
    // E9/L4: preset request mappings against an injected transport — the
    // recorded URL/headers/body vs the reference's preset contracts
    "http_presets_fixture" -> ((s, dir) => graft.embed.PresetFixtureQueries.httpPresetsFixture(s)),
    "errors_fixture" -> ((s, dir) => FixtureQueries.errorsFixture(s)),
    "input_fixture" -> ((s, dir) => FixtureQueries.inputFixture(s)),
    "safety_fixture" -> ((s, dir) => FixtureQueries.safetyFixture(s)),
    "vector_fixture" -> ((s, dir) => FixtureQueries.vectorFixture(s)),

    "extract_blocks" -> ((s, dir) => {
      import s.implicits._
      val n = math.min(PagesGen.pagesFor(dir), 2000)
      PagesGen.generate(s, n).mapPartitions(_.flatMap { p =>
        val doc = graft.dom.HtmlParser.parse(ExtractJob.decodeHtml(p.html))
        graft.content.BlockParser.parseBlocks(doc).zipWithIndex.map { case (b, i) =>
          (p.url, i, b.blockType, b.text, b.level.getOrElse(0), b.depth)
        }
      }).toDF("url", "block_idx", "block_type", "text", "level", "depth")
        .orderBy("url", "block_idx")
    }),

    "dedup_exact_pages" -> ((s, dir) => extracted(s, dir).toDF()
      .groupBy("norm_hash").agg(count("*").as("n"), min("url").as("keeper_url"))
      .orderBy("norm_hash")),

    "dedup_minhash_pages" -> ((s, dir) => {
      // shingle → minhash → LSH band → bucket join → estimated near-dup pairs.
      // Shuffle hygiene at 100 TB: the band self-join relation carries ONLY
      // (band_idx, band_key, url) — the 64-slot signatures (512 B each) are
      // re-attached by url AFTER candidate pairs are deduped, so they never
      // ride the quadratic part of the shuffle. The shared candidate relation
      // already carries the signature-agreement estimate (computed once for
      // this query, the jaccard prefilter, and the survivor prefilter), so
      // this query is a pure filter over it.
      nearDupCandidates(s, dir)
        .filter(col("est_jaccard") >= 0.5)
        .orderBy("url_a", "url_b")
    }),

    // End-to-end near-dup SURVIVOR selection: shared candidates → exact
    // Jaccard verify (≥ 0.8) → connected components (pointer-jumping CC) →
    // one survivor per duplicate cluster (the component-minimum url). This
    // is the full pipeline a 100 TB training-data dedup actually runs —
    // every stage bounded: banded self-join (suppressed mega-buckets),
    // verify only on candidates, O(log diameter) CC rounds on id-only
    // relations.
    "dedup_survivors_pages" -> ((s, dir) => {
      graft.ops.DedupOps.clusterRepresentatives(
          jaccardVerified(s, dir).select("url_a", "url_b"), "url_a", "url_b")
        .withColumn("is_survivor", col("id") === col("label"))
        .toDF("url", "cluster_rep", "is_survivor")
        .orderBy("url")
    }),

    "dedup_jaccard_pages" -> ((s, dir) =>
      // n-gram Jaccard near-dup: shared LSH candidates → minhash-estimate
      // prefilter → EXACT shingle-set Jaccard verify (see jaccardVerified)
      jaccardVerified(s, dir).orderBy("url_a", "url_b")),

    // The survivor chain END-TO-END behind a driver oracle (VERDICT r3 #3):
    // the SAME extract → shingle → minhash → band → candidates → estimate
    // prefilter → exact verify → CC → survivor composition as
    // dedup_survivors_pages, over a FIXED 600-page corpus whose planted
    // duplicate families are closed-form (PagesGen: row i with i%50==0 is a
    // dup of row i-1 — exact at i%100==0, one-extra-sentence near-dup
    // otherwise), so the expected clusters are pairs {50k-1, 50k} with the
    // numeric-minimum member as survivor — a generate_series DuckDB oracle,
    // independent of the LSH/CC machinery it checks.
    "dedup_survivors_fixture" -> ((s, dir) => {
      val sigs = signaturesFrom(ExtractJob.extractOnSplits(PagesGen.generate(s, 600)))
      val verified = verifiedFrom(sigs, candidatesFrom(sigs)).select("url_a", "url_b")
      val labels = graft.ops.DedupOps.clusterRepresentatives(verified, "url_a", "url_b")
        .withColumn("doc_idx", regexp_extract(col("id"), "post-(\\d+)$", 1).cast("long"))
      // re-key the cluster representative to the NUMERIC minimum member:
      // CC labels are min-URL (string order depends on the generated hosts),
      // while the planted ground truth is naturally keyed by row index
      val reps = labels.groupBy("label").agg(min("doc_idx").as("rep_idx"))
      labels.join(reps, "label")
        .select(col("doc_idx"), col("rep_idx"),
          (col("doc_idx") === col("rep_idx")).as("is_survivor"))
        .orderBy("doc_idx")
    }),

    "dedup_simhash_pages" -> ((s, dir) => {
      import s.implicits._
      val hashed = extracted(s, dir).map(r => (r.url, TextOps.simHash(r.normalized_text)))
        .toDF("url", "simhash")
      simhashPairsFrom(hashed)
    }),

    // The simhash chain END-TO-END behind a driver oracle (VERDICT r4 #5 —
    // the last dedup family with no oracle anywhere in its chain): the SAME
    // chunk-LSH → hamming-verify pipeline as dedup_simhash_pages, over a
    // FIXED 40-doc corpus with 10 planted near-dup pairs (exact dups at
    // k%3==0, one-token-swap variants otherwise) and 20 distinct singletons.
    // Expected (pair, hamming) rows are transcribed VALUES, cross-checked
    // against an independent Python implementation of FNV-1a 64 + the mix64
    // finalizer + the bit-vote (see SimhashFixture scaladoc). The ≤3-bit
    // chunk recall is not probabilistic here — pigeonhole over 4 chunks
    // GUARANTEES a shared chunk at hamming ≤ 3, so any missing planted pair
    // is a chain bug, not fixture bad luck.
    "simhash_fixture" -> ((s, dir) => SimhashFixture.query(s, simhashPairsFrom)),

    // Office-document extraction surface (round 6): blocks, metadata,
    // links, error dispositions of all three OOXML flavors over the frozen
    // DocxGen corpus — transcribed VALUES oracle, generator and parser
    // share nothing beyond the OOXML spec.
    "docx_fixture" -> ((s, dir) => DocxFixture.fixtureDf(s)),
    // RTF extraction surface (round 6): same pattern over planted RTFs
    "rtf_fixture" -> ((s, dir) => RtfFixture.fixtureDf(s)),

    // PDF/layout parse (north-rule stage, round 5: real from-scratch
    // implementation replacing the declared stub — graft.sources.PdfParser):
    // the frozen PdfGen corpus exercises uncompressed + FlateDecode content
    // streams, literal-string escapes, hex strings, TJ kerning spaces,
    // multi-page /Contents arrays with inherited resources, Type0 fonts
    // through their ToUnicode CMap, PDF 1.5 object streams, and the
    // never-throws corrupt/not-PDF gates. Parsing runs INSIDE mapPartitions
    // (the executor-side shape of the real pipeline); expected rows are a
    // transcribed VALUES oracle — the generator and parser share no code
    // beyond the PDF spec itself, so agreement pins both.
    "pdf_fixture" -> ((s, dir) => {
      import s.implicits._
      s.createDataset(graft.sources.PdfGen.fixtureDocs.map(_._1)).repartition(2)
        .mapPartitions { it =>
          val docs = graft.sources.PdfGen.fixtureDocs.toMap
          it.flatMap { name =>
            val blocks = graft.sources.PdfParser.parse(docs(name), "application/pdf")
            if (blocks.isEmpty) Iterator.single((name, -1L, -1L, "none", ""))
            else blocks.iterator.zipWithIndex.map { case (b, i) =>
              (name, b.page.toLong, i.toLong, b.kind, b.text.replace("\n", " | "))
            }
          }
        }.toDF("test_case", "page", "blk", "kind", "text")
        .orderBy("test_case", "page", "blk")
    }),

    // Round 6 (VERDICT r5 #2/#4): the PDF route END-TO-END through
    // scrapePdf — layout blocks through the SAME B2 classifier + B7
    // normalizeText gates as the HTML route (honest norm_meta: 'kerning'
    // is classifier-rejected exactly like its HTML twin would be), C3
    // content cap, and the distinct `encrypted_pdf` status. Text encoding
    // for the VALUES oracle: block separator "\n\n" → " ¶ ", intra-block
    // newline → " | ".
    "pdf_scrape_fixture" -> ((s, dir) => {
      import s.implicits._
      s.createDataset(graft.sources.PdfGen.fixtureDocs.map(_._1)).repartition(2)
        .mapPartitions { it =>
          val docs = graft.sources.PdfGen.fixtureDocs.toMap
          it.map { name =>
            val row = graft.pipeline.ScrapePipeline.scrapePdf(
              docs(name), s"https://pdf.example.com/$name.pdf")
            (name, row.status, row.content_type, row.title,
              row.norm_meta.blocks_total.toLong, row.norm_meta.blocks_accepted.toLong,
              row.norm_meta.truncated,
              row.normalized_text.replace("\n\n", " ¶ ").replace("\n", " | "))
          }
        }.toDF("test_case", "status", "content_type", "title",
          "blocks_total", "blocks_accepted", "truncated", "norm_text")
        .orderBy("test_case")
    }),

    // Round-6 metadata surface of the PDF route: /Info → title/author/
    // dates/subject/keywords (DocInfo title beats the heading heuristic),
    // /Link annotations → the links column. Transcribed VALUES oracle.
    "pdf_meta_fixture" -> ((s, dir) => {
      import s.implicits._
      val cases = Seq("annots", "docinfo", "outline", "plain")
      s.createDataset(cases).repartition(2)
        .mapPartitions { it =>
          val docs = graft.sources.PdfGen.fixtureDocs.toMap
          it.map { name =>
            val row = graft.pipeline.ScrapePipeline.scrapePdf(
              docs(name), s"https://pdf.example.com/$name.pdf")
            (name, row.title, row.author.getOrElse(""),
              row.published_at.getOrElse(""), row.modified_at.getOrElse(""),
              row.description, row.keywords.mkString("|"),
              row.links.length.toLong,
              row.links.count(_.is_external).toLong,
              row.custom.getOrElse("pdf_outline", "").replace("\n", "~"))
          }
        }.toDF("test_case", "title", "author", "published_at", "modified_at",
          "description", "keywords", "n_links", "n_external", "outline")
        .orderBy("test_case")
    }),

    // Cross-route exact dedup (VERDICT r5 #3): an HTML page and a PDF
    // carrying the same heading + paragraphs must normalize to the same
    // bytes on both routes and land in ONE norm_hash cluster — the claim
    // "exact dedup keys are comparable across routes", oracle-gated. The
    // corpus routes through the production scrapeAny magic-byte dispatch
    // inside executors, not a test-only path.
    "pdf_dedup_fixture" -> ((s, dir) => {
      import s.implicits._
      val corpus: Seq[(String, Array[Byte])] = Seq(
        "https://site-a.example.com/page" ->
          graft.sources.PdfGen.crossRouteHtml.getBytes("UTF-8"),
        "https://site-b.example.com/doc.pdf" -> graft.sources.PdfGen.crossRoutePdf(),
        "https://site-c.example.com/other" ->
          "<html><body><h1>Unrelated Page</h1><p>Entirely different body text here.</p></body></html>"
            .getBytes("UTF-8"),
        "https://site-d.example.com/report.pdf" ->
          graft.sources.PdfGen.fixtureDocs.toMap.apply("plain"))
      val extracted = s.createDataset(corpus).repartition(2)
        .map { case (url, blob) =>
          val r = ExtractJob.scrapeAny(url, blob); (r.url, r.norm_hash)
        }.toDF("url", "norm_hash")
      val clusters = extracted.groupBy("norm_hash")
        .agg(count("*").as("cluster_size"), min("url").as("cluster_rep"))
      extracted.join(clusters, "norm_hash")
        .select("url", "cluster_size", "cluster_rep")
        .orderBy("url")
    }),

    // WARC ingest leg (round 6, beyond-reference: the crawl-archive input
    // the north rule's Common-Crawl framing implies). The frozen WarcGen
    // fixture corpus (graft.sources.WarcGen.fixtureFiles — one file per
    // case) is read through the REAL DataSource V2 `format("warc")` path:
    // per-record gzip members, chunked transfer + content-encoding
    // decoding, Content-Length salvage, WARC-Truncated propagation, and
    // the never-throws gates. Expected rows are a transcribed VALUES
    // oracle; generator and parser share no code beyond the WARC spec, so
    // agreement pins both (the PdfGen/PdfParser pattern).
    "warc_fixture" -> ((s, dir) => {
      val fdir = new java.io.File(sys.props("java.io.tmpdir"), "graft_warc_fixture")
      graft.sources.WarcGen.writeFixture(fdir)
      s.read.format("warc").load(fdir.getAbsolutePath)
        .select(
          regexp_extract(col("file"), "([^/]+)$", 1).as("test_case"),
          col("record_idx"),
          col("warc_type"),
          col("url"),
          col("http_status").cast("long").as("http_status"),
          coalesce(expr("unix_micros(warc_ts)"), lit(-1L)).as("ts_us"),
          col("content_type"),
          col("truncated"),
          when(col("content_type") === "application/pdf", lit("PDF"))
            .otherwise(substring(
              regexp_replace(col("payload").cast("string"), "[\\r\\n]", "·"), 1, 30))
            .as("preview"))
        .orderBy("test_case", "record_idx")
    }),

    // End-to-end round-trip invariant: PagesGen pages written as sharded
    // per-record-gzip WARC files (the Common-Crawl layout), re-ingested via
    // format("warc") → WarcIngest.pages, must be BYTE-IDENTICAL to the
    // direct corpus (html bytes, warc_ts), and extraction over the ingested
    // table must produce the same norm_hash per url as extraction over the
    // direct table — the archive leg cannot perturb the pipeline's output.
    "warc_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val n = 120
      val cdir = new java.io.File(sys.props("java.io.tmpdir"), s"graft_warc_corpus_${n}_4")
      graft.sources.WarcGen.writeCorpus(cdir, n, 4)
      val ingested = WarcIngest.pages(s, cdir.getAbsolutePath)
      val direct = PagesGen.generate(s, n)
      val pairs = ingested.select(col("url"), col("warc_ts").as("w_ts"), col("html").as("w_html"))
        .join(direct.select(col("url"), col("warc_ts").as("d_ts"), col("html").as("d_html")), "url")
      val bytesOk = pairs.agg(
        count("*").as("n_pages"),
        sum(when(col("w_html") === col("d_html"), 1L).otherwise(0L)).as("n_html_identical"),
        sum(when(col("w_ts") === col("d_ts"), 1L).otherwise(0L)).as("n_ts_identical"))
      val viaWarc = ExtractJob.extract(ingested, 4)
        .select(col("url"), col("norm_hash").as("w_hash"))
      val directEx = ExtractJob.extract(direct, 4)
        .select(col("url"), col("norm_hash").as("d_hash"))
      val exOk = viaWarc.join(directEx, "url")
        .agg(sum(when(col("w_hash") === col("d_hash"), 1L).otherwise(0L)).as("n_extract_match"))
      bytesOk.crossJoin(exOk) // 1×1 — not a scale surface
    }),

    // Sitemap parse surface (urlset / sitemapindex / txt / gzip / robots
    // discovery) over the frozen SitemapFixture blobs, and the frontier
    // composition it feeds (normalize → broadcast robots gate → seen-set
    // anti-join → distinct) — both against transcribed VALUES oracles.
    "sitemap_fixture" -> ((s, dir) => SitemapFixture.fixtureDf(s)),
    "sitemap_frontier" -> ((s, dir) => SitemapFixture.frontierDf(s)),
    // same frontier through the Bloom-prefiltered seen-set (no false
    // negatives ⇒ output must hash-match the exact path's oracle verbatim)
    "sitemap_frontier_bloom" -> ((s, dir) => SitemapFixture.frontierBloomDf(s)),
    // politeness interleave (Frontier.interleaveByHost) over the documents
    // table with source standing in for host — host_seq is the per-host
    // fetch round; a fetch loop consumes ORDER BY (host_seq, host)
    "frontier_interleave" -> ((s, dir) =>
      graft.pipeline.Frontier.interleaveByHost(
          docs(s, dir).select(col("doc_id"), col("source")), "source", "doc_id")
        .select(col("doc_id"), col("source"), col("host_seq"))
        .orderBy("host_seq", "source", "doc_id")),

    // fixture-anchored oracles for the 3 formerly rows-only text-analysis
    // ops (VERDICT r3 #4) — expected cells independently derived by hand /
    // cross-checked in Python (see TextFixtureQueries scaladoc)
    "langid_fixture" -> ((s, dir) => TextFixtureQueries.langidFixture(s)),
    "quality_fixture" -> ((s, dir) => TextFixtureQueries.qualityFixture(s)),
    "fingerprint_fixture" -> ((s, dir) => TextFixtureQueries.fingerprintFixture(s)),

    "langid_pages" -> ((s, dir) => {
      import s.implicits._
      extracted(s, dir).map { r =>
        val (lang, conf) = TextOps.detectLanguage(r.text_content)
        (r.url, lang, math.round(conf * 10000) / 10000.0)
      }.toDF("url", "detected_lang", "confidence").orderBy("url")
    }),

    "quality_pages" -> ((s, dir) => {
      import s.implicits._
      extracted(s, dir).map { r =>
        val q = TextOps.quality(r.text_content)
        (r.url, q.nChars, q.nWords, math.round(q.score * 10000) / 10000.0)
      }.toDF("url", "n_chars", "n_words", "quality_score").orderBy("url")
    }),

    "fingerprint_pages" -> ((s, dir) => {
      import s.implicits._
      extracted(s, dir).map(r => (r.url, TextOps.fingerprint(r.normalized_text).mkString(",")))
        .toDF("url", "fingerprint").orderBy("url")
    }),

    // Gopher/C4-style repetition + quality-filter signals (RepetitionOps;
    // published corpus-filter heuristics — beyond-reference surface for
    // training-data curation). Three tiers: frozen fixture vs transcribed
    // VALUES oracle; word-level signals over the documents table vs a
    // DuckDB list_zip n-gram oracle; the corpus pass over extracted pages
    // (rows-only — per-row narrow map, no shuffle).
    "repetition_fixture" -> ((s, dir) => RepetitionFixture.fixtureDf(s)),

    "doc_repetition" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir).select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, text) =>
          val p = RepetitionOps.profile(text)
          (id, p.nWords.toLong, p.nDistinctWords.toLong, p.wordChars,
            p.topWordCount.toLong, p.top2Count.toLong, p.top3Count.toLong,
            p.alphaWords.toLong, p.stopHits.toLong, p.nHash.toLong,
            p.nEllipsis.toLong, p.truncated)
        }
        .toDF("doc_id", "n_words", "n_distinct_words", "word_chars",
          "top_word", "top2_count", "top3_count", "alpha_words",
          "stop_hits", "n_hash", "n_ellipsis", "truncated")
        .orderBy("doc_id")
    }),

    "repetition_pages" -> ((s, dir) => {
      import s.implicits._
      extracted(s, dir).map { r =>
        val p = RepetitionOps.profile(r.normalized_text)
        val v = RepetitionOps.gopherFilter(p)
        (r.url, p.nWords.toLong, p.dupLines.toLong, p.top2Count.toLong,
          p.dup5Chars, v.keep, v.reasons.mkString("+"))
      }.toDF("url", "n_words", "dup_lines", "top2_count", "dup5_chars",
          "keep", "reasons")
        .orderBy("url")
    }),

    // Cross-document paragraph dedup (CCNet/RefinedWeb-style boilerplate
    // removal, ops/ParaDedup): planted-df fixture vs transcribed VALUES
    // oracle; corpus pass over the extracted pages' normalized text
    // (rows-only — blocks are joined with blank lines by normalizeText, so
    // the paragraph split is the block structure).
    "para_dedup_fixture" -> ((s, dir) => ParaDedupFixture.fixtureDf(s)),

    "para_dedup_pages" -> ((s, dir) => {
      graft.ops.ParaDedup.dedupParagraphs(
          extracted(s, dir).toDF(), "url", "normalized_text", minDocFreq = 5)
        .select(col("id").as("url"), length(col("text_deduped")).as("n_chars"),
          col("paras_total"), col("paras_removed"), col("chars_removed"))
        .orderBy("url")
    }),

    // The COMPOSED curation pipeline (pipeline/Curate): para-dedup →
    // quality gate on cleaned text → exact dedup → LSH near-dup survivors,
    // emitting a per-document disposition ledger. Fixture: every stage
    // fires on planted structure vs a transcribed VALUES oracle; corpus
    // pass: the same composition over the extracted pages (rows-only).
    "curation_fixture" -> ((s, dir) => CurateFixture.fixtureDf(s)),

    // Incremental dedup against a persisted history index (ops/
    // IncrementalDedup): two batches over a planted corpus exercising
    // exact/near dups vs history AND within-batch, vs a transcribed
    // VALUES oracle.
    "incdedup_fixture" -> ((s, dir) => IncDedupFixture.fixtureDf(s)),

    "curation_pages" -> ((s, dir) => {
      Curate.curate(extracted(s, dir).toDF(), "url", "normalized_text",
          Curate.Config(paraMinDocFreq = 5))
        .orderBy("id")
    }),

    // Crawl-delta / revisit detection (ops/CrawlDelta — CDX revisit
    // semantics). Both queries plant deterministic mutation rules over the
    // documents table that the DuckDB oracle reproduces verbatim, so the
    // join/window SEMANTICS are cross-engine-checked at corpus scale, not
    // transcribed: snapshot diff (removed: id%13, changed: id%7, added:
    // id%11 under shifted urls) and a 3-fetch history (changed at seq 2
    // for odd ids, at seq 3 for id%3=0).
    "doc_crawl_delta" -> ((s, dir) => {
      val d = docs(s, dir)
      val h = expr("substring(sha2(text, 256), 1, 32)")
      val prevSnap = d.select(col("doc_id").cast("string").as("url"), h.as("hash"))
      val currBase = d.filter(col("doc_id") % 13 =!= 0)
        .select(col("doc_id").cast("string").as("url"),
          when(col("doc_id") % 7 === 0,
            expr("substring(sha2(concat(text, 'v2'), 256), 1, 32)"))
            .otherwise(h).as("hash"))
      val currAdded = d.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 1000000).cast("string").as("url"),
          expr("substring(sha2(concat(text, 'new'), 256), 1, 32)").as("hash"))
      graft.ops.CrawlDelta.diff(prevSnap, currBase.union(currAdded))
        .orderBy("url")
    }),

    "doc_fetch_history" -> ((s, dir) => {
      val d = docs(s, dir)
      val h0 = expr("substring(sha2(text, 256), 1, 32)")
      val h2 = when(col("doc_id") % 2 === 0, h0)
        .otherwise(expr("substring(sha2(concat(text, 'v2'), 256), 1, 32)"))
      val h3 = when(col("doc_id") % 3 === 0,
          expr("substring(sha2(concat(text, 'v3'), 256), 1, 32)"))
        .otherwise(h2)
      val hist =
        d.select(col("doc_id").cast("string").as("url"), lit(1L).as("fetch_seq"), h0.as("hash"))
          .union(d.select(col("doc_id").cast("string"), lit(2L), h2))
          .union(d.select(col("doc_id").cast("string"), lit(3L), h3))
      graft.ops.CrawlDelta.fetchHistory(hist)
        .orderBy("url", "fetch_seq")
    }),

    // Train/test decontamination (ops/Decontaminate — the published
    // n-gram-overlap rule): benchmark set = doc_id % 17 == 0, training
    // side = the rest, 5-word grams (the word-soup vocabulary makes
    // 5-gram cross-doc overlap genuinely present). Cross-engine semantic
    // oracle: DuckDB rebuilds the same gram relation with list_zip and
    // runs the overlap join itself.
    "doc_decontaminate" -> ((s, dir) => {
      val d = docs(s, dir)
      val bench = d.filter(col("doc_id") % 17 === 0)
      val train = d.filter(col("doc_id") % 17 =!= 0)
      graft.ops.Decontaminate.flag(train, bench, "doc_id", "text", "text", n = 5)
        .select(col("id").cast("long").as("doc_id"),
          col("shared_grams"), col("contaminated"))
        .orderBy("doc_id")
    }),

    // The WHOLE training-set assembly in one call (Curate.trainingSet):
    // curation → decontamination → mix sampling → seeded shuffle →
    // packing, in its SQL-expressible configuration (para/quality/near-dup
    // neutralized; those stages carry their own oracles) — DuckDB replays
    // the full composition: exact dedup (lexicographic min keeper — the
    // ledger ids are strings), 5-gram decontamination vs the planted
    // doc_id%17 benchmark, per-lang hex-threshold sampling, the shuffle
    // key chain, and the pack windows over (shard, skey) order.
    "training_run" -> ((s, dir) => {
      val d = docs(s, dir)
      val bench = d.filter(col("doc_id") % 17 === 0).select("doc_id", "text")
      val permissive = graft.ops.RepetitionOps.Thresholds(
        minWords = 0, maxWords = Int.MaxValue, minMeanWordLen = 0.0,
        maxMeanWordLen = 1e18, maxSymbolRatio = 1e18,
        maxBulletLineFrac = 1e18, maxEllipsisLineFrac = 1e18,
        minAlphaWordFrac = 0.0, minStopHits = 0, maxDupLineFrac = 1e18,
        maxDupParaFrac = 1e18, maxDupLineCharFrac = 1e18,
        maxDupParaCharFrac = 1e18, maxTop2CharFrac = 1e18,
        maxTop3CharFrac = 1e18, maxTop4CharFrac = 1e18,
        maxDupNCharFrac = Seq.fill(6)(1e18))
      val cfg = graft.pipeline.Curate.TrainingConfig(
        curate = graft.pipeline.Curate.Config(
          paraMinDocFreq = 1 << 30, thresholds = permissive, nearDup = false),
        decontamN = 5, mixRates = Map("en" -> 0.5), defaultRate = 0.25,
        shuffleSeed = 2026L, packBudget = 512, numShards = 4)
      val r = graft.pipeline.Curate.trainingSet(
        d.select("doc_id", "text", "lang"), "doc_id", "text", "lang",
        Some(bench), cfg)
      r.ledger
        .select(col("id").cast("long").as("doc_id"), col("kept"),
          col("stage"), col("reason"))
        .join(r.packed.select(col("id").as("doc_id"), col("shard"),
          col("tokens"), col("cum_before"), col("first_chunk"),
          col("last_chunk"), col("straddles")), Seq("doc_id"), "left")
        .orderBy("doc_id")
    }),

    // Training-sequence packing (ops/Pack — concat-and-chunk): tokens =
    // ceil(len/4) (the chunking heuristic), 4 shards, 512-token chunks.
    // Cross-engine semantic oracle: DuckDB runs the same cumulative-sum
    // window and chunk arithmetic itself.
    "doc_pack" -> ((s, dir) => {
      val withTokens = docs(s, dir)
        .select(col("doc_id"), expr("CAST(ceil(length(text) / 4.0) AS BIGINT)").as("toks"))
      graft.ops.Pack.concatChunk(withTokens, "doc_id", "toks",
          budget = 512, numShards = 4)
        .orderBy("id")
    }),

    // Deterministic seeded corpus shuffle (ops/Pack.seededShuffle): the
    // shuffle-before-pack step — reproducible interleaving independent of
    // cluster size. Cross-engine oracle: DuckDB computes the identical
    // MINSTD-mod-Mersenne + xor-shift key chain and window rank.
    "doc_shuffle" -> ((s, dir) =>
      graft.ops.Pack.seededShuffle(docs(s, dir), "doc_id",
          seed = 2026L, numShards = 8)
        .orderBy("id")),

    // Corpus census: the per-(lang, source) aggregate a training-mix
    // curator reads first — doc counts, char mass, exact-dup profile.
    // Plain hash-agg (map-side combine); scale-safe at any corpus size.
    "doc_corpus_stats" -> ((s, dir) =>
      graft.ops.Census.exact(docs(s, dir), Seq("lang", "source"))),

    // Content-hash Bernoulli sampling: a doc is kept iff the first hex
    // nibble of sha256(text) falls in the stratum's accept set (en ≈ 25%,
    // others ≈ 6.25%) — reproducible subsets with no RNG state, the same
    // row set on any cluster size, and a DuckDB-reproducible rule.
    "doc_sample" -> ((s, dir) => docs(s, dir)
      .withColumn("nib", expr("substring(sha2(text, 256), 1, 1)"))
      .filter((col("lang") === "en" && col("nib").isin("0", "1", "2", "3")) ||
        (col("lang") =!= "en" && col("nib") === "0"))
      .select(col("doc_id"), col("lang"), col("nib"))
      .orderBy("doc_id")),

    // Stratified deterministic sampling (Curate.stratifiedSample):
    // training-mix composition — per-language keep rates, content-keyed so
    // the sample is cluster-size independent and never splits a dup family.
    // Cross-engine oracle: DuckDB applies the same hex-threshold CASE.
    "doc_mix_sample" -> ((s, dir) =>
      graft.pipeline.Curate.stratifiedSample(docs(s, dir), "text", "lang",
          Map("en" -> 0.25, "zh" -> 0.75), defaultRate = 0.125)
        .select(col("doc_id"), col("lang"),
          expr("substring(sha2(text, 256), 1, 8)").as("h8"))
        .orderBy("doc_id")),

    "media_features" -> ((s, dir) => {
      import s.implicits._
      val n = math.min(PagesGen.pagesFor(dir), 2000)
      graft.multimodal.Multimodal.extractFeatures(graft.multimodal.Multimodal.mediaGen(s, n))
        .map(f => (f.media_id, f.kind, f.lsh_bucket, f.decode_ok,
          math.round(f.feature.head * 100000) / 100000.0))
        .toDF("media_id", "kind", "lsh_bucket", "decode_ok", "f0")
        .orderBy("media_id")
    }),

    "media_frames" -> ((s, dir) => {
      import s.implicits._
      val n = math.min(PagesGen.pagesFor(dir), 500)
      // gif rows sample REAL frames (javax.imageio multi-frame read, ts
      // from the GIF's own GraphicControlExtension delays); video rows
      // stay on the honest stub (no ffmpeg in this container)
      graft.multimodal.Multimodal.mediaGen(s, n)
        .filter(m => m.kind == "video" || m.kind == "gif")
        .flatMap { m =>
          val frames =
            if (m.kind == "gif") graft.multimodal.Multimodal.frameSampleGif(m.bytes)
            else graft.multimodal.Multimodal.frameSampleStub(m)
          frames.map { case (ts, fb) => (m.media_id, ts, fb.length.toLong) }
        }
        .toDF("media_id", "frame_ts_ms", "frame_bytes")
        .orderBy("media_id", "frame_ts_ms")
    }),

    "feed_parse" -> ((s, dir) => {
      import s.implicits._
      // deterministic per-row feed synthesis from the events table shape,
      // exploded to item level — exercises K4/K5/K8 at any sf
      val n = math.min(PagesGen.pagesFor(dir), 2000)
      s.range(n).mapPartitions(_.map { i =>
        val xml =
          s"""<rss version="2.0"><channel><title>Feed $i</title><link>https://feeds.example.com/f$i</link>
             |<item><title>Item A$i</title><link>/a/$i</link><guid>https://feeds.example.com/a/$i</guid>
             |<pubDate>Mon, 06 Sep 2024 16:45:00 +0000</pubDate><description>Alpha $i</description>
             |<category>Tech</category></item>
             |<item><title>Item B$i</title><link>http://insecure.example.com/b/$i</link></item>
             |</channel></rss>""".stripMargin
        (i, xml)
      }).flatMap { case (i, xml) =>
        val feed = new graft.feed.RssParser().parse(xml, Some(s"https://feeds.example.com/f$i")).data
        feed.items.zipWithIndex.map { case (item, idx) =>
          (i, idx, feed.title, item.title, item.link, item.publishedAt.getOrElse(""), item.categories.mkString(","))
        }
      }.toDF("feed_id", "item_idx", "feed_title", "item_title", "item_link", "published_at", "categories")
        .orderBy("feed_id", "item_idx")
    }),

    "markdown_parse" -> ((s, dir) => {
      import s.implicits._
      extracted(s, dir).map { r =>
        val md = graft.feed.MarkdownParser.parse(r.content)
        (r.url, md.title.getOrElse(""), md.sections.length.toLong, md.links.length.toLong, md.codeBlocks.length.toLong)
      }.toDF("url", "md_title", "n_sections", "n_links", "n_code_blocks").orderBy("url")
    }),

    "chunk_docs" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir).select("doc_id", "text").as[(Long, String)]
        .flatMap { case (id, text) =>
          graft.embed.Embed.chunkText(text, size = 64, overlapIn = 8).zipWithIndex.map {
            case (c, i) => (id, i, c.text, c.startIndex, c.endIndex, c.tokens)
          }
        }.toDF("doc_id", "chunk_idx", "chunk_text", "start_index", "end_index", "tokens")
        .orderBy("doc_id", "chunk_idx")
    }),

    // ======== oracle-checked queries over driver tables ========
    "pii_redact" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir).select("doc_id", "text").as[(Long, String)]
        .map { case (id, t) =>
          val r = graft.embed.Embed.redactPii(t)
          (id, r.text, r.redactionCount.toLong)
        }.toDF("doc_id", "redacted_text", "n_redactions")
        .orderBy("doc_id")
    }),

    "doc_hash" -> ((s, dir) => docs(s, dir)
      .select(col("doc_id"), expr("substring(sha2(text, 256), 1, 32)").as("hash32"))
      .orderBy("doc_id")),

    // cache retention (LRU + TTL) over the persisted cache table — the
    // reference's InMemoryEmbeddingCache semantics at table scale, DuckDB
    // replaying the scripted sequence (embed/CacheRetentionFixture)
    "cache_retention_fixture" -> ((s, dir) =>
      graft.embed.CacheRetentionFixture.fixtureDf(s)),

    "embed_cache_key" -> ((s, dir) => {
      import s.implicits._
      // deliberately the NO-safety config (a reference call with `safety`
      // undefined → key dropped by normalizeObject): this query checks the
      // standalone E7 derivation over raw text. The redaction-enabled
      // safety shape the pipeline always emits (EmbedPipeline.cacheConfigFor)
      // is oracle-checked through embed_pipeline / embed_pipeline_cachehit.
      val cfg = graft.embed.EmbedCache.CacheConfig(providerKey = "stub")
      docs(s, dir).select("doc_id", "text").as[(Long, String)]
        .map { case (id, t) =>
          (id, graft.embed.EmbedCache.cacheKey(cfg, t), graft.embed.EmbedCache.checksum(t))
        }.toDF("doc_id", "cache_key", "checksum")
        .orderBy("doc_id")
    }),

    // ======== E8: fused embedding pipeline (select → validate → redact →
    // cache → chunk → embed → aggregate; never throws) with a deterministic
    // SQL-expressible stub provider → full DuckDB oracle over the stage. ====
    "embed_pipeline" -> ((s, dir) => embedPipelineRun(s, dir)
      .select(col("doc_id"), col("status"), col("reason"), col("cache_key"),
        col("checksum"), col("n_chunks").cast("long").as("n_chunks"),
        col("tokens").cast("long").as("tokens"), col("pii_redacted"), col("cached"))
      .orderBy("doc_id")),

    "embed_pipeline_vec" -> ((s, dir) => embedPipelineRun(s, dir)
      .filter(col("status") === "success")
      .select(col("doc_id"), posexplode(col("vector")).as(Seq("dim", "v")))
      .select(col("doc_id"), col("dim").cast("long").as("dim"),
        round(col("v").cast("double"), 5).as("v"))
      .orderBy("doc_id", "dim")),

    // warm re-run against the cache table built from the cold pass: every
    // success row must come back cached=true with identical key/vector meta
    // (the provider-call-free contract is additionally pinned in EmbedSpec).
    // The metrics surface as data: exactCounters derives retry-stable
    // hit/miss/skip counts from the materialized output (the reference
    // cache getStats analogue), driver-checked against the same CTE the
    // other E8 oracles use.
    "embed_pipeline_counters" -> ((s, dir) => {
      import s.implicits._
      val res = graft.embed.EmbedPipeline.embedDocuments(
        s, embedPipelineDocs(s, dir), None, new graft.embed.HashStubProvider(8))
      val c = graft.embed.EmbedPipeline.exactCounters(res)
      Seq((c.cacheHits, c.cacheMisses, c.skipped))
        .toDF("cache_hits", "cache_misses", "skipped")
    }),

    "embed_pipeline_cachehit" -> ((s, dir) => {
      val all = embedPipelineDocs(s, dir)
      val cold = graft.embed.EmbedPipeline.embedDocuments(
        s, all, None, new graft.embed.HashStubProvider(8))
      val cacheTable = graft.embed.EmbedPipeline.toCacheRows(cold)
      graft.embed.EmbedPipeline.embedDocuments(
          s, all, Some(cacheTable), new graft.embed.HashStubProvider(8))
        .toDF()
        .select(col("doc_id"), col("status"), col("cache_key"),
          col("n_chunks").cast("long").as("n_chunks"),
          col("tokens").cast("long").as("tokens"), col("cached"))
        .orderBy("doc_id")
    }),

    // real subword budgeting: byte-level BPE count via the native codegen
    // BpeTokenCount expression over the frozen fixture merge table
    // (ops/Bpe.FixtureMerges); the DuckDB oracle REPLAYS the merges
    // (pipeline/BpeOracle chained-replace form) — cross-engine, not VALUES
    "doc_tokens_bpe" -> ((s, dir) => { graft.plans.GraftExtensions.registerNative(s); docs(s, dir)
      .select(col("doc_id"),
        call_function("bpe_token_count", col("text"),
          lit(graft.ops.Bpe.FixtureSpec)).cast("long").as("bpe_tokens"))
      .orderBy("doc_id") }),

    // pre-tokenizer edge shapes (contractions, digit/punct runs, multi-
    // space, empty) against the same merge replay
    "bpe_fixture" -> ((s, dir) => { graft.plans.GraftExtensions.registerNative(s)
      import s.implicits._
      graft.pipeline.BpeOracle.FixtureRows.toDF("fid", "txt")
        .select(col("fid"),
          call_function("bpe_token_count", col("txt"),
            lit(graft.ops.Bpe.FixtureSpec)).cast("long").as("bpe_tokens"))
        .orderBy("fid") }),

    // n_words via the native codegen TokenCount expression (graft.plans) —
    // one byte-scan per row, no regex/array alloc; equals the DuckDB
    // regexp_split oracle on whitespace-sane text (verified per-row at sf0.01).
    "doc_tokens" -> ((s, dir) => { graft.plans.GraftExtensions.registerNative(s); docs(s, dir)
      .select(col("doc_id"),
        expr("CAST(token_count(text) AS BIGINT)").as("n_words"),
        length(col("text")).cast("long").as("n_chars"),
        expr("CAST(ceil(length(text) / 4.0) AS BIGINT)").as("token_estimate"))
      .orderBy("doc_id") }),

    "doc_dedup_exact" -> ((s, dir) => docs(s, dir)
      .groupBy(expr("substring(sha2(text, 256), 1, 32)").as("hash32"))
      .agg(count("*").as("n"), min("doc_id").as("keeper"))
      .orderBy("hash32")),

    // Connected-component cluster representatives (the transitive-closure
    // step after candidate-pair generation: a≈b, b≈c ⇒ one survivor for
    // {a,b,c}). Edges here are deterministic 8-chains over the contiguous
    // doc_ids — diameter-7, so the generic iterative min-label operator
    // must actually propagate across multiple rounds — while the ground
    // truth stays SQL-expressible: label = doc_id - doc_id % 8.
    "doc_dedup_cluster" -> ((s, dir) => {
      val ids = docs(s, dir).select(col("doc_id").cast("long").as("id_a"))
      val pairs = ids.filter(col("id_a") % 8 =!= 7)
        .withColumn("id_b", col("id_a") + 1)
        .join(docs(s, dir).select(col("doc_id").cast("long").as("id_b")), "id_b")
        .select("id_a", "id_b")
      // left-join every doc back on: a chain-singleton (possible when
      // n % 8 == 1 — the last block has one member) appears in no pair,
      // so CC omits it; its representative is itself, matching the
      // oracle's label = doc_id - doc_id % 8 at every corpus size
      val labels = graft.ops.DedupOps.clusterRepresentatives(pairs)
      docs(s, dir).select(col("doc_id").cast("long").as("id"))
        .join(labels, Seq("id"), "left")
        .select(col("id"), coalesce(col("label"), col("id")).as("label"))
        .orderBy("id")
    }),

    "doc_quality" -> ((s, dir) => docs(s, dir)
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        expr("CAST(length(regexp_replace(text, '[^.!?,;:]', '')) AS BIGINT)").as("n_punct"),
        expr("CAST(length(regexp_replace(text, '[^0-9]', '')) AS BIGINT)").as("n_digits"),
        expr("CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE size(split(trim(text), '\\\\s+')) END AS BIGINT)").as("n_words"))
      .orderBy("doc_id")),

    "doc_langid" -> ((s, dir) => docs(s, dir)
      .select(col("doc_id"), col("lang"),
        expr("CAST((length(lower(text)) - length(replace(lower(text), ' the ', ''))) / 5 AS BIGINT)").as("en_hits"),
        expr("CAST((length(lower(text)) - length(replace(lower(text), ' und ', ''))) / 5 AS BIGINT)").as("de_hits"),
        expr("CAST((length(lower(text)) - length(replace(lower(text), ' les ', ''))) / 5 AS BIGINT)").as("fr_hits"))
      .orderBy("doc_id")),

    "events_window" -> ((s, dir) => s.read.parquet(s"$dir/events.parquet")
      .groupBy(col("event_type"), to_date(date_trunc("day", col("ts"))).as("day"))
      .agg(count("*").as("n"), round(sum(col("value")), 4).as("sum_value"))
      .orderBy("event_type", "day")),

    "lineitem_q1" -> ((s, dir) => s.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        count("*").as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")),

    "urlops_norm" -> ((s, dir) => {
      import s.implicits._
      s.read.parquet(s"$dir/part.parquet")
        .select("p_partkey", "p_name").as[(Long, String)]
        .map { case (k, name) =>
          val slug = name.toLowerCase.replace(' ', '-')
          val raw = s"https://www.$slug.com/p/$k?utm_source=x&ref=y&id=$k"
          (k, graft.urlx.UrlOps.normalizeUrl(raw), graft.urlx.UrlOps.extractDomain(raw),
            graft.urlx.UrlOps.getPath(raw))
        }.toDF("p_partkey", "normalized_url", "domain", "path")
        .orderBy("p_partkey")
    }),

    // S1 fetch gate over a synthesized (statusCode, contentType) pair — the
    // Scala mapping (sources.FetchGate, fetch.ts:38-84) checked against an
    // independent CASE encoding in the DuckDB oracle.
    "fetch_gate" -> ((s, dir) => {
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id")).as[Long]
        .map { id =>
          val status = (id % 10) match {
            case 0 => 404; case 1 => 403; case 2 => 429; case 3 => 500
            case 4 => 301; case _ => 200
          }
          val ct = (id % 3) match {
            case 0 => "text/html; charset=utf-8"
            case 1 => "application/xhtml+xml"
            case _ => "application/pdf"
          }
          (id, status.toLong, ct,
            graft.sources.FetchGate.errorCode(status, ct).getOrElse("OK"))
        }.toDF("doc_id", "status_code", "content_type", "fetch_error")
        .orderBy("doc_id")
    }),

    // L1-L3 LLM enhancement with the deterministic stub provider: summarize +
    // confidence-gated classify + templated ask() whose custom value pins the
    // exact assembled prompt bytes via sha256 — all re-encoded independently
    // in the DuckDB oracle.
    "llm_enhance" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir).select(col("doc_id"), col("text")).as[(Long, String)].map { case (id, text) =>
        val cat = Array("blog", "news", "docs", "articles", "posts", "wiki").apply((id % 6).toInt)
        val url = s"https://site-${id % 50}.example/$cat/post-$id"
        val data = graft.llm.EnhanceInput(url, s"Doc $id", "", text, "")
        val p = new graft.llm.StubLLMProvider()
        val e = graft.llm.Enhancer.enhance(data, p, Seq("summarize", "classify"))
        val a = graft.llm.Enhancer.ask(data, p, "What is {{title}} at {{domain}}?", "q1")
        (id, e.summary.getOrElse(""), e.contentType.getOrElse(""), a.custom("q1"))
      }.toDF("doc_id", "summary", "content_type", "custom_q1")
        .orderBy("doc_id")
    }),

    // L2 extract-with-mini-schema: extractSchema's canonical-JSON output
    // bytes pinned via the stub provider (response = "stub:" + sha256-12 of
    // the EXACT assembled prompt) — the DuckDB oracle re-encodes the prompt
    // assembly (enhancer.ts:171-188 default template, sorted schema fields,
    // 4000-char content cap) and the canonical JSON byte layout.
    "llm_extract" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir).select(col("doc_id"), col("text")).as[(Long, String)].map { case (id, text) =>
        val cat = Array("blog", "news", "docs", "articles", "posts", "wiki").apply((id % 6).toInt)
        val url = s"https://site-${id % 50}.example/$cat/post-$id"
        val data = graft.llm.EnhanceInput(url, s"Doc $id", "", text, "")
        val json = graft.llm.Enhancer.extractSchema(data, new graft.llm.StubLLMProvider(),
          Map("response" -> "string", "notes" -> "string?"))
        (id, json)
      }.toDF("doc_id", "extract_json").orderBy("doc_id")
    }),

    // §2.10 checkpoint/lineage contract as a driver row: a fresh resumable
    // run over a FIXED 600-page corpus, resumed once — counters, manifest
    // sums, and output rows checked against a VALUES oracle (the north
    // rule's "resumable from checkpoint with per-partition lineage+metrics").
    "manifest_counters" -> ((s, dir) => {
      import s.implicits._
      // fixed per-PROCESS path, deleted before AND after (ADVICE r3):
      // repeated bench/verify runs must neither accumulate 600-page output
      // dirs nor resume against a stale checkpoint (which would zero run1);
      // the pid suffix keeps concurrent driver JVMs from deleting each
      // other's in-flight checkpoints
      val out = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_manifest_q_${ProcessHandle.current().pid()}").toString
      def rmTree(p: java.io.File): Unit = {
        if (p.isDirectory) Option(p.listFiles()).foreach(_.foreach(rmTree))
        p.delete(): Unit
      }
      rmTree(new java.io.File(out))
      try {
        val pages = PagesGen.generate(s, 600)
        val r1 = ExtractJob.runResumable(s, pages, out, 8, "run1")
        val r2 = ExtractJob.runResumable(s, pages, out, 8, "run2")
        val data = s.read.parquet(out + "/data")
        val manifest = s.read.parquet(out + "/manifest")
        // one aggregation job per table instead of one job per metric
        // (guide §1.4/§2.4): distinct-url + row counts fuse into a single
        // pass over data, the two manifest metrics into one over manifest —
        // the VALUES produced are identical to the r7 per-metric actions
        val dataRow = data.agg(
          countDistinct(col("url")).as("du"), count(lit(1)).as("n")).first()
        val mRow = manifest.agg(
          sum("n_rows").as("pages"),
          sum(when(col("run_id") === "run1", 1L).otherwise(0L)).as("parts")).first()
        val manifestPages = mRow.getLong(0)
        val manifestParts = mRow.getLong(1)
        // the Seq materializes every metric eagerly, so the files can be
        // deleted in the finally without the returned DataFrame re-reading them
        Seq(
          ("data_distinct_urls", dataRow.getLong(0)),
          ("data_rows", dataRow.getLong(1)),
          ("manifest_pages_sum", manifestPages),
          ("manifest_run1_partitions_min", math.min(manifestParts, 1L)),
          ("run1_empty_content", r1.emptyContent),
          ("run1_pages_parsed", r1.pagesParsed),
          ("run1_parse_failures", r1.parseFailures),
          ("run2_pages_parsed", r2.pagesParsed)
        ).toDF("metric", "value").orderBy("metric")
      } finally rmTree(new java.io.File(out))
    }),

    // rows-only: the full 4-type enhancement over the extraction corpus
    // (tags/entities exercised at scale; exact semantics pinned by LlmSpec)
    "enhance_pages" -> ((s, dir) => {
      import s.implicits._
      extracted(s, dir).map { r =>
        val data = graft.llm.EnhanceInput(r.url, r.title, r.description, r.text_content, r.excerpt)
        val e = graft.llm.Enhancer.enhance(data, new graft.llm.StubLLMProvider(),
          Seq("summarize", "tags", "entities", "classify"))
        (r.url, e.summary.getOrElse(""), e.suggestedTags.getOrElse(Nil).mkString(","),
          e.entities.map(_.people.mkString(",")).getOrElse(""), e.contentType.getOrElse(""))
      }.toDF("url", "summary", "tags", "people", "content_type").orderBy("url")
    }),

    // S2 robots gate end-to-end: urls + per-row robots bodies synthesized
    // deterministically from doc_id; the Scala matcher (sources.Robots,
    // robots.ts:26-167 precedence incl. Allow-before-Disallow, specific-agent
    // override, */$ wildcards) is checked against an independent SQL CASE
    // encoding of the same rules in the DuckDB oracle.
    "robots_gate" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir).select(col("doc_id")).as[Long].map { id =>
        val cat = Array("blog", "news", "docs", "articles", "posts", "wiki").apply((id % 6).toInt)
        val url = s"https://site-${id % 50}.example/$cat/post-$id"
        val robots = (id % 4) match {
          case 0 => ""
          case 1 => "User-agent: *\nDisallow: /docs/\nDisallow: /posts/\nAllow: /posts/post-1"
          case 2 => "User-agent: ScrapexBot\nDisallow: /news/\n\nUser-agent: *\nDisallow: /"
          case _ => "User-agent: *\nDisallow: /art*les/\nDisallow: /wiki/post-11$"
        }
        (id, url, id % 4, graft.sources.Robots.isAllowed(robots, url))
      }.toDF("doc_id", "url", "robots_variant", "allowed")
        .orderBy("doc_id")
    }),

    "embed_knn" -> ((s, dir) => {
      // brute-force exact top-k: the 5 query vectors broadcast against the
      // full corpus scan (the deliberate small-side nested-loop shape), with
      // the native codegen cosine_sim5 scoring the pair stream in place
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
        .select("vec_id", "embedding")
      graft.plans.GraftExtensions.registerNative(s)
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      val scored = emb.crossJoin(broadcast(q))
        .filter(col("query_id") =!= col("vec_id"))
        .select(col("query_id"), col("vec_id"), expr("cosine_sim5(q_emb, embedding)").as("cos"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
      scored.withColumn("rank", row_number().over(w).cast("long")).filter(col("rank") <= 10)
        .select("query_id", "rank", "vec_id", "cos")
        .orderBy("query_id", "rank")
    }),

    // embedding-cosine near-dup (the 5th dedup family, SURVEY §8):
    // brute-force pair scan with a DuckDB oracle (correctness baseline at
    // verification SF). Threshold 0.35 ~= p99.9 of the synthetic corpus's
    // pair-cosine distribution (max 0.51) so the query surfaces real pairs...
    "dedup_embed_pages" -> ((s, dir) => {
      // SF gate: this is the O(n²) brute-force ORACLE for the LSH scale path
      // (dedup_embed_lsh). Cap to the first 4000 vec_ids (covers every
      // verification SF: sf0.1 has 2000) so a larger sfDir cannot detonate
      // the cartesian; the DuckDB oracle applies the identical predicate.
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id") < 4000)
        .select("vec_id", "embedding")
      val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
      val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
      // scoring via the native codegen cosine_sim5 expression: the pair
      // scan stays whole-stage with no per-row encoder round trip, and the
      // rounding is JDK Math.round inside the helper — byte-identical to
      // the scalar path by construction
      graft.plans.GraftExtensions.registerNative(s)
      a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), expr("cosine_sim5(emb_a, emb_b)").as("cos"))
        .filter(col("cos") >= 0.35)
        .orderBy("id_a", "id_b")
    }),

    // ...and the 100 TB scale path: multi-table LSH candidate generation —
    // pairs only form inside a shared random-hyperplane bucket of one of 8
    // independent tables (no O(n²) cartesian; recall 1-(1-p^4)^8 per the
    // hyperplane-agreement probability p), exact cosine verify on candidates
    // only, dropDuplicates across tables. Oracled: the approximate bucketing
    // is still DETERMINISTIC (mix64 hyperplanes, index-order double fold),
    // so DuckDB re-derives it exactly (DerivedOracles.dedupEmbedLsh).
    "dedup_embed_lsh" -> ((s, dir) => embedLshVerified(s, dir).orderBy("id_a", "id_b")),

    // ...and the embedding family's survivor composition, mirroring
    // dedup_survivors_pages: LSH-verified cosine pairs → connected
    // components → one survivor (minimum vec_id) per duplicate cluster.
    // Oracled LAYERED over its pair source's dump (the pairs themselves
    // are independently re-derived by DerivedOracles.dedupEmbedLsh); the
    // CC operator is additionally gated by doc_dedup_cluster and
    // dedup_survivors_fixture.
    "dedup_embed_survivors" -> ((s, dir) => {
      graft.ops.DedupOps.clusterRepresentatives(
          embedLshVerified(s, dir).select("id_a", "id_b"))
        .withColumn("is_survivor", col("id") === col("label"))
        .toDF("vec_id", "cluster_rep", "is_survivor")
        .orderBy("vec_id")
    }),

    "embed_knn_lsh" -> ((s, dir) => {
      import s.implicits._
      // scale path: LSH-bucketed ANN — candidates share a hyperplane bucket,
      // exact cosine re-rank inside the bucket only. Adaptive width keeps
      // ~128 candidates per query at any corpus size (n/2^nBits ≈ 128).
      val raw = s.read.parquet(s"$dir/embeddings.parquet")
        .select("vec_id", "embedding")
      val nBits = graft.ops.Ann.adaptiveNBits(raw.count(), targetBucket = 128)
      val emb = raw.as[(Long, Array[Float])]
        .map { case (id, v) => (id, v, VectorOps.cosineLshBucket(v, nBits)) }
        .toDF("vec_id", "embedding", "bucket")
      val q = emb.filter(col("vec_id") < 5)
        .withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("embedding", "q_emb")
      graft.plans.GraftExtensions.registerNative(s)
      val cands = q.join(emb, Seq("bucket")).filter(col("query_id") =!= col("vec_id"))
      val scored = cands.select(col("query_id"), col("vec_id"),
        expr("cosine_sim5(q_emb, embedding)").as("cos"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
      scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
        .select("query_id", "rank", "vec_id", "cos")
        .orderBy("query_id", "rank")
    }),

    // multi-probe LSH ANN (Lv et al.): queries probe their own bucket plus
    // the 3 least-confident flipped-bit buckets — the recall of extra tables
    // without re-indexing the corpus. Oracled (the probe order is the
    // deterministic ascending (|projection|, bit) sort, replayed exactly);
    // recall ordering vs single-probe is additionally pinned in AnnSpec.
    "embed_knn_multiprobe" -> ((s, dir) => {
      import s.implicits._
      val raw = s.read.parquet(s"$dir/embeddings.parquet")
        .select("vec_id", "embedding")
      // same adaptive width as embed_knn_lsh; multi-probe adds the recall of
      // extra tables without re-indexing, at any corpus size
      val nBits = graft.ops.Ann.adaptiveNBits(raw.count(), targetBucket = 128)
      val emb = raw.as[(Long, Array[Float])]
      val indexed = emb.map { case (id, v) => (id, v, VectorOps.cosineLshBucket(v, nBits)) }
        .toDF("vec_id", "embedding", "bucket")
      val probes = indexed.filter(col("vec_id") < 5)
        .as[(Long, Array[Float], Int)]
        .flatMap { case (id, v, _) =>
          graft.ops.Ann.multiProbeBuckets(v, nBits, 0, 3).map(b => (id, v, b))
        }.toDF("query_id", "q_emb", "bucket")
      // identical probe-scoring shape as IVF — the ONE shared scoring tail
      // (a multi-probe bucket is just a cell)
      graft.ops.AnnIndex.scoreProbes(
        probes.withColumnRenamed("bucket", "cell"),
        indexed.withColumnRenamed("bucket", "cell"), topK = 5)
    }),

    // IVF ANN: deterministic k-means coarse quantizer (k ≈ √n cells trained
    // on a ~64-per-cell bounded sample, centroids broadcast), corpus assigned
    // to cells once, queries scan only their 4 nearest cells. The scale path
    // when buckets must adapt to the data distribution (LSH hyperplanes are
    // data-blind).
    "embed_knn_ivf" -> ((s, dir) => {
      import s.implicits._
      val raw = s.read.parquet(s"$dir/embeddings.parquet")
        .select("vec_id", "embedding")
      val k = graft.ops.Ann.adaptiveIvfK(raw.count())
      val sampleN = graft.ops.Ann.ivfSampleSize(k)
      val emb = raw.as[(Long, Array[Float])]
      // sample = the sampleN LOWEST ids (TakeOrdered, same as
      // AnnIndex.build): `filter(_._1 < sampleN)` is only equivalent for
      // dense 0-based vec_ids — sparse/offset ids would train different
      // centroids here vs the table path and the shared oracle
      val sample = emb.toDF("vec_id", "embedding").orderBy("vec_id").limit(sampleN)
        .as[(Long, Array[Float])].collect().sortBy(_._1).map(_._2)
      val centroids = graft.ops.Ann.trainCentroids(sample, k)
      val cB = s.sparkContext.broadcast(centroids)
      val indexed = emb.map { case (id, v) => (id, v, graft.ops.Ann.nearestCentroid(v, cB.value)) }
        .toDF("vec_id", "embedding", "cell")
      val probes = indexed.filter(col("vec_id") < 5)
        .as[(Long, Array[Float], Int)]
        .flatMap { case (id, v, _) =>
          graft.ops.Ann.probeCells(v, cB.value, 4).map(c => (id, v, c))
        }.toDF("query_id", "q_emb", "cell")
      graft.ops.AnnIndex.scoreProbes(probes, indexed, topK = 5)
    }),

    // Build-once/query-many ANN: same IVF algorithm, but the assignments
    // persist as a table BUCKETED by cell — later query jobs join on cell
    // with no exchange over the indexed side (the 100 TB serving shape;
    // byte-identity to the in-memory path pinned in AnnIndexSpec).
    "embed_knn_ivf_table" -> ((s, dir) => {
      import s.implicits._
      val raw = s.read.parquet(s"$dir/embeddings.parquet")
        .select("vec_id", "embedding").as[(Long, Array[Float])]
      val k = graft.ops.Ann.adaptiveIvfK(raw.count())
      // index name keyed by sfDir (like the other shared relations): a
      // second dir must not clobber the table behind an uncollected
      // DataFrame built for the first
      val tbl = "graft_ivf_index_" + dir.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+", "")
      graft.ops.AnnIndex.build(raw, tbl, k, graft.ops.Ann.ivfSampleSize(k))
      graft.ops.AnnIndex.query(s, tbl, raw.filter(_._1 < 5), nProbe = 4, topK = 5)
    }),

    // ANN recall as a DRIVER-VISIBLE gate (VERDICT r3 #5): recall@10 of each
    // approximate surface (single-probe LSH, multi-probe LSH, IVF) against
    // the exact brute-force top-10 computed inside the same job, reduced to
    // a pinned-floor boolean per variant.
    //
    // The driver's embeddings table is near-orthogonal noise (max pair
    // cosine ≈ 0.4), so the exact top-10 of a RAW query is itself noise —
    // no bucketing scheme can (or should) rank noise. ANN's contract is
    // recall of CLOSE neighbors, so the query plants 10 deterministic true
    // neighbors per query vector (cosine ≈ 0.9, negative vec_ids — same
    // planted-id convention as embed_pipeline) into the searched corpus;
    // the exact top-10 then IS the planted neighborhood and recall measures
    // exactly what the bucketing must preserve. Floors sit well below the
    // deterministic measured values at both verification SFs; the DRIVER row
    // carries only the booleans (raw recalls are SF-dependent constants) —
    // the raw values go into the bench JSON instead (VERDICT r4 #6).
    "ann_recall" -> ((s, dir) => {
      import s.implicits._
      val recalls = annRecalls(s, dir)
      AnnRecallFloors.map { case (v, f) => (v, f, recalls(v) >= f) }
        .toDF("variant", "recall_floor", "meets_floor")
        .orderBy("variant")
    }),

    "embed_agg_label" -> ((s, dir) => s.read.parquet(s"$dir/embeddings.parquet")
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .withColumn("dim", col("dim").cast("long"))
      .groupBy("label", "dim")
      .agg(round(avg(col("v").cast("double")), 5).as("avg_v"))
      .orderBy("label", "dim")),

    // Same aggregate via the typed VectorAvgAggregator (graft.plans): the
    // shuffle carries ONE 64-dim partial buffer per (label, map-partition)
    // instead of 64 exploded rows per input vector — the scale path for E5.
    // Result (one row per label) is exploded only for oracle comparison.
    "embed_agg_vec" -> ((s, dir) => {
      import s.implicits._
      s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("label").cast("int"), col("embedding").cast("array<float>"))
        .as[(Int, Array[Float])]
        .groupByKey(_._1).mapValues(_._2)
        .agg(graft.plans.VectorAvgAggregator.toColumn.name("avg_vec"))
        .toDF("label", "avg_vec")
        .select(col("label"), posexplode(col("avg_vec")).as(Seq("dim", "v")))
        .select(col("label"), col("dim").cast("long").as("dim"),
          round(col("v").cast("double"), 5).as("avg_v"))
        .orderBy("label", "dim")
    })
  )

  /** DuckDB-dialect equivalents for the oracle-checkable queries. Extraction
    * queries are intentionally omitted (non-SQL-expressible → rows-only). */
  // PII regexes (RE2-compatible subset, identical semantics in Java regex)
  private val ccRe = """\b(?:4[0-9]{12}(?:[0-9]{3})?|5[1-5][0-9]{14}|3[47][0-9]{13}|6(?:011|5[0-9]{2})[0-9]{12}|(?:[0-9]{4}[-\s]){3}[0-9]{4}|[0-9]{13,19})\b"""
  private val emailRe = """\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b"""
  private val phoneRe = """(?:\+?1[-.\s]?)?\(?[0-9]{3}\)?[-.\s]?[0-9]{3}[-.\s]?[0-9]{4}\b"""
  private val ssnRe = """\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"""
  private val ipRe = """\b(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\b"""

  // Shared CTE prefix for the E8 embed_pipeline oracles: planted skip rows,
  // the validation gate (input.ts:169-199 messages), the 5-regex redaction
  // chain, the pii flag (counts on the ORIGINAL text, reference quirk), and
  // the chunking arithmetic (`c`): a doc of L redacted chars is 1 chunk when
  // ceil(L/4) <= 500 tokens (L <= 2000), else chunks of 2000 chars at
  // stride 1800 (size − overlap, in chars) → n_chunks = 1 + ceil((L−2000)
  // / 1800), 500 tokens per full chunk plus ceil(tail/4) for the last.
  //
  // SF-validity bound (ADVICE r2, extended r4 per VERDICT #9): the formula
  // matches chunkText exactly for docs that are whitespace-collapsed-equal
  // to their raw form AND — when multi-chunk — free of sentence-boundary /
  // word-boundary break points in the ±20% search window (no '.!?' and no
  // spaces past the head). The driver's documents satisfy the first bound
  // at every SF (max ~400 chars, single chunk); the planted -4 doc is
  // constructed break-point-free, so corpus growth past 2000 chars now
  // FAILS LOUDLY against this formula instead of silently diverging.
  private def embedPipelineCte: String = {
    val wc = """len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> len(x) > 1))"""
    val red = s"regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(text, '$ccRe', '[REDACTED]', 'g'), '$emailRe', '[REDACTED]', 'g'), '$phoneRe', '[REDACTED]', 'g'), '$ssnRe', '[REDACTED]', 'g'), '$ipRe', '[REDACTED]', 'g')"
    val piiCount = s"length(regexp_extract_all(text, '$ccRe')) + length(regexp_extract_all(text, '$emailRe')) + length(regexp_extract_all(text, '$phoneRe')) + length(regexp_extract_all(text, '$ssnRe')) + length(regexp_extract_all(text, '$ipRe'))"
    "WITH all_docs AS (SELECT doc_id, text FROM documents " +
    "UNION ALL SELECT -4, 'ab cd ef ' || repeat('x', 5000) " +
    "UNION ALL SELECT -3, '' UNION ALL SELECT -2, 'tiny' UNION ALL SELECT -1, 'aaaa b c d e f'), " +
    "v AS (SELECT doc_id, text, CASE WHEN length(text) = 0 THEN 'No input text available' " +
    s"WHEN length(text) < 10 THEN 'Input too short (' || length(text) || ' < 10 characters)' " +
    s"WHEN $wc < 3 THEN 'Input has too few words (' || $wc || ' < 3)' " +
    "ELSE '' END AS reason FROM all_docs), " +
    s"r AS (SELECT doc_id, reason, $red AS rtext, ($piiCount) > 0 AS pii FROM v), " +
    "c0 AS (SELECT doc_id, reason, rtext, pii, length(rtext) AS len, " +
    "CASE WHEN length(rtext) <= 2000 THEN 1 " +
    "ELSE 1 + CAST(ceil((length(rtext) - 2000) / 1800.0) AS INT) END AS n_chunks FROM r), " +
    "c AS (SELECT *, " +
    "CAST(500 * (n_chunks - 1) + ceil((len - 1800 * (n_chunks - 1)) / 4.0) AS BIGINT) AS tokens " +
    "FROM c0) "
  }

  def oracleSql: Map[String, String] = Map(
    // fixture-anchored VALUES oracles — expected cells from the reference's
    // own test assertions (see FixtureQueries scaladoc for file:line)
    "extract_fixture_meta" -> FixtureQueries.metaOracle,
    "extract_fixture_checks" -> FixtureQueries.checksOracle,
    "normalize_values" -> FixtureQueries.normalizeOracle,
    "feed_fixture_items" -> FeedFixtureQueries.feedOracle,
    "markdown_fixture" -> FeedFixtureQueries.markdownOracle,
    "github_fixture" -> FeedFixtureQueries.githubOracle,
    "paginate_fixture" -> FeedFixtureQueries.paginateOracle,
    "media_fixture" -> graft.multimodal.MediaFixtureQueries.mediaOracle,
    "chunk_fixture" -> FixtureQueries.chunkOracle,
    "feed_utils_fixture" -> FeedFixtureQueries.feedUtilsOracle,
    "blocks_fixture" -> FixtureQueries.blocksOracle,
    "meta_fixture" -> ExtractorFixtureQueries.metaOracle,
    "langid_fixture" -> TextFixtureQueries.langidOracle,
    "quality_fixture" -> TextFixtureQueries.qualityOracle,
    "fingerprint_fixture" -> TextFixtureQueries.fingerprintOracle,
    "repetition_fixture" -> RepetitionFixture.fixtureOracle,
    "para_dedup_fixture" -> ParaDedupFixture.fixtureOracle,
    "curation_fixture" -> CurateFixture.fixtureOracle,
    "incdedup_fixture" -> IncDedupFixture.fixtureOracle,

    // Same planted mutation rules as the Spark side — the oracle
    // reproduces the snapshot construction AND the diff/window semantics,
    // so the check is cross-engine, not transcribed.
    "doc_crawl_delta" ->
      ("WITH prev AS (SELECT CAST(doc_id AS VARCHAR) AS url, substr(sha256(text), 1, 32) AS prev_hash FROM documents), " +
       "curr AS (SELECT CAST(doc_id AS VARCHAR) AS url, " +
       "CASE WHEN doc_id % 7 = 0 THEN substr(sha256(text || 'v2'), 1, 32) ELSE substr(sha256(text), 1, 32) END AS curr_hash " +
       "FROM documents WHERE doc_id % 13 <> 0 " +
       "UNION ALL SELECT CAST(doc_id + 1000000 AS VARCHAR) AS url, substr(sha256(text || 'new'), 1, 32) AS curr_hash " +
       "FROM documents WHERE doc_id % 11 = 0) " +
       "SELECT url, prev_hash, curr_hash, " +
       "CASE WHEN prev_hash IS NULL THEN 'added' WHEN curr_hash IS NULL THEN 'removed' " +
       "WHEN prev_hash = curr_hash THEN 'unchanged' ELSE 'changed' END AS status " +
       "FROM prev FULL OUTER JOIN curr USING (url) ORDER BY url"),

    "doc_fetch_history" ->
      ("WITH h AS (SELECT CAST(doc_id AS VARCHAR) AS url, 1 AS fetch_seq, substr(sha256(text), 1, 32) AS hash FROM documents " +
       "UNION ALL SELECT CAST(doc_id AS VARCHAR) AS url, 2 AS fetch_seq, " +
       "CASE WHEN doc_id % 2 = 0 THEN substr(sha256(text), 1, 32) ELSE substr(sha256(text || 'v2'), 1, 32) END AS hash FROM documents " +
       "UNION ALL SELECT CAST(doc_id AS VARCHAR) AS url, 3 AS fetch_seq, " +
       "CASE WHEN doc_id % 3 = 0 THEN substr(sha256(text || 'v3'), 1, 32) " +
       "WHEN doc_id % 2 = 0 THEN substr(sha256(text), 1, 32) " +
       "ELSE substr(sha256(text || 'v2'), 1, 32) END AS hash FROM documents), " +
       "lagged AS (SELECT url, CAST(fetch_seq AS BIGINT) AS fetch_seq, hash, " +
       "lag(hash) OVER (PARTITION BY url ORDER BY fetch_seq) AS prev_hash FROM h) " +
       "SELECT url, fetch_seq, hash, prev_hash, " +
       "CASE WHEN prev_hash IS NULL THEN 'new' WHEN prev_hash = hash THEN 'revisit' ELSE 'changed' END AS status, " +
       "(CASE WHEN prev_hash IS NULL THEN 'new' WHEN prev_hash = hash THEN 'revisit' ELSE 'changed' END) <> 'revisit' AS stored " +
       "FROM lagged ORDER BY url, fetch_seq"),

    "doc_decontaminate" ->
      ("WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents), " +
       "g AS (SELECT DISTINCT doc_id, p[1] || ' ' || p[2] || ' ' || p[3] || ' ' || p[4] || ' ' || p[5] AS gram " +
       "FROM (SELECT doc_id, unnest(list_zip(ws[1:len(ws)-4], ws[2:len(ws)-3], ws[3:len(ws)-2], ws[4:len(ws)-1], ws[5:])) AS p " +
       "FROM w WHERE len(ws) >= 5)), " +
       "bg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 17 = 0), " +
       "sh AS (SELECT g.doc_id, count(DISTINCT g.gram) AS shared_grams FROM g JOIN bg USING (gram) " +
       "WHERE g.doc_id % 17 <> 0 GROUP BY 1) " +
       "SELECT d.doc_id, CAST(coalesce(sh.shared_grams, 0) AS BIGINT) AS shared_grams, " +
       "coalesce(sh.shared_grams, 0) > 0 AS contaminated " +
       "FROM documents d LEFT JOIN sh USING (doc_id) WHERE d.doc_id % 17 <> 0 ORDER BY doc_id"),

    "training_run" ->
      // the FULL composed pipeline replayed in DuckDB: exact dedup with the
      // lexicographic-min keeper (ledger ids are strings), 5-gram
      // decontamination vs the doc_id%17 benchmark, per-lang hex-threshold
      // sampling (en 0.5 → 80000000, default 0.25 → 40000000), the
      // doc_shuffle key chain (seed 2026), pack windows over (shard, skey)
      ("WITH h AS (SELECT doc_id, text, lang, substr(sha256(trim(text)), 1, 32) AS hsh FROM documents), " +
       "k AS (SELECT hsh, min(CAST(doc_id AS VARCHAR)) AS keeper FROM h GROUP BY hsh), " +
       "led1 AS (SELECT h.doc_id, h.text, h.lang, k.keeper, " +
       "CAST(h.doc_id AS VARCHAR) = k.keeper AS kept1 FROM h JOIN k USING (hsh)), " +
       "w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents), " +
       "g AS (SELECT DISTINCT doc_id, p[1] || ' ' || p[2] || ' ' || p[3] || ' ' || p[4] || ' ' || p[5] AS gram " +
       "FROM (SELECT doc_id, unnest(list_zip(ws[1:len(ws)-4], ws[2:len(ws)-3], ws[3:len(ws)-2], ws[4:len(ws)-1], ws[5:])) AS p " +
       "FROM w WHERE len(ws) >= 5)), " +
       "bg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 17 = 0), " +
       "cont AS (SELECT DISTINCT g.doc_id FROM g JOIN bg USING (gram) " +
       "JOIN led1 ON led1.doc_id = g.doc_id AND led1.kept1), " +
       "disp AS (SELECT led1.doc_id, led1.keeper, led1.kept1, " +
       "cont.doc_id IS NOT NULL AS contaminated, " +
       "substr(sha256(led1.text), 1, 8) < CASE led1.lang WHEN 'en' THEN '80000000' ELSE '40000000' END AS in_sample " +
       "FROM led1 LEFT JOIN cont ON led1.doc_id = cont.doc_id), " +
       "fin AS (SELECT doc_id, " +
       "(kept1 AND NOT contaminated AND in_sample) AS kept, " +
       "CASE WHEN NOT kept1 THEN 'exact_dup' WHEN contaminated THEN 'contaminated' " +
       "WHEN NOT in_sample THEN 'mix_sampled_out' ELSE '' END AS stage, " +
       "CASE WHEN NOT kept1 THEN keeper ELSE '' END AS reason FROM disp), " +
       "t AS (SELECT d.doc_id AS id, " +
       "((d.doc_id + 2026) % 2147483647 + 2147483647) % 2147483647 AS x0, " +
       "CASE WHEN trim(d.text) = '' THEN 0 ELSE len(regexp_split_to_array(trim(d.text), '\\s+')) END AS tokens " +
       "FROM documents d JOIN fin ON fin.doc_id = d.doc_id AND fin.kept), " +
       "a AS (SELECT id, tokens, (48271 * x0) % 2147483647 AS x1 FROM t), " +
       "b AS (SELECT id, tokens, xor(x1, x1 >> 15) AS x2 FROM a), " +
       "c1 AS (SELECT id, tokens, (69621 * x2) % 2147483647 AS x3 FROM b), " +
       "kx AS (SELECT id, tokens, xor(x3, x3 >> 13) AS skey FROM c1), " +
       "shp AS (SELECT id, tokens, skey, skey % 4 AS shard FROM kx), " +
       "c AS (SELECT id, skey, shard, tokens, CAST(coalesce(sum(tokens) OVER " +
       "(PARTITION BY shard ORDER BY skey, id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before FROM shp), " +
       "p AS (SELECT id, shard, tokens, cum_before, " +
       "cum_before // 512 AS first_chunk, " +
       "CAST(CASE WHEN tokens > 0 THEN (cum_before + tokens - 1) // 512 " +
       "ELSE cum_before // 512 END AS BIGINT) AS last_chunk, " +
       "(CASE WHEN tokens > 0 THEN (cum_before + tokens - 1) // 512 " +
       "ELSE cum_before // 512 END) > cum_before // 512 AS straddles FROM c) " +
       "SELECT f.doc_id, f.kept, f.stage, f.reason, p.shard, p.tokens, " +
       "p.cum_before, p.first_chunk, p.last_chunk, p.straddles " +
       "FROM fin f LEFT JOIN p ON p.id = f.doc_id ORDER BY f.doc_id"),

    "doc_pack" ->
      // ((id % 4) + 4) % 4 matches Spark's pmod (always non-negative) even
      // for negative ids; `//` is DuckDB integer division — exact like
      // Spark's DIV, where floor(x/512.0) would round above 2^53
      ("WITH t AS (SELECT doc_id AS id, CAST(ceil(length(text) / 4.0) AS BIGINT) AS tokens, " +
       "((doc_id % 4) + 4) % 4 AS shard FROM documents), " +
       "c AS (SELECT id, shard, tokens, CAST(coalesce(sum(tokens) OVER " +
       "(PARTITION BY shard ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before FROM t) " +
       "SELECT id, shard, tokens, cum_before, " +
       "cum_before // 512 AS first_chunk, " +
       "CAST(CASE WHEN tokens > 0 THEN (cum_before + tokens - 1) // 512 " +
       "ELSE cum_before // 512 END AS BIGINT) AS last_chunk, " +
       "(CASE WHEN tokens > 0 THEN (cum_before + tokens - 1) // 512 " +
       "ELSE cum_before // 512 END) > cum_before // 512 AS straddles " +
       "FROM c ORDER BY id"),

    "doc_shuffle" ->
      // the identical MINSTD-mod-(2^31-1) + xor-shift chain, seed 2026,
      // 8 shards; every intermediate < 2^31 so 64-bit products are exact
      ("WITH t AS (SELECT doc_id AS id, " +
       "((doc_id + 2026) % 2147483647 + 2147483647) % 2147483647 AS x0 FROM documents), " +
       "a AS (SELECT id, (48271 * x0) % 2147483647 AS x1 FROM t), " +
       "b AS (SELECT id, xor(x1, x1 >> 15) AS x2 FROM a), " +
       "c AS (SELECT id, (69621 * x2) % 2147483647 AS x3 FROM b), " +
       "k AS (SELECT id, xor(x3, x3 >> 13) AS skey FROM c) " +
       "SELECT id, skey, skey % 8 AS shard, " +
       "CAST(row_number() OVER (PARTITION BY skey % 8 ORDER BY skey, id) AS INT) AS pos " +
       "FROM k ORDER BY id"),

    "doc_corpus_stats" ->
      ("SELECT lang, source, count(*) AS n_docs, CAST(sum(length(text)) AS BIGINT) AS sum_chars, " +
       "count(DISTINCT substr(sha256(text), 1, 32)) AS n_distinct_texts, " +
       "min(doc_id) AS min_id, max(doc_id) AS max_id " +
       "FROM documents GROUP BY lang, source ORDER BY lang, source"),

    "doc_sample" ->
      ("SELECT doc_id, lang, substr(sha256(text), 1, 1) AS nib FROM documents " +
       "WHERE (lang = 'en' AND substr(sha256(text), 1, 1) IN ('0', '1', '2', '3')) " +
       "OR (lang <> 'en' AND substr(sha256(text), 1, 1) = '0') ORDER BY doc_id"),

    "doc_mix_sample" ->
      // thresholds = lowercase 8-hex of floor(rate * 2^32): en 0.25 →
      // 40000000, zh 0.75 → c0000000, default 0.125 → 20000000
      ("SELECT doc_id, lang, substr(sha256(text), 1, 8) AS h8 FROM documents " +
       "WHERE substr(sha256(text), 1, 8) < " +
       "CASE lang WHEN 'en' THEN '40000000' WHEN 'zh' THEN 'c0000000' ELSE '20000000' END " +
       "ORDER BY doc_id"),

    // Word-level repetition signals, reproduced exactly in DuckDB: words =
    // regexp-split on \s+ of trimmed text, sliced to the SAME
    // MaxProfileWords prefix the Scala profiler bounds itself to (DuckDB
    // slices clamp at list end, so the slice is a no-op below the cap);
    // adjacent bigrams/trigrams via equal-length list_zip slices (no zip
    // padding); stop words = the 8 Gopher stop words; symbols counted
    // with non-overlapping replace.
    "doc_repetition" ->
      ("WITH w AS (SELECT doc_id, (regexp_split_to_array(trim(text), '\\s+'))[1:200000] AS ws, " +
       "len(regexp_split_to_array(trim(text), '\\s+')) > 200000 AS truncated, text FROM documents), " +
       "wc AS (SELECT doc_id, unnest(ws) AS word FROM w), " +
       "wa AS (SELECT doc_id, count(*) AS n_words, count(DISTINCT word) AS n_distinct_words, " +
       "sum(length(word)) AS word_chars, " +
       "sum(CASE WHEN regexp_matches(word, '[A-Za-z]') THEN 1 ELSE 0 END) AS alpha_words, " +
       "count(DISTINCT CASE WHEN word IN ('the','be','to','of','and','that','have','with') THEN word END) AS stop_hits " +
       "FROM wc WHERE word <> '' GROUP BY doc_id), " +
       "tw AS (SELECT doc_id, max(c) AS top_word FROM (SELECT doc_id, word, count(*) AS c FROM wc WHERE word <> '' GROUP BY 1, 2) GROUP BY 1), " +
       "b2 AS (SELECT doc_id, max(c) AS top2_count FROM (SELECT doc_id, p[1] AS w1, p[2] AS w2, count(*) AS c FROM " +
       "(SELECT doc_id, unnest(list_zip(ws[1:len(ws)-1], ws[2:])) AS p FROM w) GROUP BY 1, 2, 3) GROUP BY 1), " +
       "b3 AS (SELECT doc_id, max(c) AS top3_count FROM (SELECT doc_id, p[1] AS w1, p[2] AS w2, p[3] AS w3, count(*) AS c FROM " +
       "(SELECT doc_id, unnest(list_zip(ws[1:len(ws)-2], ws[2:len(ws)-1], ws[3:])) AS p FROM w) GROUP BY 1, 2, 3, 4) GROUP BY 1), " +
       "sym AS (SELECT doc_id, length(text) - length(replace(text, '#', '')) AS n_hash, " +
       "(length(text) - length(replace(text, '...', ''))) // 3 AS n_ellipsis FROM documents) " +
       "SELECT d.doc_id, CAST(coalesce(wa.n_words, 0) AS BIGINT) AS n_words, " +
       "CAST(coalesce(wa.n_distinct_words, 0) AS BIGINT) AS n_distinct_words, " +
       "CAST(coalesce(wa.word_chars, 0) AS BIGINT) AS word_chars, " +
       "CAST(coalesce(tw.top_word, 0) AS BIGINT) AS top_word, " +
       "CAST(coalesce(b2.top2_count, 0) AS BIGINT) AS top2_count, " +
       "CAST(coalesce(b3.top3_count, 0) AS BIGINT) AS top3_count, " +
       "CAST(coalesce(wa.alpha_words, 0) AS BIGINT) AS alpha_words, " +
       "CAST(coalesce(wa.stop_hits, 0) AS BIGINT) AS stop_hits, " +
       "CAST(sym.n_hash AS BIGINT) AS n_hash, CAST(sym.n_ellipsis AS BIGINT) AS n_ellipsis, " +
       "w.truncated " +
       "FROM documents d LEFT JOIN wa USING (doc_id) LEFT JOIN tw USING (doc_id) " +
       "LEFT JOIN b2 USING (doc_id) LEFT JOIN b3 USING (doc_id) JOIN sym USING (doc_id) " +
       "JOIN w USING (doc_id) " +
       "ORDER BY doc_id"),
    "links_fixture" -> ExtractorFixtureQueries.linksOracle,
    "jsonld_fixture" -> ExtractorFixtureQueries.jsonldOracle,
    "http_presets_fixture" -> graft.embed.PresetFixtureQueries.httpPresetsOracle,
    "errors_fixture" -> FixtureQueries.errorsOracle,
    "input_fixture" -> FixtureQueries.inputOracle,
    "safety_fixture" -> FixtureQueries.safetyOracle,
    "vector_fixture" -> FixtureQueries.vectorOracle,

    "embed_pipeline" -> {
      val fp = graft.embed.EmbedCache.fingerprint(
        graft.embed.EmbedPipeline.cacheConfigFor(graft.embed.EmbedConfig(providerKey = "stub")))
        .replace("'", "''")
      embedPipelineCte +
      "SELECT doc_id, CASE WHEN reason = '' THEN 'success' ELSE 'skipped' END AS status, reason, " +
      s"CASE WHEN reason = '' THEN sha256(concat('$fp', chr(0), rtext)) ELSE '' END AS cache_key, " +
      "CASE WHEN reason = '' THEN substr(sha256(rtext), 1, 16) ELSE '' END AS checksum, " +
      "CAST(CASE WHEN reason = '' THEN n_chunks ELSE 0 END AS BIGINT) AS n_chunks, " +
      "CAST(CASE WHEN reason = '' THEN tokens ELSE 0 END AS BIGINT) AS tokens, " +
      "CASE WHEN reason = '' THEN pii ELSE false END AS pii_redacted, " +
      "false AS cached FROM c ORDER BY doc_id"
    },

    "embed_pipeline_counters" ->
      (embedPipelineCte +
       "SELECT CAST(0 AS BIGINT) AS cache_hits, " +
       "CAST(sum(CASE WHEN reason = '' THEN 1 ELSE 0 END) AS BIGINT) AS cache_misses, " +
       "CAST(sum(CASE WHEN reason <> '' THEN 1 ELSE 0 END) AS BIGINT) AS skipped FROM r"),

    // stub provider in SQL: chunk vector dim d = byte d of sha256(chunk
    // text), scaled /255, truncated through REAL to mirror the Float
    // pipeline value; the document vector is the chunk average (double
    // accumulate → REAL, mirroring VectorOps.aggregate). Chunk substrings
    // come from the same stride-1800 arithmetic as `c` (exact for the
    // break-point-free multi-chunk planted doc; single-chunk docs reduce to
    // the whole rtext). The ci < 16 series bound caps supported docs at 16
    // chunks (≈29k chars) — raise it if the corpus ever grows past that.
    "embed_pipeline_vec" ->
      (embedPipelineCte +
       ", ch AS (SELECT doc_id, ci, substr(rtext, 1800 * ci + 1, " +
       "CASE WHEN ci < n_chunks - 1 THEN 2000 ELSE len - 1800 * ci END) AS chunk " +
       "FROM c CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS ci) t " +
       "WHERE reason = '' AND ci < n_chunks) " +
       "SELECT doc_id, CAST(d AS BIGINT) AS dim, " +
       "round(CAST(CAST(avg(CAST(CAST(('0x' || substr(sha256(chunk), 2 * d + 1, 2))::INT / 255.0 AS REAL) AS DOUBLE)) AS REAL) AS DOUBLE), 5) AS v " +
       "FROM ch CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS d) t2 " +
       "GROUP BY doc_id, d ORDER BY doc_id, dim"),

    "embed_pipeline_cachehit" -> {
      val fp = graft.embed.EmbedCache.fingerprint(
        graft.embed.EmbedPipeline.cacheConfigFor(graft.embed.EmbedConfig(providerKey = "stub")))
        .replace("'", "''")
      embedPipelineCte +
      "SELECT doc_id, CASE WHEN reason = '' THEN 'success' ELSE 'skipped' END AS status, " +
      s"CASE WHEN reason = '' THEN sha256(concat('$fp', chr(0), rtext)) ELSE '' END AS cache_key, " +
      "CAST(CASE WHEN reason = '' THEN n_chunks ELSE 0 END AS BIGINT) AS n_chunks, " +
      "CAST(CASE WHEN reason = '' THEN tokens ELSE 0 END AS BIGINT) AS tokens, " +
      "CASE WHEN reason = '' THEN true ELSE false END AS cached FROM c ORDER BY doc_id"
    },

    "pii_redact" ->
      ("SELECT doc_id, " +
       s"regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(text, '$ccRe', '[REDACTED]', 'g'), '$emailRe', '[REDACTED]', 'g'), '$phoneRe', '[REDACTED]', 'g'), '$ssnRe', '[REDACTED]', 'g'), '$ipRe', '[REDACTED]', 'g') AS redacted_text, " +
       s"CAST(length(regexp_extract_all(text, '$ccRe')) + length(regexp_extract_all(text, '$emailRe')) + length(regexp_extract_all(text, '$phoneRe')) + length(regexp_extract_all(text, '$ssnRe')) + length(regexp_extract_all(text, '$ipRe')) AS BIGINT) AS n_redactions " +
       "FROM documents ORDER BY doc_id"),

    "doc_hash" ->
      "SELECT doc_id, substr(sha256(text), 1, 32) AS hash32 FROM documents ORDER BY doc_id",

    "cache_retention_fixture" ->
      graft.embed.CacheRetentionFixture.fixtureOracle,

    "embed_cache_key" -> {
      val fp = graft.embed.EmbedCache.fingerprint(graft.embed.EmbedCache.CacheConfig(providerKey = "stub"))
        .replace("'", "''")
      s"SELECT doc_id, sha256(concat('$fp', chr(0), text)) AS cache_key, " +
      "substr(sha256(text), 1, 16) AS checksum FROM documents ORDER BY doc_id"
    },

    "doc_tokens_bpe" ->
      graft.pipeline.BpeOracle.countSql("documents", "doc_id", "text", "bpe_tokens"),

    // recursive-CTE replay of the chunker (pipeline/DerivedOracles.chunkDocs)
    "chunk_docs" -> graft.pipeline.DerivedOracles.chunkDocs,

    "bpe_fixture" ->
      graft.pipeline.BpeOracle.countSql(
        graft.pipeline.BpeOracle.fixtureValuesClause, "fid", "txt", "bpe_tokens"),

    "doc_tokens" ->
      ("SELECT doc_id, " +
       "CASE WHEN length(trim(text)) = 0 THEN 0 ELSE length(regexp_split_to_array(trim(text), '\\s+')) END AS n_words, " +
       "length(text) AS n_chars, " +
       "CAST(ceil(length(text) / 4.0) AS BIGINT) AS token_estimate " +
       "FROM documents ORDER BY doc_id"),

    "doc_dedup_exact" ->
      ("SELECT substr(sha256(text), 1, 32) AS hash32, count(*) AS n, min(doc_id) AS keeper " +
       "FROM documents GROUP BY 1 ORDER BY hash32"),

    "doc_dedup_cluster" ->
      ("SELECT CAST(doc_id AS BIGINT) AS id, CAST(doc_id - doc_id % 8 AS BIGINT) AS label " +
       "FROM documents ORDER BY id"),

    "doc_quality" ->
      ("SELECT doc_id, length(text) AS n_chars, " +
       "length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS n_punct, " +
       "length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits, " +
       "CASE WHEN length(trim(text)) = 0 THEN 0 ELSE length(regexp_split_to_array(trim(text), '\\s+')) END AS n_words " +
       "FROM documents ORDER BY doc_id"),

    "doc_langid" ->
      ("SELECT doc_id, lang, " +
       "CAST((length(lower(text)) - length(replace(lower(text), ' the ', ''))) / 5 AS BIGINT) AS en_hits, " +
       "CAST((length(lower(text)) - length(replace(lower(text), ' und ', ''))) / 5 AS BIGINT) AS de_hits, " +
       "CAST((length(lower(text)) - length(replace(lower(text), ' les ', ''))) / 5 AS BIGINT) AS fr_hits " +
       "FROM documents ORDER BY doc_id"),

    "events_window" ->
      ("SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS n, " +
       "round(sum(value), 4) AS sum_value FROM events GROUP BY 1, 2 ORDER BY event_type, day"),

    "lineitem_q1" ->
      ("SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, " +
       "round(sum(l_extendedprice), 2) AS sum_base_price, " +
       "round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, " +
       "count(*) AS count_order FROM lineitem " +
       "WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' " +
       "GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus"),

    "urlops_norm" ->
      ("SELECT p_partkey, " +
       "concat('https://www.', lower(replace(p_name, ' ', '-')), '.com/p/', p_partkey, '?id=', p_partkey) AS normalized_url, " +
       "concat(lower(replace(p_name, ' ', '-')), '.com') AS domain, " +
       "concat('/p/', p_partkey) AS path " +
       "FROM part ORDER BY p_partkey"),

    "fetch_gate" ->
      ("SELECT doc_id, " +
       "CAST(CASE doc_id % 10 WHEN 0 THEN 404 WHEN 1 THEN 403 WHEN 2 THEN 429 WHEN 3 THEN 500 WHEN 4 THEN 301 ELSE 200 END AS BIGINT) AS status_code, " +
       "CASE doc_id % 3 WHEN 0 THEN 'text/html; charset=utf-8' WHEN 1 THEN 'application/xhtml+xml' ELSE 'application/pdf' END AS content_type, " +
       "CASE " +
       "WHEN doc_id % 10 = 0 THEN 'NOT_FOUND' " +
       "WHEN doc_id % 10 IN (1, 2) THEN 'BLOCKED' " +
       "WHEN doc_id % 10 IN (3, 4) THEN 'FETCH_FAILED' " +
       "WHEN doc_id % 3 = 2 THEN 'PARSE_ERROR' " +
       "ELSE 'OK' END AS fetch_error " +
       "FROM documents ORDER BY doc_id"),

    "dedup_embed_pages" ->
      ("WITH capped AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 4000), " +
       "pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
       "round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 5) AS cos " +
       "FROM capped a JOIN capped b ON a.vec_id < b.vec_id) " +
       "SELECT id_a, id_b, cos FROM pairs WHERE cos >= 0.35 ORDER BY id_a, id_b"),

    // The hyperplane-LSH family replayed from the embeddings table: the
    // mix64-derived hyperplane components and the index-order projection
    // fold are exact in IEEE double, so the bucketing — not just the
    // cosine verify — is re-derived cross-engine (DerivedOracles scaladoc).
    "dedup_embed_lsh" -> graft.pipeline.DerivedOracles.dedupEmbedLsh,
    "embed_knn_lsh" -> graft.pipeline.DerivedOracles.embedKnnLsh,
    "embed_knn_multiprobe" -> graft.pipeline.DerivedOracles.embedKnnMultiprobe,
    // one SQL for both IVF keys: AnnIndexSpec pins the table path
    // byte-identical to the in-memory path, and the oracle re-trains the
    // same deterministic k-means from scratch
    "embed_knn_ivf" -> graft.pipeline.DerivedOracles.embedKnnIvf,
    "embed_knn_ivf_table" -> graft.pipeline.DerivedOracles.embedKnnIvf,

    "llm_enhance" ->
      ("WITH u AS (SELECT doc_id, text, " +
       "CASE doc_id % 6 WHEN 0 THEN 'blog' WHEN 1 THEN 'news' WHEN 2 THEN 'docs' WHEN 3 THEN 'articles' WHEN 4 THEN 'posts' ELSE 'wiki' END AS cat, " +
       "'site-' || (doc_id % 50) || '.example' AS dom FROM documents), " +
       "b AS (SELECT doc_id, text, cat, dom, " +
       "'https://' || dom || '/' || cat || '/post-' || doc_id AS url, " +
       "'Doc ' || doc_id AS title FROM u) " +
       "SELECT doc_id, " +
       "CASE WHEN strpos(text, '.') > 0 THEN substr(text, 1, strpos(text, '.')) ELSE text END AS summary, " +
       "CASE cat WHEN 'docs' THEN 'docs' WHEN 'news' THEN 'article' WHEN 'blog' THEN '' ELSE 'unknown' END AS content_type, " +
       "'\"stub:' || substr(sha256('What is ' || title || ' at ' || dom || '?' || chr(10) || chr(10) || " +
       "'Title: ' || title || chr(10) || 'URL: ' || url || chr(10) || chr(10) || 'Content:' || chr(10) || text), 1, 12) || '\"' AS custom_q1 " +
       "FROM b ORDER BY doc_id"),

    "llm_extract" ->
      ("WITH u AS (SELECT doc_id, text, " +
       "CASE doc_id % 6 WHEN 0 THEN 'blog' WHEN 1 THEN 'news' WHEN 2 THEN 'docs' WHEN 3 THEN 'articles' WHEN 4 THEN 'posts' ELSE 'wiki' END AS cat FROM documents), " +
       "b AS (SELECT doc_id, 'https://site-' || (doc_id % 50) || '.example/' || cat || '/post-' || doc_id AS url, " +
       "'Doc ' || doc_id AS title, substr(text, 1, 4000) AS content FROM u) " +
       "SELECT doc_id, '{\"response\":\"stub:' || substr(sha256(" +
       "'Extract the following information from this content:' || chr(10) || chr(10) || " +
       "'Title: ' || title || chr(10) || 'URL: ' || url || chr(10) || chr(10) || " +
       "'Content:' || chr(10) || content || chr(10) || chr(10) || " +
       "'Extract these fields:' || chr(10) || '- notes (string?)' || chr(10) || '- response (string)'" +
       "), 1, 12) || '\"}' AS extract_json FROM b ORDER BY doc_id"),

    // planted families over 600 pages: dup rows at i = 50k for k = 1..11
    // (i=600 is out of range), each clustered with row i-1; numeric-min
    // member is the survivor. Encodes the ground truth PagesGen plants,
    // independent of the LSH/CC implementation under test.
    "dedup_survivors_fixture" ->
      ("WITH ks AS (SELECT unnest(generate_series(1, 11)) AS k) " +
       "SELECT CAST(50*k - 1 AS BIGINT) AS doc_idx, CAST(50*k - 1 AS BIGINT) AS rep_idx, true AS is_survivor FROM ks " +
       "UNION ALL " +
       "SELECT CAST(50*k AS BIGINT), CAST(50*k - 1 AS BIGINT), false FROM ks " +
       "ORDER BY doc_idx"),

    "manifest_counters" ->
      ("SELECT * FROM (VALUES " +
       "('data_distinct_urls', CAST(600 AS BIGINT)), " +
       "('data_rows', CAST(600 AS BIGINT)), " +
       "('manifest_pages_sum', CAST(600 AS BIGINT)), " +
       "('manifest_run1_partitions_min', CAST(1 AS BIGINT)), " +
       "('run1_empty_content', CAST(0 AS BIGINT)), " +
       "('run1_pages_parsed', CAST(600 AS BIGINT)), " +
       "('run1_parse_failures', CAST(0 AS BIGINT)), " +
       "('run2_pages_parsed', CAST(0 AS BIGINT))" +
       ") AS t(metric, value) ORDER BY metric"),

    "robots_gate" ->
      ("WITH u AS (SELECT doc_id, " +
       "CASE doc_id % 6 WHEN 0 THEN 'blog' WHEN 1 THEN 'news' WHEN 2 THEN 'docs' WHEN 3 THEN 'articles' WHEN 4 THEN 'posts' ELSE 'wiki' END AS cat " +
       "FROM documents), " +
       "p AS (SELECT doc_id, '/' || cat || '/post-' || doc_id AS path FROM u) " +
       "SELECT doc_id, 'https://site-' || (doc_id % 50) || '.example' || path AS url, " +
       "doc_id % 4 AS robots_variant, " +
       "CASE doc_id % 4 " +
       "WHEN 0 THEN true " +
       "WHEN 1 THEN (starts_with(path, '/posts/post-1') OR NOT (starts_with(path, '/docs/') OR starts_with(path, '/posts/'))) " +
       "WHEN 2 THEN NOT starts_with(path, '/news/') " +
       "ELSE NOT (regexp_matches(path, '^/art.*les/.*') OR path = '/wiki/post-11') " +
       "END AS allowed " +
       "FROM p ORDER BY doc_id"),

    // floors must be below the measured recall at every verification SF
    // (documented alongside the query); the driver checks only the booleans
    "ann_recall" ->
      ("SELECT * FROM (VALUES ('ivf', 0.8, true), ('lsh', 0.5, true), ('multiprobe', 0.8, true)) " +
       "AS t(variant, recall_floor, meets_floor) ORDER BY variant"),

    // planted pairs + hammings of the frozen SimhashFixture corpus —
    // cross-checked against an independent Python FNV-1a/splitmix64/bit-vote
    // implementation (SimhashFixture scaladoc); min non-planted hamming in
    // the corpus is 19, so the expected set is exactly the planted families
    "simhash_fixture" ->
      ("SELECT CAST(idx_a AS BIGINT) AS idx_a, CAST(idx_b AS BIGINT) AS idx_b, " +
       "CAST(hamming AS BIGINT) AS hamming FROM (VALUES " +
       "(0,1,0),(2,3,1),(4,5,1),(6,7,0),(8,9,3),(10,11,2),(12,13,0),(14,15,2),(16,17,1),(18,19,0)" +
       ") AS t(idx_a, idx_b, hamming) ORDER BY idx_a, idx_b"),

    "docx_fixture" -> DocxFixture.fixtureOracle,
    "rtf_fixture" -> RtfFixture.fixtureOracle,

    // transcribed from the frozen PdfGen corpus (PdfParser scaladoc
    // documents the supported subset; blocks ordered page-major, top-down)
    "pdf_fixture" ->
      ("SELECT test_case, CAST(page AS BIGINT) AS page, CAST(blk AS BIGINT) AS blk, kind, text " +
       "FROM (VALUES " +
       "('acroform', 0, 0, 'text', 'Application form below.'), " +
       "('acroform', 1, 1, 'field', 'applicant: Ada Lovelace'), " +
       "('acroform', 1, 2, 'field', 'subscribed: Yes'), " +
       "('acroform', 1, 3, 'field', 'address.city: London'), " +
       "('aes256enc', 0, 0, 'text', 'Decrypted AES-256 content extracted.'), " +
       "('aesv2enc', 0, 0, 'text', 'Decrypted AESV2 content extracted.'), " +
       "('annots', 0, 0, 'text', 'Annotated body text.'), " +
       "('annots', 0, 1, 'text', 'A margin note worth keeping.'), " +
       "('rc4enc', 0, 0, 'text', 'Decrypted RC4 content extracted.'), " +
       "('crossroute', 0, 0, 'heading', 'Shared Cross-Route Document'), " +
       "('crossroute', 0, 1, 'text', 'This exact paragraph exists in both routes.'), " +
       "('crossroute', 0, 2, 'text', 'A second matching paragraph closes the document.'), " +
       "('encrypted', -1, -1, 'none', ''), " +
       "('plain', 0, 0, 'heading', 'Annual Report'), " +
       "('plain', 0, 1, 'text', 'The first body line. | The second body line.'), " +
       "('plain', 0, 2, 'text', 'A separate paragraph block.'), " +
       "('flate', 0, 0, 'text', 'Compressed content stream works.'), " +
       "('formxobj', 0, 0, 'text', 'Direct page text.'), " +
       "('formxobj', 0, 1, 'text', 'Form XObject text.'), " +
       "('escapes', 0, 0, 'text', 'Parens (nested) and a backslash \\ and octal A | Hello hex!'), " +
       "('kerning', 0, 0, 'text', 'Kerned words here'), " +
       "('twopage', 0, 0, 'text', 'Page one text.'), " +
       "('twopage', 1, 1, 'text', 'Page two part A.'), " +
       "('twopage', 1, 2, 'text', 'Page two part B.'), " +
       "('tounicode', 0, 0, 'text', 'PDF map!'), " +
       "('objstm', 0, 0, 'text', 'Object stream page.'), " +
       "('outline', 0, 0, 'text', 'Sectioned body text.'), " +
       "('corrupt', -1, -1, 'none', ''), " +
       "('docinfo', 0, 0, 'text', 'Body text for the info document.'), " +
       "('notpdf', -1, -1, 'none', '')" +
       ") AS t(test_case, page, blk, kind, text) ORDER BY test_case, page, blk"),

    // transcribed end-to-end scrapePdf expectations (blocks through the B2
    // classifier + B7 normalizeText; 'kerning' = 17 chars, no terminal
    // punctuation → too-short reject, exactly like its HTML twin; corrupt/
    // notpdf → empty_html; encrypted → encrypted_pdf)
    "pdf_scrape_fixture" ->
      ("SELECT test_case, status, content_type, title, " +
       "CAST(blocks_total AS BIGINT) AS blocks_total, " +
       "CAST(blocks_accepted AS BIGINT) AS blocks_accepted, truncated, norm_text " +
       "FROM (VALUES " +
       "('acroform', 'ok', 'pdf', '', 4, 4, false, " +
       "'Application form below. ¶ applicant: Ada Lovelace ¶ subscribed: Yes ¶ address.city: London'), " +
       "('aes256enc', 'ok', 'pdf', '', 1, 1, false, 'Decrypted AES-256 content extracted.'), " +
       "('aesv2enc', 'ok', 'pdf', '', 1, 1, false, 'Decrypted AESV2 content extracted.'), " +
       "('annots', 'ok', 'pdf', '', 2, 2, false, " +
       "'Annotated body text. ¶ A margin note worth keeping.'), " +
       "('rc4enc', 'ok', 'pdf', '', 1, 1, false, 'Decrypted RC4 content extracted.'), " +
       "('corrupt', 'empty_html', 'pdf', '', 0, 0, false, ''), " +
       "('docinfo', 'ok', 'pdf', 'Document Info Title', 1, 1, false, 'Body text for the info document.'), " +
       "('crossroute', 'ok', 'pdf', 'Shared Cross-Route Document', 3, 3, false, " +
       "'# Shared Cross-Route Document ¶ This exact paragraph exists in both routes. ¶ A second matching paragraph closes the document.'), " +
       "('encrypted', 'encrypted_pdf', 'pdf', '', 0, 0, false, ''), " +
       "('escapes', 'ok', 'pdf', '', 1, 1, false, " +
       "'Parens (nested) and a backslash \\ and octal A | Hello hex!'), " +
       "('flate', 'ok', 'pdf', '', 1, 1, false, 'Compressed content stream works.'), " +
       "('formxobj', 'ok', 'pdf', '', 2, 2, false, 'Direct page text. ¶ Form XObject text.'), " +
       "('kerning', 'ok', 'pdf', '', 1, 0, false, ''), " +
       "('notpdf', 'empty_html', 'pdf', '', 0, 0, false, ''), " +
       "('objstm', 'ok', 'pdf', '', 1, 1, false, 'Object stream page.'), " +
       "('outline', 'ok', 'pdf', '', 1, 1, false, 'Sectioned body text.'), " +
       "('plain', 'ok', 'pdf', 'Annual Report', 3, 3, false, " +
       "'# Annual Report ¶ The first body line. | The second body line. ¶ A separate paragraph block.'), " +
       "('tounicode', 'ok', 'pdf', '', 1, 1, false, 'PDF map!'), " +
       "('twopage', 'ok', 'pdf', '', 3, 3, false, 'Page one text. ¶ Page two part A. ¶ Page two part B.')" +
       ") AS t(test_case, status, content_type, title, blocks_total, blocks_accepted, truncated, norm_text) " +
       "ORDER BY test_case"),

    // transcribed /Info + /Link expectations (UTF-16BE BOM title decodes;
    // D: dates → ISO-8601; mailto filtered from links)
    "pdf_meta_fixture" ->
      ("SELECT test_case, title, author, published_at, modified_at, description, keywords, " +
       "CAST(n_links AS BIGINT) AS n_links, CAST(n_external AS BIGINT) AS n_external, outline " +
       "FROM (VALUES " +
       "('annots', '', '', '', '', '', '', 2, 1, ''), " +
       "('docinfo', 'Document Info Title', 'Jane Q. Author', '2024-01-02T03:04:05+01:00', " +
       "'2024-06-01T12:00:00Z', 'A concise subject line.', 'alpha|beta|gamma', 0, 0, ''), " +
       "('outline', '', '', '', '', '', '', 0, 0, '1|Introduction~1|Results~2|Detailed Results'), " +
       "('plain', 'Annual Report', '', '', '', '', '', 0, 0, '')" +
       ") AS t(test_case, title, author, published_at, modified_at, description, keywords, n_links, n_external, outline) " +
       "ORDER BY test_case"),

    // transcribed cross-route clustering: the planted HTML/PDF pair share a
    // norm_hash (cluster of 2, represented by the lexicographically-min
    // url); the two unrelated docs stay singletons
    "pdf_dedup_fixture" ->
      ("SELECT url, CAST(cluster_size AS BIGINT) AS cluster_size, cluster_rep FROM (VALUES " +
       "('https://site-a.example.com/page', 2, 'https://site-a.example.com/page'), " +
       "('https://site-b.example.com/doc.pdf', 2, 'https://site-a.example.com/page'), " +
       "('https://site-c.example.com/other', 1, 'https://site-c.example.com/other'), " +
       "('https://site-d.example.com/report.pdf', 1, 'https://site-d.example.com/report.pdf')" +
       ") AS t(url, cluster_size, cluster_rep) ORDER BY url"),

    // transcribed from the frozen WarcGen fixture corpus (one file per
    // case; previews are the first 30 chars of the decoded payload with
    // newlines as '·'; ts_us = unix micros of WARC-Date; PDF payloads
    // render as the marker 'PDF'). badlen's record 0 carries an unparsable
    // Content-Length and is dropped by salvage; notwarc.warc contributes
    // zero rows; shorttail/cutoff surface truncated=true (EOF salvage and
    // the WARC-Truncated header respectively)
    "warc_fixture" ->
      ("SELECT test_case, CAST(record_idx AS BIGINT) AS record_idx, warc_type, url, " +
       "CAST(http_status AS BIGINT) AS http_status, CAST(ts_us AS BIGINT) AS ts_us, " +
       "content_type, truncated, preview FROM (VALUES " +
       "('badlen.warc', 0, 'response', 'https://warc.example.com/salvaged', 200, 1705314660000000, 'text/html', false, '<html><body><p>Salvaged record'), " +
       "('chunked.warc.gz', 0, 'response', 'https://warc.example.com/chunked', 200, 1705314660000000, 'text/html', false, '<html><body><p>Chunked transfe'), " +
       "('gzbody.warc.gz', 0, 'response', 'https://warc.example.com/gzbody', 200, 1705314660000000, 'text/html', false, '<html><body><p>Gzip content-en'), " +
       "('lfonly.warc', 0, 'response', 'https://warc.example.com/lfonly', 200, 1705314660000000, 'text/html', false, '<html><body><p>Beta page body,'), " +
       "('multi.warc.gz', 0, 'response', 'https://warc.example.com/beta', 200, 1705314600000000, 'text/html', false, '<html><body><p>Beta page body,'), " +
       "('multi.warc.gz', 1, 'response', 'https://warc.example.com/gone', 404, 1705314660000000, 'text/html', false, '<html><body>gone</body></html>'), " +
       "('multi.warc.gz', 2, 'response', 'https://warc.example.com/gamma', 200, 1705314720000000, 'text/html', false, '<html><body><p>Alpha page body'), " +
       "('pdfresp.warc.gz', 0, 'response', 'https://warc.example.com/report.pdf', 200, 1705314720000000, 'application/pdf', false, 'PDF'), " +
       "('plain.warc', 0, 'warcinfo', '', -1, 1705314600000000, '', false, 'software: graft-warcgen··forma'), " +
       "('plain.warc', 1, 'request', 'https://warc.example.com/alpha', -1, 1705314600000000, '', false, 'GET /alpha HTTP/1.1··Host: war'), " +
       "('plain.warc', 2, 'response', 'https://warc.example.com/alpha', 200, 1705314600000000, 'text/html; charset=utf-8', false, '<html><body><p>Alpha page body'), " +
       "('resource.warc', 0, 'resource', 'https://warc.example.com/robots.txt', -1, 1705314600000000, '', false, 'plain resource text, no HTTP e'), " +
       "('resource.warc', 1, 'conversion', 'https://warc.example.com/alpha', -1, 1705314660000000, '', false, 'converted text rendition'), " +
       "('revisit.warc.gz', 0, 'revisit', 'https://warc.example.com/alpha', -1, 1705314720000000, '', false, ''), " +
       "('revisit.warc.gz', 1, 'response', 'https://warc.example.com/cutoff', 200, 1705314720000000, 'text/html', true, '<html><body><p>Declared-trunca'), " +
       "('shorttail.warc', 0, 'response', 'https://warc.example.com/short', 200, 1705314720000000, 'text/html', true, '<html><body><p>Alpha page bod')" +
       ") AS t(test_case, record_idx, warc_type, url, http_status, ts_us, content_type, truncated, preview) " +
       "ORDER BY test_case, record_idx"),

    // the WARC round-trip invariant: 120 pages through write→ingest→extract
    // must be byte-identical and hash-identical to the direct corpus
    "warc_roundtrip" ->
      ("SELECT CAST(n_pages AS BIGINT) AS n_pages, " +
       "CAST(n_html_identical AS BIGINT) AS n_html_identical, " +
       "CAST(n_ts_identical AS BIGINT) AS n_ts_identical, " +
       "CAST(n_extract_match AS BIGINT) AS n_extract_match FROM (VALUES " +
       "(120, 120, 120, 120)" +
       ") AS t(n_pages, n_html_identical, n_ts_identical, n_extract_match)"),

    "sitemap_fixture" -> SitemapFixture.fixtureOracle,
    "sitemap_frontier" -> SitemapFixture.frontierOracle,
    "sitemap_frontier_bloom" -> SitemapFixture.frontierOracle,
    "frontier_interleave" ->
      ("SELECT doc_id, source, CAST(row_number() OVER " +
       "(PARTITION BY source ORDER BY doc_id) AS BIGINT) AS host_seq " +
       "FROM documents ORDER BY host_seq, source, doc_id"),

    "embed_knn" ->
      ("WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5), " +
       "scored AS (SELECT q.query_id, e.vec_id, " +
       "round(list_cosine_similarity(q.q_emb::DOUBLE[], e.embedding::DOUBLE[]), 5) AS cos " +
       "FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id), " +
       "ranked AS (SELECT query_id, vec_id, cos, " +
       "row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank FROM scored) " +
       "SELECT query_id, rank, vec_id, cos FROM ranked WHERE rank <= 10 ORDER BY query_id, rank"),

    "embed_agg_label" ->
      ("SELECT label, CAST(i - 1 AS BIGINT) AS dim, round(avg(CAST(embedding[i] AS DOUBLE)), 5) AS avg_v " +
       "FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) t " +
       "GROUP BY 1, 2 ORDER BY label, dim"),

    // aggregator emits float vectors (reference E5 semantics) → truncate the
    // oracle's double mean through REAL before rounding, mirroring finish()
    "embed_agg_vec" ->
      ("SELECT label, CAST(i - 1 AS BIGINT) AS dim, " +
       "round(CAST(CAST(avg(CAST(embedding[i] AS DOUBLE)) AS REAL) AS DOUBLE), 5) AS avg_v " +
       "FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) t " +
       "GROUP BY 1, 2 ORDER BY label, dim")
  ) ++ (
    // DERIVED-INPUT oracles (pipeline/DerivedOracles): post-extraction
    // operator logic replayed by DuckDB over this run's extraction dump —
    // only available when Verify set the dump path
    if (verifyOutDir.nonEmpty) graft.pipeline.DerivedOracles.all(verifyOutDir)
    else Map.empty[String, String])

  /** Set by [[Verify]] before [[oracleSql]] is read: the directory its
    * query dumps landed in, which the derived-input oracles read back via
    * DuckDB `read_parquet`. Empty (library use, tests) ⇒ those queries
    * stay rows-only. */
  @volatile var verifyOutDir: String = ""
}
