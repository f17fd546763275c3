package graft.pipeline

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** Per-partition lineage/counter record — the checkpoint manifest row of
  * SURVEY.md §7.5 / the north rule's "per-partition lineage and counters". */
final case class ManifestRow(
    run_id: String,
    partition_id: Int,
    n_rows: Long,
    n_parse_failures: Long,
    n_empty_content: Long,
    n_encrypted_pdf: Long,
    min_url: String,
    max_url: String)

/**
 * The distributed extraction job: decode → salted host-hash repartition →
 * fused per-partition extraction → counters + manifest → sink.
 *
 * Scale design (SURVEY.md §3.2): exactly ONE wide dependency — the explicit
 * `repartition` on `xxhash64(host, salt)`. The mega-host salt split bounds
 * any single host to ~`rowsPerBucket` rows per task, so a 20%-of-corpus
 * domain cannot stall a 1000-executor cluster behind one straggler task.
 * Everything downstream is narrow and codegen-opaque by design (object-heavy
 * DOM work dominates; setup is amortized per partition, not per row).
 */
object ExtractJob {

  /** Extract the URL host in pure built-ins (stays inside codegen). */
  def hostCol = regexp_replace(parse_url(col("url"), lit("HOST")), "^www\\.", "")

  /**
   * Hash-by-host partitioning with salt-based skew splitting. Hosts whose
   * row count exceeds `rowsPerBucket` are split into `ceil(count/rowsPerBucket)`
   * salt buckets via a second hash on the full url; all other hosts keep
   * salt 0 so their pages stay co-located (host-local downstream joins and
   * robots/side-table broadcasts remain cheap).
   *
   * The mega-host pre-pass is a columnar count on `url` only (column-pruned
   * scan + partial agg) — at 100 TB it reads one string column and ships
   * one row per distinct big host.
   */
  def saltedRepartitionByHost(pages: DataFrame, numPartitions: Int): DataFrame = {
    val mega = megaHostMap(pages, numPartitions)
    applySaltedRepartition(pages, mega, numPartitions)
  }

  /** The mega-host pre-pass alone: hosts whose row count exceeds
    * `totalRows / numPartitions` → their salt-bucket count. Runs as one
    * column-pruned scan over `url` ONLY — callers hand it the cheap input
    * relation even when the relation being repartitioned is the (expensive
    * to recompute) extracted side. */
  def megaHostMap(pages: DataFrame, numPartitions: Int): org.apache.spark.broadcast.Broadcast[Map[String, Int]] =
    pages.sparkSession.sparkContext.broadcast {
      val counts = pages.select(hostCol.as("__host")).groupBy("__host").count().persist()
      try {
        val totalRows = math.max(1L, Option(counts.agg(sum("count")).first().get(0)).map(_.asInstanceOf[Long]).getOrElse(0L))
        val rowsPerBucket = math.max(1L, totalRows / numPartitions)
        counts.filter(col("count") > rowsPerBucket)
          .collect()
          .map(r => r.getString(0) -> math.ceil(r.getLong(1).toDouble / rowsPerBucket).toInt)
          .toMap
      } finally counts.unpersist()
    }

  /** Exchange on `xxhash64(host, salt)` using a precomputed mega-host map.
    * Payload-agnostic: works identically on raw pages and on extracted rows
    * (any relation with a `url` column). */
  /** The one salt function: per-url sub-bucket within a mega-host. Shared by
    * the exchange plan (below) and the bucketed-ingest layout (Bench) — the
    * two are only exchange-equivalent while they salt identically, so there
    * is exactly one definition. */
  def saltUdf(mega: org.apache.spark.broadcast.Broadcast[Map[String, Int]])
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (host: String, url: String) =>
      val buckets = mega.value.getOrElse(host, 1)
      if (buckets <= 1) 0 else Math.floorMod(scala.util.hashing.MurmurHash3.stringHash(url), buckets)
    }

  def applySaltedRepartition(
      df: DataFrame,
      mega: org.apache.spark.broadcast.Broadcast[Map[String, Int]],
      numPartitions: Int): DataFrame = {
    val saltFor = saltUdf(mega)
    df.withColumn("__host", hostCol)
      .withColumn("__salt", saltFor(col("__host"), col("url")))
      .repartition(numPartitions, xxhash64(col("__host"), col("__salt")))
      .drop("__salt")
  }

  /** S2 robots gate: join the small `(host, robots_txt)` side table by host
    * (broadcast — it is bounded by distinct-host count, not corpus size) and
    * drop rows the matcher forbids BEFORE any DOM work. Hosts missing from
    * the side table fail open (robots.ts:46-52 error semantics). */
  def robotsGate(
      pages: Dataset[PageRow],
      robots: DataFrame,
      userAgent: String = "ScrapexBot/1.0"): Dataset[PageRow] = {
    val spark = pages.sparkSession
    import spark.implicits._
    val allowed = udf((robotsTxt: String, url: String) =>
      graft.sources.Robots.isAllowed(robotsTxt, url, userAgent))
    pages.toDF().withColumn("__host", hostCol)
      .join(broadcast(robots.select(col("host").as("__host"), col("robots_txt"))),
        Seq("__host"), "left")
      .filter(col("robots_txt").isNull || allowed(col("robots_txt"), col("url")))
      .select("url", "warc_ts", "html", "text", "lang")
      .as[PageRow]
  }

  /** Drop a managed table AND its warehouse location: a previous session's
    * orphaned location blocks a managed-table create (the in-memory catalog
    * forgets the table but the files remain). */
  def dropTableAndLocation(spark: SparkSession, tableName: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$tableName`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), tableName.toLowerCase(java.util.Locale.ROOT))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** Persist a dataset bucketed by a key so downstream equi-joins and
    * aggregations on that key are exchange-free (Spark reads co-bucketed
    * tables without shuffling either side). The 100 TB pattern for the
    * extracted corpus: bucket by `domain` once at write time, then every
    * per-host join (robots audits, host-level quality rollups, crawl-politeness
    * stats) and host groupBy skips its shuffle forever after. */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      bucketCol: String,
      numBuckets: Int = 64): Unit = {
    val spark = df.sparkSession
    dropTableAndLocation(spark, tableName)
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(tableName)
  }

  /** Decode `html: binary` → string with a charset sniff (UTF-8 default,
    * meta-charset override) — first transform per SURVEY.md §1.2. The sniff
    * scans the raw bytes for `charset=` directly (ASCII-compatible in every
    * charset the sniff can name) — no head-string or per-call Pattern. */
  def decodeHtml(bytes: Array[Byte]): String = {
    if (bytes == null) return ""
    val charset = sniffCharset(bytes).getOrElse(java.nio.charset.StandardCharsets.UTF_8)
    new String(bytes, charset)
  }

  private val charsetLit = "charset=".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  private def sniffCharset(bytes: Array[Byte]): Option[java.nio.charset.Charset] = {
    val n = math.min(bytes.length, 2048)
    var i = 0
    while (i + charsetLit.length <= n) {
      var j = 0
      while (j < charsetLit.length &&
        (bytes(i + j) | 0x20) == charsetLit(j)) j += 1 // ASCII case-fold
      if (j == charsetLit.length) {
        var k = i + j
        if (k < n && (bytes(k) == '"' || bytes(k) == '\'')) k += 1
        val s = k
        while (k < n && {
          val b = bytes(k)
          (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
          (b >= '0' && b <= '9') || b == '_' || b == '-'
        }) k += 1
        if (k > s) {
          val name = new String(bytes, s, k - s, java.nio.charset.StandardCharsets.US_ASCII)
          return try Some(java.nio.charset.Charset.forName(name))
          catch { case _: Exception => None }
        }
      }
      i += 1
    }
    None
  }

  final case class Counters(
      pagesParsed: LongAccumulator,
      parseFailures: LongAccumulator,
      emptyContent: LongAccumulator,
      encryptedPdf: LongAccumulator)

  def newCounters(spark: SparkSession): Counters = Counters(
    spark.sparkContext.longAccumulator("pages_parsed"),
    spark.sparkContext.longAccumulator("parse_failures"),
    spark.sparkContext.longAccumulator("empty_content"),
    // encrypted PDFs counted apart from parse failures (VERDICT r5 #4):
    // "needs decryption support" is actionable, "no text exists" is not
    spark.sparkContext.longAccumulator("encrypted_pdf"))

  /**
   * The fused extraction: one `mapPartitions` over the salted layout. Also
   * records per-partition lineage into `manifestAcc` (one entry per task,
   * flushed by a task-completion listener so early-terminating consumers —
   * `limit()`, take — still record every started partition).
   */
  def extract(
      pages: Dataset[PageRow],
      numPartitions: Int,
      counters: Option[Counters] = None,
      manifest: Option[org.apache.spark.util.CollectionAccumulator[ManifestRow]] = None,
      runId: String = "run"
  ): Dataset[ScrapedRow] = {
    val spark = pages.sparkSession
    import spark.implicits._
    // prune to the two columns extraction reads BEFORE the exchange: the
    // crawl-provided text/lang/warc_ts columns never ride the shuffle
    // (at 100 TB that is a double-digit percentage of shuffle bytes)
    val repartitioned = saltedRepartitionByHost(pages.toDF().select("url", "html"), numPartitions)
      .select("url", "html").as[(String, Array[Byte])]
    fusedExtract(repartitioned, counters, manifest, runId)
  }

  /**
   * Exchange-free extraction: the fused per-partition extraction runs
   * directly on the input scan splits — no repartition anywhere in the job.
   * This is the right plan whenever (a) the input table is already
   * host-bucketed at ingest (`writeBucketed` by salted host key: the scan
   * splits ARE host-clustered, so the sink and downstream host-joins keep
   * their co-location for free), or (b) downstream doesn't need host
   * clustering. Skew note: scan splits are size-bounded by
   * `maxPartitionBytes`, so no straggler can form regardless of host skew.
   */
  def extractOnSplits(
      pages: Dataset[PageRow],
      counters: Option[Counters] = None,
      manifest: Option[org.apache.spark.util.CollectionAccumulator[ManifestRow]] = None,
      runId: String = "run"
  ): Dataset[ScrapedRow] = {
    val spark = pages.sparkSession
    import spark.implicits._
    fusedExtract(pages.toDF().select("url", "html").as[(String, Array[Byte])],
      counters, manifest, runId)
  }

  /**
   * Extract-first plan (BASELINE.md plan-order note): extraction runs on the
   * raw scan splits (narrow — the heavy DOM work sees no exchange at all),
   * and the salted host exchange runs AFTER, on the extracted rows, feeding
   * the host-clustered sink. On real web corpora (markup:text ≈ 10:1) the
   * extracted side is the much smaller one, so this shuffles ~10× fewer
   * bytes than shuffle-first; on the synthetic bench corpus the inequality
   * is reversed (extracted ≈ 2× html) — `Bench` measures both.
   *
   * The mega-host salt map is computed from the cheap url-only input scan,
   * NOT from the extracted relation (which would re-run extraction).
   */
  def extractFirst(
      pages: Dataset[PageRow],
      numPartitions: Int,
      counters: Option[Counters] = None,
      manifest: Option[org.apache.spark.util.CollectionAccumulator[ManifestRow]] = None,
      runId: String = "run"
  ): Dataset[ScrapedRow] = {
    val spark = pages.sparkSession
    import spark.implicits._
    // the mega-host map must be keyed on the SAME host strings the salted
    // exchange reads — the EXTRACTED rows' urls, which extraction has
    // passed through UrlOps.normalizeUrl (case, www, tracking params). A
    // raw-keyed map looks equivalent but misses at apply time whenever
    // normalization changes the host (e.g. WWW.MegaHost.com), silently
    // no-opping the skew split for exactly the hosts it exists to split.
    // Applying the same pure normalization in the pre-pass keeps it a
    // column-pruned scan — extraction still runs exactly once.
    val normUrl = udf((u: String) =>
      graft.urlx.UrlOps.normalizeUrl(if (u == null) "" else u))
    val mega = megaHostMap(
      pages.toDF().select(normUrl(col("url")).as("url")), numPartitions)
    val extracted = extractOnSplits(pages, counters, manifest, runId)
    applySaltedRepartition(extracted.toDF(), mega, numPartitions)
      .drop("__host").as[ScrapedRow]
  }

  /** Content-type routing on magic bytes (round 5): Common-Crawl-style
    * corpora mix HTML and PDF under one binary column; both routes emit
    * the same ScrapedRow shape, so every downstream stage is
    * content-type-agnostic. The ONE routing definition is shared by the
    * fused extraction and the byte-ratio plan sampler. */
  def scrapeAny(url: String, html: Array[Byte]): ScrapedRow =
    if (html != null && html.length >= 4 && html(0) == '%' &&
        html(1) == 'P' && html(2) == 'D' && html(3) == 'F')
      ScrapePipeline.scrapePdf(html, url)
    else if (graft.sources.Docx.isZip(html))
      // ZIP container → the office/ebook route (round 6); a ZIP that is
      // none of the flavors surfaces as not_docx, never as HTML soup
      ScrapePipeline.scrapeDocx(html, url)
    else if (graft.sources.Rtf.isRtf(html))
      ScrapePipeline.scrapeRtf(html, url)
    else ScrapePipeline.scrapeHtml(decodeHtml(html), url)

  /** Byte-ratio plan selection for unbucketed input (BASELINE.md: choosing
    * shuffle_first vs extract_first "is a one-line byte-ratio check at
    * ingest", made real per VERDICT r3 #6). Extracts a bounded sample on the
    * driver and compares the bytes each plan would shuffle: shuffle_first
    * moves the raw html, extract_first moves the extracted rows. Real-web
    * markup-heavy corpora (markup:text ≈ 10:1) pick extract_first; dense-
    * text corpora where the extracted row (content md + text + normalized)
    * outweighs its html pick shuffle_first. The sample is one
    * `limit(sampleN)` read — O(one partition) at any corpus size. */
  def chooseVariant(pages: Dataset[PageRow], sampleN: Int = 256): String = {
    // UTF-8 byte length without allocating the encoded array — the shuffle
    // moves UTF8String bytes, so comparing UTF-16 char counts against html
    // BYTE counts would misorder the sides by up to 3x on non-Latin text
    def utf8Len(s: String): Long = {
      var bytes = 0L
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        bytes += (if (cp < 0x80) 1 else if (cp < 0x800) 2 else if (cp < 0x10000) 3 else 4)
        i += Character.charCount(cp)
      }
      bytes
    }
    val sample = pages.toDF().select("url", "html").limit(sampleN).collect()
    var htmlBytes = 0L
    var extractedBytes = 0L
    sample.foreach { r =>
      val url = r.getString(0)
      val html = r.getAs[Array[Byte]](1)
      htmlBytes += (if (html == null) 0 else html.length)
      val row = scrapeAny(url, html)
      // the fields that dominate a shuffled ScrapedRow's serialized size
      extractedBytes += utf8Len(row.content) + utf8Len(row.text_content) +
        utf8Len(row.normalized_text) + utf8Len(row.excerpt) + utf8Len(row.description) +
        row.links.iterator.map(l => utf8Len(l.url) + utf8Len(l.text)).sum
    }
    if (extractedBytes < htmlBytes) "extract_first" else "shuffle_first"
  }

  /** Auto-planned extraction for unbucketed input: [[chooseVariant]] on a
    * sample, then the chosen plan. (Bucketed-at-ingest input should call
    * [[extractOnSplits]] directly — no exchange beats either choice.) */
  def extractAuto(
      pages: Dataset[PageRow],
      numPartitions: Int,
      counters: Option[Counters] = None,
      manifest: Option[org.apache.spark.util.CollectionAccumulator[ManifestRow]] = None,
      runId: String = "run"
  ): (String, Dataset[ScrapedRow]) = chooseVariant(pages) match {
    case v @ "extract_first" => (v, extractFirst(pages, numPartitions, counters, manifest, runId))
    case v => (v, extract(pages, numPartitions, counters, manifest, runId))
  }

  private def fusedExtract(
      input: Dataset[(String, Array[Byte])],
      counters: Option[Counters],
      manifest: Option[org.apache.spark.util.CollectionAccumulator[ManifestRow]],
      runId: String
  ): Dataset[ScrapedRow] = {
    val spark = input.sparkSession
    import spark.implicits._
    input.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var nRows = 0L
      var nFail = 0L
      var nEmpty = 0L
      var nEncrypted = 0L
      var minUrl: String = null
      var maxUrl: String = null

      val mapped = it.map { case (url, html) =>
        val row = scrapeAny(url, html)
        nRows += 1
        if (row.status != "ok" || row.error.isDefined) nFail += 1
        if (row.text_content.isEmpty) nEmpty += 1
        if (row.status == "encrypted_pdf") nEncrypted += 1
        if (minUrl == null || url < minUrl) minUrl = url
        if (maxUrl == null || url > maxUrl) maxUrl = url
        row
      }

      // Lineage-contract flush (VERDICT r4 #4): a task-completion listener
      // fires even when a downstream consumer short-circuits the iterator
      // (`limit()`, take, an early-exit aggregate) — the drain-time flush
      // alone silently dropped that partition's manifest row and counters.
      // Both paths share one idempotent flush: the listener covers early
      // termination under a real task; the drain check covers direct
      // iterator consumption with no TaskContext (scalar replay in tests).
      var flushed = false
      def flush(): Unit = if (!flushed) {
        flushed = true
        counters.foreach { c =>
          c.pagesParsed.add(nRows); c.parseFailures.add(nFail); c.emptyContent.add(nEmpty)
          c.encryptedPdf.add(nEncrypted)
        }
        manifest.foreach(_.add(ManifestRow(runId, pid, nRows, nFail, nEmpty, nEncrypted,
          Option(minUrl).getOrElse(""), Option(maxUrl).getOrElse(""))))
      }
      Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit](_ => flush()))

      new Iterator[ScrapedRow] {
        def hasNext: Boolean = {
          val h = mapped.hasNext
          if (!h) flush()
          h
        }
        def next(): ScrapedRow = mapped.next()
      }
    }
  }

  /**
   * Checkpointed, resumable run (north rule): skips urls already present in
   * `outDir` via a left-anti join on the checkpoint's url set (column-pruned
   * read), appends new results, and writes the per-partition manifest.
   *
   * `bloomExpectedDone > 0` routes the skip through
   * [[Frontier.unseenByBloom]]: the anti-join's candidate side carries the
   * FULL page rows (html binary included), so on a mostly-fresh rerun the
   * plain shape shuffles the whole corpus to discover almost nothing is
   * done. The bloom path trades that shuffle for a second narrow pass over
   * the input scan — only might-done rows (true resumed urls + ~fpp false
   * positives) ride the verify join. Output rows are identical either way
   * (no false negatives), pinned by SparkJobSpec.
   */
  def runResumable(spark: SparkSession, pages: Dataset[PageRow], outDir: String,
                   numPartitions: Int, runId: String,
                   bloomExpectedDone: Long = 0L): ManifestSummary = {
    import spark.implicits._
    // checkpoint detection through the SAME filesystem abstraction the
    // reads/writes use — a java.io.File check is false for scheme-qualified
    // paths (file:/, hdfs://, s3a://), which would silently skip the resume
    // join and append duplicate rows
    val dataPath = new org.apache.hadoop.fs.Path(outDir, "data")
    val hfs = dataPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val todo: Dataset[PageRow] =
      if (hfs.exists(dataPath)) {
        val done = spark.read.parquet(dataPath.toString).select("url")
        if (bloomExpectedDone > 0L)
          Frontier.unseenByBloom(pages.toDF(), done, "url", bloomExpectedDone)
            .as[PageRow]
        else pages.join(done, Seq("url"), "left_anti").as[PageRow]
      } else pages

    val counters = newCounters(spark)
    val manifestAcc = spark.sparkContext.collectionAccumulator[ManifestRow]("manifest")
    val extracted = extract(todo, numPartitions, Some(counters), Some(manifestAcc), runId)
    extracted.write.mode(SaveMode.Append).parquet(outDir + "/data")

    val manifestRows = manifestAcc.value
    import scala.jdk.CollectionConverters._
    spark.createDataset(manifestRows.asScala.toSeq)
      .write.mode(SaveMode.Append).parquet(outDir + "/manifest")

    ManifestSummary(counters.pagesParsed.value, counters.parseFailures.value, counters.emptyContent.value,
      counters.encryptedPdf.value, manifestRows.size())
  }

  final case class ManifestSummary(pagesParsed: Long, parseFailures: Long, emptyContent: Long,
      encryptedPdf: Long, nPartitions: Int)
}
