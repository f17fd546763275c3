package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Incremental-dedup operator properties beyond the fixture oracle: the
  * delta contains exactly the accepted docs, later batches dedup against
  * accumulated survivors, the parquet store round-trips across reopens,
  * empty-shingle (no-content) docs never near-dup each other, and the
  * history band join suppresses mega-buckets instead of fanning out. */
class IncrementalDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("graft-test")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def tempDir(): String =
    java.nio.file.Files.createTempDirectory("graft-incdedup-spec-")
      .toAbsolutePath.toString

  test("delta contains exactly the accepted docs; dropped docs never index") {
    val s = spark; import s.implicits._
    val b1 = Seq(("a", "one two three"), ("b", "one two three"), ("c", "four five six"))
      .toDF("doc", "body")
    val r = IncrementalDedup.dedupeBatch(b1, "doc", "body",
      IncrementalDedup.emptyIndex(spark))
    assert(r.ledger.count() == 3)
    val kept = r.ledger.filter("kept").select("id").as[String].collect().toSet
    assert(kept == Set("a", "c")) // b is an exact dup of a
    assert(r.delta.hashes.select("id").as[String].collect().toSet == Set("a", "c"))
    assert(r.delta.sigs.select("id").as[String].collect().toSet == Set("a", "c"))
  }

  test("batch 3 dedups against survivors accumulated across earlier batches") {
    val s = spark; import s.implicits._
    val empty = IncrementalDedup.emptyIndex(spark)
    val r1 = IncrementalDedup.dedupeBatch(
      Seq(("a", "alpha beta gamma delta")).toDF("doc", "body"), "doc", "body", empty)
    val i1 = IncrementalDedup.extended(empty, r1.delta)
    val r2 = IncrementalDedup.dedupeBatch(
      Seq(("b", "epsilon zeta eta theta")).toDF("doc", "body"), "doc", "body", i1)
    val i2 = IncrementalDedup.extended(i1, r2.delta)
    val r3 = IncrementalDedup.dedupeBatch(
      Seq(("c", "alpha beta gamma delta"), ("d", "epsilon zeta eta theta"),
          ("e", "iota kappa lambda mu")).toDF("doc", "body"), "doc", "body", i2)
    val rows = r3.ledger.collect()
      .map(r => r.getString(0) -> ((r.getString(2), r.getString(3)))).toMap
    assert(rows("c") == (("exact_dup_hist", "a")))
    assert(rows("d") == (("exact_dup_hist", "b")))
    assert(rows("e") == (("", "")))
    val i3 = IncrementalDedup.extended(i2, r3.delta)
    assert(i3.hashes.count() == 3) // a, b, e
  }

  test("empty batch against a populated index is a no-op") {
    val s = spark; import s.implicits._
    val r1 = IncrementalDedup.dedupeBatch(
      Seq(("a", "alpha beta gamma delta")).toDF("doc", "body"), "doc", "body",
      IncrementalDedup.emptyIndex(spark))
    val i1 = IncrementalDedup.extended(IncrementalDedup.emptyIndex(spark), r1.delta)
    val r2 = IncrementalDedup.dedupeBatch(
      Seq.empty[(String, String)].toDF("doc", "body"), "doc", "body", i1)
    assert(r2.ledger.count() == 0 && r2.delta.hashes.count() == 0)
  }

  test("parquet store: commits append, reopen sees accumulated history") {
    val s = spark; import s.implicits._
    val dir = tempDir()
    val led1 = IncrementalDedup.dedupeAndCommit(
      Seq(("a", "alpha beta gamma delta")).toDF("doc", "body"), "doc", "body", dir)
    assert(led1.filter("kept").count() == 1)
    // a new read of the store (fresh frames, file-scan leaves) sees batch 1
    val led2 = IncrementalDedup.dedupeAndCommit(
      Seq(("b", "alpha beta gamma delta"), ("c", "nu xi omicron pi"))
        .toDF("doc", "body"), "doc", "body", dir)
    val rows = led2.collect()
      .map(r => r.getString(0) -> ((r.getString(2), r.getString(3)))).toMap
    assert(rows("b") == (("exact_dup_hist", "a")))
    assert(rows("c") == (("", "")))
    val idx = IncrementalDedup.openStore(spark, dir)
    assert(idx.hashes.select("id").as[String].collect().toSet == Set("a", "c"))
    assert(idx.sigs.count() == 2)
  }

  test("no-content docs (empty shingle sets) are never near-duplicates") {
    val s = spark; import s.implicits._
    val dir = tempDir()
    // distinct symbol-only texts: different hashes, ALL with zero shingles —
    // unguarded, their identical sentinel signatures band together and
    // jaccard(∅,∅)=1 falsely drops them
    val led1 = IncrementalDedup.dedupeAndCommit(
      Seq(("p", "!!!"), ("q", "???"), ("r", "genuine words with content here"))
        .toDF("doc", "body"), "doc", "body", dir)
    assert(led1.filter("kept").count() == 3)
    // and vs history: another no-content doc must not near-dup p or q
    val led2 = IncrementalDedup.dedupeAndCommit(
      Seq(("t", ",,,")).toDF("doc", "body"), "doc", "body", dir)
    assert(led2.filter("kept").count() == 1)
  }

  test("history mega-buckets are suppressed, small buckets still match") {
    val s = spark; import s.implicits._
    val body = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val sh = TextOps.shingleHashes(TextOps.shingles(body, 3))
    val sig = TextOps.minHash(TextOps.shingles(body, 3), 64)
    def histIndex(n: Int) = IncrementalDedup.Index(
      Seq.empty[(String, String)].toDF("hash", "id"),
      (1 to n).map(i => (s"h$i", sh, sig)).toDF("id", "sh", "sig"))
    val batch = Seq(("b1", body)).toDF("doc", "body")
    // 70 identical history sigs: every shared band bucket exceeds
    // maxBucket=64 → suppressed → b1 survives the near-history stage
    val big = IncrementalDedup.dedupeBatch(batch, "doc", "body", histIndex(70))
    assert(big.ledger.filter("kept").count() == 1)
    // 3 history sigs: buckets are small, the same doc near-dups normally
    val small = IncrementalDedup.dedupeBatch(batch, "doc", "body", histIndex(3))
    val row = small.ledger.collect().head
    assert(!row.getBoolean(1) && row.getString(2) == "near_dup_hist")
  }

  test("band-store path: dedupeAndCommitIndexed matches the plain commit path") {
    val s = spark; import s.implicits._
    val dir = tempDir()
    val tbl = "graft_spec_bands_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    try {
      val led1 = IncrementalDedup.dedupeAndCommitIndexed(
        s.createDataset(graft.pipeline.IncDedupFixture.batch1)
          .repartition(2).toDF("doc", "body"), "doc", "body", dir, tbl)
      val led2 = IncrementalDedup.dedupeAndCommitIndexed(
        s.createDataset(graft.pipeline.IncDedupFixture.batch2)
          .repartition(2).toDF("doc", "body"), "doc", "body", dir, tbl)
      val got = (led1.withColumn("batch", org.apache.spark.sql.functions.lit(1))
        .union(led2.withColumn("batch", org.apache.spark.sql.functions.lit(2))))
        .select("batch", "id", "kept", "stage", "reason")
        .as[(Int, String, Boolean, String, String)].collect().sortBy(t => (t._1, t._2)).toSeq
      assert(got == graft.pipeline.IncDedupFixture.expectedRows)
      // the band table accumulated exactly the accepted docs' bands
      val ids = spark.table(tbl).select("id").distinct().as[String].collect().toSet
      assert(ids == Set("h1", "h2", "x3", "x6"))
      // and the table is really bucketed (the exchange-free contract)
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(tbl))
      assert(meta.bucketSpec.exists(
        _.bucketColumnNames == Seq("band_idx", "band_key")))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("duplicate history band rows (crash-retried append) must not inflate " +
       "bucket counts past the suppression cap") {
    val s = spark; import s.implicits._
    val bodyH2 = graft.pipeline.IncDedupFixture.batch1(1)._2
    val nearH2 = graft.pipeline.IncDedupFixture.batch2(1)._2
    val batch = Seq("b1" -> nearH2).toDF("doc", "body")
    // real history sigs for the true near-dup + the batch doc's own bucket
    val hdSigs = DedupOps.minhashSignatures(
      Seq("hd" -> bodyH2).toDF("doc", "body"), "doc", "body", 3, 64)
    val b1Band = DedupOps.explodeBands(
        DedupOps.minhashSignatures(batch, "doc", "body", 3, 64), 4)
      .select("band_idx", "band_key").head()
    // one bucket: hd + 39 fillers = 40 distinct members (under the 64 cap),
    // every row DUPLICATED — the torn-retry shape. Counting raw rows reads
    // 80 > 64 and suppresses the bucket; counting distinct members must not.
    val bucket = (Seq("hd") ++ (1 to 39).map(i => s"f$i"))
      .map(id => (id, b1Band.getInt(0), b1Band.getLong(1)))
    val histBands = (bucket ++ bucket).toDF("id", "band_idx", "band_key")
    val hist = IncrementalDedup.Index(
      Seq.empty[(String, String)].toDF("hash", "id"), hdSigs)
    val r = IncrementalDedup.dedupeBatch(batch, "doc", "body", hist,
      histBands = histBands)
    val row = r.ledger.collect().head
    assert(!row.getAs[Boolean]("kept") &&
      row.getAs[String]("stage") == "near_dup_hist" &&
      row.getAs[String]("reason") == "hd",
      s"duplicated band rows suppressed a legitimate 40-member bucket: $row")
  }

  test("indexed path bootstraps the band table from a PRE-EXISTING store's " +
       "FULL history, not just the first delta") {
    val s = spark; import s.implicits._
    val dir = tempDir()
    val tbl = "graft_spec_boot_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    try {
      // history populated BEFORE the band table exists (plain commit path)
      IncrementalDedup.dedupeAndCommit(
        s.createDataset(graft.pipeline.IncDedupFixture.batch1)
          .toDF("doc", "body"), "doc", "body", dir)
      // first indexed batch: unrelated doc — creates the table. A delta-only
      // bootstrap would leave h1/h2 invisible to every later band join.
      val unrelated = Seq(graft.pipeline.IncDedupFixture.batch2(5)) // x6
      IncrementalDedup.dedupeAndCommitIndexed(
        unrelated.toDF("doc", "body"), "doc", "body", dir, tbl)
      val ids = spark.table(tbl).select("id").distinct().as[String].collect().toSet
      assert(Set("h1", "h2", "x6").subsetOf(ids), s"bootstrap missing history: $ids")
      // second indexed batch: a NEAR-dup of pre-table history doc h2 — it
      // must still be caught through the table-backed band join
      val nearH2 = Seq("z2" -> graft.pipeline.IncDedupFixture.batch2(1)._2)
      val led = IncrementalDedup.dedupeAndCommitIndexed(
        nearH2.toDF("doc", "body"), "doc", "body", dir, tbl)
      val row = led.collect().head
      assert(!row.getAs[Boolean]("kept") &&
        row.getAs[String]("stage") == "near_dup_hist" &&
        row.getAs[String]("reason") == "h2")
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
