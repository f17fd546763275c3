package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** WARC parser + DataSource V2 reader: framing, gzip members, HTTP layer
  * (chunked / content-encoding), salvage-never-throw behavior, column
  * pruning, bin-packed partitions, and byte-identical round-trip through
  * WarcGen → format("warc") → extraction. */
class WarcSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val fixtures: Map[String, Array[Byte]] = WarcGen.fixtureFiles.toMap

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .appName("graft-warc-test")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // ------------------------------------------------------------ parser core

  test("plain uncompressed warc: warcinfo + request + response parse in order") {
    val recs = Warc.parseAll(fixtures("plain.warc"))
    assert(recs.map(_.warcType) == Vector("warcinfo", "request", "response"))
    val resp = recs(2)
    assert(resp.targetUri == "https://warc.example.com/alpha")
    assert(resp.httpStatus == 200)
    assert(resp.httpContentType == "text/html; charset=utf-8")
    assert(new String(resp.payload, UTF_8) == WarcGen.BodyA)
    assert(!resp.truncated)
    // request records keep their raw HTTP message as payload, status -1
    assert(recs(1).httpStatus == -1)
    assert(new String(recs(1).payload, UTF_8).startsWith("GET /alpha HTTP/1.1"))
  }

  test("per-record gzip members read as one stream; framing from Content-Length") {
    val recs = Warc.parseAll(fixtures("multi.warc.gz"))
    assert(recs.length == 3)
    assert(recs.map(_.httpStatus) == Vector(200, 404, 200))
    assert(recs.map(_.targetUri) == Vector(
      "https://warc.example.com/beta",
      "https://warc.example.com/gone",
      "https://warc.example.com/gamma"))
    assert(new String(recs(0).payload, UTF_8) == WarcGen.BodyB)
  }

  test("chunked transfer-encoding is de-chunked") {
    val recs = Warc.parseAll(fixtures("chunked.warc.gz"))
    assert(recs.length == 1)
    assert(new String(recs(0).payload, UTF_8) == WarcGen.BodyC)
    assert(!recs(0).truncated)
  }

  test("gzip content-encoding body is inflated (bounded)") {
    val recs = Warc.parseAll(fixtures("gzbody.warc.gz"))
    assert(recs.length == 1)
    assert(new String(recs(0).payload, UTF_8) == WarcGen.BodyD)
  }

  test("record without parsable Content-Length is dropped; next record salvaged") {
    val recs = Warc.parseAll(fixtures("badlen.warc"))
    assert(recs.length == 1)
    assert(recs(0).targetUri == "https://warc.example.com/salvaged")
    assert(new String(recs(0).payload, UTF_8) == WarcGen.BodyE)
  }

  test("declared length past EOF yields the salvaged prefix with truncated=true") {
    val recs = Warc.parseAll(fixtures("shorttail.warc"))
    assert(recs.length == 1)
    assert(recs(0).truncated)
    assert(new String(recs(0).payload, UTF_8).startsWith("<html><body>"))
  }

  test("revisit record (empty block) and WARC-Truncated header surface") {
    val recs = Warc.parseAll(fixtures("revisit.warc.gz"))
    assert(recs.length == 2)
    assert(recs(0).warcType == "revisit" && recs(0).payload.isEmpty)
    assert(recs(1).truncated, "WARC-Truncated: length must mark the record")
    assert(new String(recs(1).payload, UTF_8) == WarcGen.BodyTrunc)
  }

  test("resource and conversion records keep raw blocks") {
    val recs = Warc.parseAll(fixtures("resource.warc"))
    assert(recs.map(_.warcType) == Vector("resource", "conversion"))
    assert(new String(recs(0).payload, UTF_8) == WarcGen.ResourceText)
    assert(recs(0).recordId == "urn:uuid:00000000-0000-0000-0000-000000000003")
  }

  test("bare-LF line endings are tolerated") {
    val recs = Warc.parseAll(fixtures("lfonly.warc"))
    assert(recs.length == 1)
    assert(recs(0).httpStatus == 200)
    assert(new String(recs(0).payload, UTF_8) == WarcGen.BodyB)
  }

  test("non-WARC bytes parse to zero records, never throw") {
    assert(Warc.parseAll(fixtures("notwarc.warc")).isEmpty)
    assert(Warc.parseAll(Array.emptyByteArray).isEmpty)
    assert(Warc.parseAll("WARC/1.0\r\n".getBytes(UTF_8)).isEmpty) // headerless EOF
    assert(Warc.parseAll(WarcGen.gzMember("garbage not warc".getBytes(UTF_8))).isEmpty)
    // corrupt gzip after one good member: good record survives
    val mixed = fixtures("multi.warc.gz").take(200) ++ Array.fill[Byte](64)(0x55)
    Warc.parseAll(mixed) // must not throw
  }

  test("PDF response payload routes through scrapeAny like any fetched blob") {
    val recs = Warc.parseAll(fixtures("pdfresp.warc.gz"))
    assert(recs.length == 1)
    assert(recs(0).payload.take(4).sameElements("%PDF".getBytes(UTF_8)))
    val row = graft.pipeline.ExtractJob.scrapeAny(recs(0).targetUri, recs(0).payload)
    assert(row.status == "ok")
    assert(row.normalized_text.contains("The first body line."))
  }

  test("keepPayload=false skips payload bytes but keeps identity columns") {
    val recs = Warc.records(
      new java.io.ByteArrayInputStream(fixtures("multi.warc.gz")), keepPayload = false).toVector
    assert(recs.length == 3)
    assert(recs.forall(_.payload.isEmpty))
    assert(recs.map(_.targetUri).contains("https://warc.example.com/beta"))
    assert(recs.forall(_.httpStatus == -1)) // status lives in the skipped payload
  }

  test("chunked decoder rejects malformation and oversize without throwing") {
    assert(Warc.deChunk("zz\r\nbody".getBytes(UTF_8)).isEmpty)
    assert(Warc.deChunk("ffffffffff\r\n".getBytes(UTF_8)).isEmpty) // > MaxPayload
    assert(Warc.deChunk("5\r\nhello\r\n0\r\n\r\n".getBytes(UTF_8))
      .map(new String(_, UTF_8)).contains("hello"))
    // chunk extension ignored
    assert(Warc.deChunk("5;ext=1\r\nhello\r\n0\r\n\r\n".getBytes(UTF_8))
      .map(new String(_, UTF_8)).contains("hello"))
  }

  test("content-encoding inflate is bounded and corrupt-safe") {
    assert(Warc.inflateBounded(Array.fill[Byte](32)(0x7f), gzip = true).isEmpty)
    assert(Warc.inflateBounded(Array.fill[Byte](32)(0x7f), gzip = false).isEmpty)
    val gz = WarcGen.gzMember("roundtrip".getBytes(UTF_8))
    assert(Warc.inflateBounded(gz, gzip = true).map(new String(_, UTF_8)).contains("roundtrip"))
  }

  test("truncated raw-deflate body is rejected, not passed off as complete") {
    // raw deflate (nowrap) — servers that lie about zlib wrapping; the
    // first bytes aren't a zlib header so the wrapped parse throws and the
    // nowrap retry runs. A TRUNCATED stream must yield None (round-7 fix:
    // needsInput-before-finished used to return the partial output).
    val payload = ("the quick brown fox " * 200).getBytes(UTF_8)
    val deflater = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    deflater.setInput(payload); deflater.finish()
    val buf = new Array[Byte](1 << 16)
    val len = deflater.deflate(buf)
    deflater.end()
    val full = java.util.Arrays.copyOf(buf, len)
    assert(Warc.inflateBounded(full, gzip = false)
      .map(_.toSeq).contains(payload.toSeq)) // complete stream still inflates
    val truncated = java.util.Arrays.copyOf(full, len / 2)
    assert(Warc.inflateBounded(truncated, gzip = false).isEmpty,
      "partial deflate output must not pass as a complete payload")
  }

  // ------------------------------------------------------------- DSv2 reader

  private def writeFixtureDir(): java.io.File = {
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_warc_fixture")
    WarcGen.writeFixture(dir)
    dir
  }

  test("format(warc) reads the fixture dir with the declared schema") {
    val dir = writeFixtureDir()
    val df = spark.read.format("warc").load(dir.getAbsolutePath)
    assert(df.schema.fieldNames.toSeq == WarcDataSource.Schema.fieldNames.toSeq)
    val rows = df.collect()
    // 3 (plain) + 3 (multi) + 1 (chunked) + 1 (gzbody) + 1 (badlen) +
    // 1 (shorttail) + 2 (resource) + 2 (revisit) + 1 (lfonly) + 0 (notwarc)
    // + 1 (pdfresp)
    assert(rows.length == 16, s"got ${rows.length}")
    val byUrl = df.where("warc_type = 'response' AND http_status = 200")
      .selectExpr("url", "cast(payload as string) AS body").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byUrl("https://warc.example.com/chunked") == WarcGen.BodyC)
    assert(byUrl("https://warc.example.com/gzbody") == WarcGen.BodyD)
  }

  test("pruned scans (no payload-dependent columns) still produce correct keys") {
    val dir = writeFixtureDir()
    val urls = spark.read.format("warc").load(dir.getAbsolutePath)
      .where("warc_type = 'response'")
      .select("url").collect().map(_.getString(0)).toSet
    assert(urls.contains("https://warc.example.com/alpha"))
    assert(urls.contains("https://warc.example.com/cutoff"))
    // timestamp parse survives pruning
    val ts = spark.read.format("warc").load(dir.getAbsolutePath)
      .where("url = 'https://warc.example.com/alpha' AND warc_type = 'response'")
      .selectExpr("unix_micros(warc_ts)").collect()
    assert(ts.head.getLong(0) == java.time.Instant.parse(WarcGen.D1).getEpochSecond * 1000000L)
  }

  test("shards bin-pack into partitions; tiny target gives one file per partition") {
    val dir = Files.createTempDirectory("graft_warc_corpus").toFile
    WarcGen.writeCorpus(dir, n = 60, shards = 4)
    val before = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "1024") // smaller than any shard
      val parts = spark.read.format("warc").load(dir.getAbsolutePath).rdd.getNumPartitions
      assert(parts == 4, s"one atomic gzip shard per partition, got $parts")
      // A corpus smaller than maxPartitionBytes must NOT collapse to one
      // partition while cores sit idle: the bytes/core term keeps one bin
      // per available slot (the serial-scan regression the two-level bench
      // caught). Explicit minPartitionNum=1 restores full packing.
      spark.conf.set("spark.sql.files.maxPartitionBytes", s"${256L * 1024 * 1024}")
      val spread = spark.read.format("warc").load(dir.getAbsolutePath).rdd.getNumPartitions
      assert(spread == 4, s"bytes/core target spreads shards over cores, got $spread")
      spark.conf.set("spark.sql.files.minPartitionNum", "1")
      try {
        val packed = spark.read.format("warc").load(dir.getAbsolutePath).rdd.getNumPartitions
        assert(packed == 1, s"small shards bin-pack together, got $packed")
      } finally spark.conf.unset("spark.sql.files.minPartitionNum")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", before)
  }

  test("WARC round-trip: ingested pages are byte-identical to the source corpus") {
    val dir = Files.createTempDirectory("graft_warc_rt").toFile
    val n = 120
    WarcGen.writeCorpus(dir, n, shards = 4)
    val ingested = graft.pipeline.WarcIngest.pages(spark, dir.getAbsolutePath)
      .collect().map(p => p.url -> p).toMap
    // corpus pages + the planted 404s are filtered to exactly the n pages
    assert(ingested.size == n, s"got ${ingested.size}")
    (0 until n).foreach { i =>
      val src = graft.pipeline.PagesGen.makePage(i.toLong)
      val got = ingested(src.url)
      assert(java.util.Arrays.equals(got.html, src.html), s"html bytes differ at ${src.url}")
      assert(got.warc_ts.getTime == src.warc_ts.getTime, s"warc_ts differs at ${src.url}")
    }
  }

  test("extraction over WARC-ingested pages equals extraction over direct pages") {
    val dir = Files.createTempDirectory("graft_warc_ex").toFile
    val n = 60
    WarcGen.writeCorpus(dir, n, shards = 2)
    val viaWarc = graft.pipeline.ExtractJob
      .extract(graft.pipeline.WarcIngest.pages(spark, dir.getAbsolutePath), 4)
      .collect().map(r => r.url -> r.norm_hash).toMap
    val direct = graft.pipeline.ExtractJob
      .extract(graft.pipeline.PagesGen.generate(spark, n), 4)
      .collect().map(r => r.url -> r.norm_hash).toMap
    assert(viaWarc == direct)
  }
}
