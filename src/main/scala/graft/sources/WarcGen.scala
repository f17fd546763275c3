package graft.sources

import java.io.{ByteArrayOutputStream, File, FileOutputStream}
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.util.zip.{Deflater, GZIPOutputStream}

/**
 * Deterministic WARC fixture/corpus writer — the test-side encoder for
 * [[Warc]], sharing no code with the parser beyond the WARC spec itself
 * (the PdfGen/PdfParser pattern: independent encoder + decoder agreeing
 * pins both). All output is byte-deterministic: the JDK gzip header is the
 * static 10-byte form (MTIME=0) and DEFLATE at a fixed level is a pure
 * function of its input, so fixture files hash identically across runs.
 */
object WarcGen {

  private val CRLF = "\r\n"

  /** One WARC/1.0 record: version line, headers + computed Content-Length,
    * blank line, block, two CRLFs. */
  def record(warcType: String, headers: Seq[(String, String)], block: Array[Byte],
      version: String = "WARC/1.0", contentLength: Option[Long] = None,
      crlf: String = CRLF): Array[Byte] = {
    val sb = new StringBuilder(256)
    sb.append(version).append(crlf)
    sb.append("WARC-Type: ").append(warcType).append(crlf)
    headers.foreach { case (k, v) => sb.append(k).append(": ").append(v).append(crlf) }
    contentLength.orElse(Some(block.length.toLong)).foreach { len =>
      sb.append("Content-Length: ").append(len).append(crlf)
    }
    sb.append(crlf)
    val head = sb.toString.getBytes(ISO_8859_1)
    val out = new ByteArrayOutputStream(head.length + block.length + 4)
    out.write(head); out.write(block)
    out.write(crlf.getBytes(ISO_8859_1)); out.write(crlf.getBytes(ISO_8859_1))
    out.toByteArray
  }

  /** A stored HTTP response message (status head + body). */
  def httpResponse(status: Int, reason: String, headers: Seq[(String, String)],
      body: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder(128)
    sb.append("HTTP/1.1 ").append(status).append(' ').append(reason).append(CRLF)
    headers.foreach { case (k, v) => sb.append(k).append(": ").append(v).append(CRLF) }
    if (!headers.exists(_._1.equalsIgnoreCase("content-length")))
      sb.append("Content-Length: ").append(body.length).append(CRLF)
    sb.append(CRLF)
    val head = sb.toString.getBytes(ISO_8859_1)
    val out = new ByteArrayOutputStream(head.length + body.length)
    out.write(head); out.write(body)
    out.toByteArray
  }

  /** A full `response` record with the usual named headers. */
  def responseRecord(uri: String, date: String, status: Int, contentType: String,
      body: Array[Byte], extraHttp: Seq[(String, String)] = Nil): Array[Byte] = {
    val http = httpResponse(status, if (status == 200) "OK" else "Err",
      ("Content-Type" -> contentType) +: extraHttp, body)
    record("response", Seq(
      "WARC-Target-URI" -> uri,
      "WARC-Date" -> date,
      "WARC-Record-ID" -> s"<urn:uuid:${idFor(uri, date)}>",
      "Content-Type" -> "application/http; msgtype=response"), http)
  }

  /** Deterministic pseudo-uuid from the record identity. */
  private def idFor(uri: String, date: String): String = {
    val h = graft.ops.TextOps.fnv64(uri + "|" + date)
    f"${h}%016x-0000-0000-0000-000000000000"
  }

  /** One gzip member (the per-record `.warc.gz` layout). Deterministic. */
  def gzMember(bytes: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new GZIPOutputStream(out, 64 * 1024) {
      `def`.setLevel(Deflater.DEFAULT_COMPRESSION)
    }
    gz.write(bytes); gz.finish(); gz.close()
    out.toByteArray
  }

  def gzConcat(records: Seq[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach(r => out.write(gzMember(r)))
    out.toByteArray
  }

  /** RFC 9112 chunked encoding of a body, two chunks. */
  def chunk(body: Array[Byte]): Array[Byte] = {
    val cut = body.length / 2
    val out = new ByteArrayOutputStream(body.length + 32)
    def one(off: Int, len: Int): Unit = {
      out.write(s"${len.toHexString}$CRLF".getBytes(ISO_8859_1))
      out.write(body, off, len)
      out.write(CRLF.getBytes(ISO_8859_1))
    }
    one(0, cut); one(cut, body.length - cut)
    out.write(s"0$CRLF$CRLF".getBytes(ISO_8859_1))
    out.toByteArray
  }

  // ------------------------------------------------------------- fixtures

  val D1 = "2024-01-15T10:30:00Z"
  val D2 = "2024-01-15T10:31:00Z"
  val D3 = "2024-01-15T10:32:00Z"

  val BodyA = "<html><body><p>Alpha page body.</p></body></html>"
  val BodyB = "<html><body><p>Beta page body, stored verbatim.</p></body></html>"
  val BodyC = "<html><body><p>Chunked transfer body arrives whole.</p></body></html>"
  val BodyD = "<html><body><p>Gzip content-encoding body inflates.</p></body></html>"
  val BodyE = "<html><body><p>Salvaged record after a broken one.</p></body></html>"
  val BodyTrunc = "<html><body><p>Declared-truncated capture.</p></body></html>"
  val ResourceText = "plain resource text, no HTTP envelope"
  val ConvText = "converted text rendition"

  /** The frozen fixture corpus: file name → bytes. Each case is its own
    * file so the `file` column doubles as the test-case key. */
  def fixtureFiles: Seq[(String, Array[Byte])] = {
    val warcinfo = record("warcinfo", Seq(
      "WARC-Date" -> D1,
      "WARC-Record-ID" -> "<urn:uuid:00000000-0000-0000-0000-000000000001>",
      "Content-Type" -> "application/warc-fields"),
      s"software: graft-warcgen${CRLF}format: WARC File Format 1.0$CRLF".getBytes(ISO_8859_1))
    val request = record("request", Seq(
      "WARC-Target-URI" -> "https://warc.example.com/alpha",
      "WARC-Date" -> D1,
      "WARC-Record-ID" -> "<urn:uuid:00000000-0000-0000-0000-000000000002>",
      "Content-Type" -> "application/http; msgtype=request"),
      s"GET /alpha HTTP/1.1${CRLF}Host: warc.example.com$CRLF$CRLF".getBytes(ISO_8859_1))

    val plain = Seq(warcinfo, request,
      responseRecord("https://warc.example.com/alpha", D1, 200,
        "text/html; charset=utf-8", BodyA.getBytes(UTF_8)))

    val multi = Seq(
      responseRecord("https://warc.example.com/beta", D1, 200, "text/html", BodyB.getBytes(UTF_8)),
      responseRecord("https://warc.example.com/gone", D2, 404, "text/html",
        "<html><body>gone</body></html>".getBytes(UTF_8)),
      responseRecord("https://warc.example.com/gamma", D3, 200, "text/html", BodyA.getBytes(UTF_8)))

    val chunked = Seq(responseRecord("https://warc.example.com/chunked", D2, 200,
      "text/html", chunk(BodyC.getBytes(UTF_8)),
      extraHttp = Seq("Transfer-Encoding" -> "chunked")))

    val gzbody = Seq(responseRecord("https://warc.example.com/gzbody", D2, 200,
      "text/html", gzMember(BodyD.getBytes(UTF_8)),
      extraHttp = Seq("Content-Encoding" -> "gzip")))

    // record 0 carries no Content-Length (unframeable → dropped + resync);
    // record 1 must still parse
    val badlen = {
      val broken = record("response", Seq(
        "WARC-Target-URI" -> "https://warc.example.com/broken",
        "WARC-Date" -> D1,
        "Content-Type" -> "application/http; msgtype=response"),
        httpResponse(200, "OK", Seq("Content-Type" -> "text/html"), BodyA.getBytes(UTF_8)),
        contentLength = Some(-1L)) // writes "Content-Length: -1"
      val good = responseRecord("https://warc.example.com/salvaged", D2, 200,
        "text/html", BodyE.getBytes(UTF_8))
      concat(Seq(broken, good))
    }

    // declared Content-Length overruns the file → truncated=true
    val shorttail = {
      val full = responseRecord("https://warc.example.com/short", D3, 200,
        "text/html", BodyA.getBytes(UTF_8))
      java.util.Arrays.copyOf(full, full.length - 24)
    }

    val resource = Seq(
      record("resource", Seq(
        "WARC-Target-URI" -> "https://warc.example.com/robots.txt",
        "WARC-Date" -> D1,
        "WARC-Record-ID" -> "<urn:uuid:00000000-0000-0000-0000-000000000003>",
        "Content-Type" -> "text/plain"), ResourceText.getBytes(UTF_8)),
      record("conversion", Seq(
        "WARC-Target-URI" -> "https://warc.example.com/alpha",
        "WARC-Date" -> D2,
        "WARC-Record-ID" -> "<urn:uuid:00000000-0000-0000-0000-000000000004>",
        "Content-Type" -> "text/plain"), ConvText.getBytes(UTF_8)))

    val revisit = Seq(
      record("revisit", Seq(
        "WARC-Target-URI" -> "https://warc.example.com/alpha",
        "WARC-Date" -> D3,
        "WARC-Record-ID" -> "<urn:uuid:00000000-0000-0000-0000-000000000005>",
        "WARC-Refers-To" -> "<urn:uuid:00000000-0000-0000-0000-000000000002>",
        "Content-Type" -> "message/http"), Array.emptyByteArray),
      record("response", Seq(
        "WARC-Target-URI" -> "https://warc.example.com/cutoff",
        "WARC-Date" -> D3,
        "WARC-Record-ID" -> s"<urn:uuid:${idFor("https://warc.example.com/cutoff", D3)}>",
        "WARC-Truncated" -> "length",
        "Content-Type" -> "application/http; msgtype=response"),
        httpResponse(200, "OK", Seq("Content-Type" -> "text/html"), BodyTrunc.getBytes(UTF_8))))

    val lfonly = record("response", Seq(
      "WARC-Target-URI" -> "https://warc.example.com/lfonly",
      "WARC-Date" -> D2,
      "WARC-Record-ID" -> "<urn:uuid:00000000-0000-0000-0000-000000000006>",
      "Content-Type" -> "application/http; msgtype=response"),
      httpResponse(200, "OK", Seq("Content-Type" -> "text/html"), BodyB.getBytes(UTF_8)),
      crlf = "\n")

    val pdfresp = Seq(responseRecord("https://warc.example.com/report.pdf", D3, 200,
      "application/pdf", PdfGen.fixtureDocs.toMap.apply("plain")))

    Seq(
      "plain.warc" -> concat(plain),
      "multi.warc.gz" -> gzConcat(multi),
      "chunked.warc.gz" -> gzConcat(chunked),
      "gzbody.warc.gz" -> gzConcat(gzbody),
      "badlen.warc" -> badlen,
      "shorttail.warc" -> shorttail,
      "resource.warc" -> concat(resource),
      "revisit.warc.gz" -> gzConcat(revisit),
      "lfonly.warc" -> lfonly,
      "notwarc.warc" -> "this is not a warc file at all\njust some text\n".getBytes(UTF_8),
      "pdfresp.warc.gz" -> gzConcat(pdfresp))
  }

  private def concat(records: Seq[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach(out.write)
    out.toByteArray
  }

  /** Write the fixture corpus under `dir` (idempotent by byte determinism). */
  def writeFixture(dir: File): Unit = {
    dir.mkdirs()
    fixtureFiles.foreach { case (name, bytes) =>
      val f = new File(dir, name)
      if (!f.exists() || f.length() != bytes.length) {
        val out = new FileOutputStream(f)
        try out.write(bytes) finally out.close()
      }
    }
  }

  // ------------------------------------------------------- synthetic corpus

  /** Shard the first `n` PagesGen pages into `shards` per-record-gzip WARC
    * files — the Common-Crawl layout for the round-trip oracle. Each shard
    * leads with a warcinfo record and plants one request + one 404 record
    * to exercise ingest filtering. Deterministic: page `i` goes to shard
    * `i % shards`, bytes are a pure function of (Seed, i). */
  def writeCorpus(dir: File, n: Int, shards: Int): Unit =
    (0 until shards).foreach(s => writeCorpusShard(dir, n, shards, s))

  /** One shard — safe to call concurrently from executor tasks (one task
    * per shard is the parallel corpus-write path in WarcBench). */
  def writeCorpusShard(dir: File, n: Int, shards: Int, s: Int): Unit = {
    dir.mkdirs()
    val fmt = java.time.format.DateTimeFormatter.ISO_INSTANT
    locally {
      val f = new File(dir, f"shard-$s%05d.warc.gz")
      if (!f.exists()) {
        val out = new ByteArrayOutputStream(1 << 20)
        val warcinfo = record("warcinfo", Seq(
          "WARC-Date" -> D1,
          "WARC-Record-ID" -> f"<urn:uuid:00000000-0000-0000-0000-0000000$s%05d>",
          "Content-Type" -> "application/warc-fields"),
          s"software: graft-warcgen$CRLF".getBytes(ISO_8859_1))
        out.write(gzMember(warcinfo))
        out.write(gzMember(record("request", Seq(
          "WARC-Target-URI" -> s"https://corpus.example.com/shard-$s",
          "WARC-Date" -> D1,
          "Content-Type" -> "application/http; msgtype=request"),
          s"GET /shard-$s HTTP/1.1$CRLF$CRLF".getBytes(ISO_8859_1))))
        out.write(gzMember(responseRecord(s"https://corpus.example.com/missing-$s", D1,
          404, "text/html", "<html><body>404</body></html>".getBytes(UTF_8))))
        var i = s
        while (i < n) {
          val page = graft.pipeline.PagesGen.makePage(i.toLong)
          val date = fmt.format(java.time.Instant.ofEpochMilli(page.warc_ts.getTime))
          out.write(gzMember(responseRecord(page.url, date, 200,
            "text/html; charset=utf-8", page.html)))
          i += shards
        }
        val fo = new FileOutputStream(f)
        try fo.write(out.toByteArray) finally fo.close()
      }
    }
  }
}
