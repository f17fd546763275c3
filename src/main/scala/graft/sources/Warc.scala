package graft.sources

import java.io.{ByteArrayInputStream, EOFException, InputStream, PushbackInputStream}
import java.util.zip.{GZIPInputStream, Inflater, InflaterInputStream}

/**
 * One parsed WARC record (ISO 28500 / WARC 1.0–1.1), the on-disk unit of a
 * Common-Crawl-style crawl archive. `payload` is the HTTP message BODY for
 * `application/http` records (status/headers already consumed, chunked
 * transfer decoded, gzip/deflate content-encoding inflated) and the raw
 * record block otherwise, so the extraction pipeline can route it through
 * the same magic-byte dispatch as any fetched blob.
 *
 * The reference fetches live pages (`/root/reference/src/fetchers/`); at
 * 10^12-document scale the same pages arrive as WARC shards instead, which
 * is why this leg exists beyond the reference surface.
 */
final case class WarcRecord(
    warcType: String,
    targetUri: String,
    date: String,
    recordId: String,
    contentType: String,
    httpStatus: Int,
    httpContentType: String,
    payload: Array[Byte],
    truncated: Boolean)

/**
 * From-scratch streaming WARC/1.0–1.1 parser. Design constraints, in order:
 *
 *  - **Bounded memory per record, not per file.** A shard is ~1 GiB; the
 *    parser holds one record block at a time, capped at [[Warc.MaxPayload]]
 *    (oversized blocks are truncated with `truncated=true` and the
 *    remainder skipped — no silent caps).
 *  - **Never throws on data.** Malformed headers, a missing
 *    Content-Length, a short final record, garbage between records, or a
 *    corrupt gzip member end the record (or the stream) with what was
 *    salvaged; a crawl archive always contains a few broken records and one
 *    of them must not kill a partition.
 *  - **Streaming.** Input is an `InputStream`; `.warc.gz` shards use
 *    per-record gzip members (the Common Crawl layout), which
 *    `GZIPInputStream` reads as one concatenated stream — record framing
 *    comes from `Content-Length`, not member boundaries.
 *
 * HTTP payload handling for `application/http` records: status line and
 * headers are parsed, `Transfer-Encoding: chunked` is de-chunked and
 * `Content-Encoding: gzip|deflate` inflated (both bounded by
 * [[Warc.MaxPayload]]); anything malformed degrades to the raw bytes with
 * `truncated=true` rather than dropping the record.
 */
object Warc {

  /** Per-record payload cap — bounds executor memory against inflate bombs
    * and absurd Content-Length values (same posture as PdfParser's budgets). */
  val MaxPayload: Int = 64 * 1024 * 1024

  /** Caps on the header block and on resync scanning after a malformed
    * record, so a garbage file costs bounded work. */
  val MaxHeaderBytes: Int = 64 * 1024
  val MaxResyncLines: Int = 100000

  /** Lazily parse every record in a (possibly multi-member gzip) WARC
    * stream. The iterator owns `in` and closes it at exhaustion. */
  def records(in: InputStream): Iterator[WarcRecord] =
    records(in, keepPayload = true)

  /** `keepPayload=false` skips payload buffering entirely (bytes are read
    * and discarded) — the column-pruning path for scans that never touch
    * the `payload` column. */
  def records(in: InputStream, keepPayload: Boolean): Iterator[WarcRecord] = {
    val stream = unGzip(in)
    if (stream == null) { closeQuietly(in); return Iterator.empty }
    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = null
      private var done = false

      private def advance(): Unit = {
        if (done || nextRec != null) return
        nextRec =
          try readRecord(stream, keepPayload).orNull
          catch { case _: Throwable => null } // corrupt gzip tail, IO — stop
        if (nextRec == null) { done = true; closeQuietly(stream) }
      }

      def hasNext: Boolean = { advance(); nextRec != null }
      def next(): WarcRecord = {
        advance()
        if (nextRec == null) throw new NoSuchElementException("WARC stream exhausted")
        val r = nextRec; nextRec = null; r
      }
    }
  }

  /** Convenience for tests and small blobs. */
  def parseAll(bytes: Array[Byte]): Vector[WarcRecord] =
    records(new ByteArrayInputStream(bytes)).toVector

  // ---------------------------------------------------------------- framing

  /** Sniff the gzip magic; wrap if present. Returns null on empty input. */
  private def unGzip(in: InputStream): InputStream = {
    val pb = new PushbackInputStream(in, 2)
    val b0 = pb.read()
    if (b0 < 0) return null
    val b1 = pb.read()
    if (b1 >= 0) pb.unread(b1)
    pb.unread(b0)
    if (b0 == 0x1f && b1 == 0x8b) new GZIPInputStream(pb, 64 * 1024) else pb
  }

  /** One record, or None at clean EOF. Malformed framing attempts a
    * bounded resync to the next `WARC/` version line; unframeable records
    * (no parsable Content-Length) are dropped in a bounded loop, not
    * recursion — an adversarial file of nothing but bad records costs
    * linear work and constant stack. */
  private def readRecord(in: InputStream, keepPayload: Boolean): Option[WarcRecord] = {
    var headers: Map[String, String] = null
    var len = -1L
    var dropped = 0
    while (len < 0) {
      var version = readLine(in)
      var resync = 0
      // skip blank separator lines / garbage between records (bounded)
      while (version != null && !version.startsWith("WARC/") && resync < MaxResyncLines) {
        version = readLine(in); resync += 1
      }
      if (version == null || !version.startsWith("WARC/")) return None
      headers = readHeaders(in)
      if (headers == null) return None
      len = headers.get("content-length").flatMap(v => v.toLongOption).getOrElse(-1L)
      if (len < 0) {
        dropped += 1
        if (dropped > MaxResyncLines) return None
      }
    }

    val declaredTruncated = headers.contains("warc-truncated")
    val keep = math.min(len, MaxPayload.toLong).toInt
    val block = if (keepPayload) new Array[Byte](keep) else null
    var got = 0
    var eof = false
    while (got < keep && !eof) {
      val n =
        if (keepPayload) in.read(block, got, keep - got)
        else skipAsRead(in, keep - got)
      if (n < 0) eof = true else got += n
    }
    if (!eof && len > keep) eof = !skipFully(in, len - keep)
    val capTruncated = len > keep || (eof && got < keep)
    val body =
      if (!keepPayload) Array.emptyByteArray
      else if (got == keep) block
      else java.util.Arrays.copyOf(block, got)

    val rec = buildRecord(headers, body, keepPayload,
      truncated = declaredTruncated || capTruncated)
    Some(rec)
  }

  private def buildRecord(headers: Map[String, String], body: Array[Byte],
      keepPayload: Boolean, truncated: Boolean): WarcRecord = {
    val wtype = headers.getOrElse("warc-type", "")
    val ctype = headers.getOrElse("content-type", "")
    // only stored RESPONSES get the HTTP layer peeled; requests keep their
    // raw message (there is no body to surface, the message IS the data)
    val isHttpResponse = ctype.toLowerCase.startsWith("application/http") &&
      (ctype.toLowerCase.contains("msgtype=response") ||
        (body != null && body.length >= 5 &&
          body(0) == 'H' && body(1) == 'T' && body(2) == 'T' && body(3) == 'P' && body(4) == '/'))
    if (isHttpResponse && keepPayload && body.length > 0) {
      val (status, httpCt, payload, httpTrunc) = parseHttp(body)
      WarcRecord(wtype, stripAngles(headers.getOrElse("warc-target-uri", "")),
        headers.getOrElse("warc-date", ""),
        stripAngles(headers.getOrElse("warc-record-id", "")),
        ctype, status, httpCt, payload, truncated || httpTrunc)
    } else {
      // keepPayload=false still surfaces the status line cheaply? No — the
      // bytes were skipped; pruned scans that need http_status must keep
      // payload in the read schema (the reader handles this dependency).
      WarcRecord(wtype, stripAngles(headers.getOrElse("warc-target-uri", "")),
        headers.getOrElse("warc-date", ""),
        stripAngles(headers.getOrElse("warc-record-id", "")),
        ctype, -1, "", if (body == null) Array.emptyByteArray else body, truncated)
    }
  }

  /** WARC-Record-ID / Target-URI are often written as `<urn:...>`. */
  private def stripAngles(s: String): String =
    if (s.length >= 2 && s.charAt(0) == '<' && s.charAt(s.length - 1) == '>')
      s.substring(1, s.length - 1)
    else s

  /** Header block: `Name: value` lines to the first blank line, LWS
    * continuations folded, names lowercased. Null on cap breach / EOF. */
  private def readHeaders(in: InputStream): Map[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var lastKey: String = null
    var budget = MaxHeaderBytes
    var line = readLine(in)
    while (line != null && line.nonEmpty) {
      budget -= line.length + 2
      if (budget < 0) return null
      if ((line.charAt(0) == ' ' || line.charAt(0) == '\t') && lastKey != null) {
        out(lastKey) = out(lastKey) + " " + line.trim
      } else {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val k = line.substring(0, colon).trim.toLowerCase
          val v = line.substring(colon + 1).trim
          if (!out.contains(k)) out(k) = v // first occurrence wins
          lastKey = k
        }
      }
      line = readLine(in)
    }
    if (line == null) null else out.toMap
  }

  /** One header line (CRLF or bare LF), capped; null at EOF before any byte. */
  private def readLine(in: InputStream): String = {
    val sb = new java.lang.StringBuilder(80)
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') {
      if (sb.length < MaxHeaderBytes) sb.append(b.toChar)
      b = in.read()
    }
    var n = sb.length
    while (n > 0 && sb.charAt(n - 1) == '\r') n -= 1
    sb.setLength(n)
    sb.toString
  }

  private def skipAsRead(in: InputStream, n: Int): Int = {
    val s = in.skip(n.toLong)
    if (s > 0) s.toInt
    else { val b = in.read(); if (b < 0) -1 else 1 } // skip() may return 0 legally
  }

  private def skipFully(in: InputStream, n: Long): Boolean = {
    var left = n
    while (left > 0) {
      val s = in.skip(left)
      if (s > 0) left -= s
      else {
        val b = in.read()
        if (b < 0) return false
        left -= 1
      }
    }
    true
  }

  private def closeQuietly(in: InputStream): Unit =
    try in.close() catch { case _: Throwable => () }

  // ------------------------------------------------------------ HTTP layer

  /** Parse the stored HTTP message: (status, content-type, body, truncated).
    * Requests get status -1 and their raw body. Malformed messages degrade
    * to the raw block with truncated=true. */
  private[sources] def parseHttp(block: Array[Byte]): (Int, String, Array[Byte], Boolean) = {
    val headerEnd = findHeaderEnd(block)
    if (headerEnd < 0) return (-1, "", block, true)
    val head = new String(block, 0, headerEnd, java.nio.charset.StandardCharsets.ISO_8859_1)
    val lines = head.split("\r?\n")
    if (lines.isEmpty) return (-1, "", block, true)
    val statusLine = lines(0)
    val status =
      if (statusLine.startsWith("HTTP/")) {
        val parts = statusLine.split("\\s+", 3)
        if (parts.length >= 2) parts(1).toIntOption.getOrElse(-1) else -1
      } else -1
    var contentType = ""
    var chunked = false
    var encoding = ""
    var i = 1
    while (i < lines.length) {
      val colon = lines(i).indexOf(':')
      if (colon > 0) {
        val k = lines(i).substring(0, colon).trim.toLowerCase
        val v = lines(i).substring(colon + 1).trim
        k match {
          case "content-type"      => if (contentType.isEmpty) contentType = v
          case "transfer-encoding" => chunked = v.toLowerCase.contains("chunked")
          case "content-encoding"  => encoding = v.toLowerCase
          case _                   => ()
        }
      }
      i += 1
    }
    var body = java.util.Arrays.copyOfRange(block, skipBlank(block, headerEnd), block.length)
    var truncated = false
    if (chunked) {
      deChunk(body) match {
        case Some(b) => body = b
        case None    => truncated = true // keep raw chunked bytes, flagged
      }
    }
    if (encoding == "gzip" || encoding == "x-gzip" || encoding == "deflate") {
      inflateBounded(body, gzip = encoding != "deflate") match {
        case Some(b) => body = b
        case None    => truncated = true
      }
    }
    (status, contentType, body, truncated)
  }

  /** Index of the first CRLFCRLF (or LFLF) terminator, -1 if absent. */
  private def findHeaderEnd(b: Array[Byte]): Int = {
    var i = 0
    while (i < b.length) {
      if (b(i) == '\n') {
        var j = i + 1
        if (j < b.length && b(j) == '\r') j += 1
        if (j < b.length && b(j) == '\n') return i
      }
      i += 1
    }
    -1
  }

  private def skipBlank(b: Array[Byte], headerEnd: Int): Int = {
    var i = headerEnd
    // headerEnd points at the \n ending the last header line; consume the
    // blank line that follows (\r?\n)
    i += 1
    if (i < b.length && b(i) == '\r') i += 1
    if (i < b.length && b(i) == '\n') i += 1
    i
  }

  /** RFC 9112 §7.1 chunked decoding, bounded by MaxPayload. None on any
    * malformation (caller keeps the raw bytes). */
  private[sources] def deChunk(body: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(math.min(body.length, 1 << 16))
    var i = 0
    var loop = true
    while (loop) {
      // chunk-size line
      val lineEnd = indexOfLf(body, i)
      if (lineEnd < 0) return None
      var line = new String(body, i, lineEnd - i, java.nio.charset.StandardCharsets.ISO_8859_1).trim
      val semi = line.indexOf(';') // chunk extensions — ignored
      if (semi >= 0) line = line.substring(0, semi).trim
      val size =
        try java.lang.Long.parseLong(line, 16)
        catch { case _: NumberFormatException => return None }
      if (size < 0 || size > MaxPayload || out.size().toLong + size > MaxPayload) return None
      i = lineEnd + 1
      if (size == 0) loop = false // trailers ignored
      else {
        if (i + size > body.length) return None
        out.write(body, i, size.toInt)
        i += size.toInt
        // consume chunk-terminating CRLF
        if (i < body.length && body(i) == '\r') i += 1
        if (i < body.length && body(i) == '\n') i += 1
      }
    }
    Some(out.toByteArray)
  }

  private def indexOfLf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i < b.length) { if (b(i) == '\n') return i; i += 1 }
    -1
  }

  /** Bounded gzip/deflate inflate; handles raw-deflate servers that lie
    * about zlib wrapping. None on corrupt input or cap breach. */
  private[sources] def inflateBounded(body: Array[Byte], gzip: Boolean): Option[Array[Byte]] =
    try {
      val base: InputStream =
        if (gzip) new GZIPInputStream(new ByteArrayInputStream(body), 64 * 1024)
        else new InflaterInputStream(new ByteArrayInputStream(body), new Inflater())
      val out = new java.io.ByteArrayOutputStream(math.min(body.length * 4, 1 << 20))
      val buf = new Array[Byte](64 * 1024)
      var n = base.read(buf)
      while (n >= 0) {
        if (out.size() + n > MaxPayload) return None
        out.write(buf, 0, n)
        n = base.read(buf)
      }
      Some(out.toByteArray)
    } catch {
      case _: java.util.zip.ZipException if !gzip =>
        // retry as raw deflate (nowrap) — a known real-world server quirk
        try {
          val inf = new Inflater(true)
          inf.setInput(body)
          val out = new java.io.ByteArrayOutputStream(math.min(body.length * 4, 1 << 20))
          val buf = new Array[Byte](64 * 1024)
          while (!inf.finished() && !inf.needsInput()) {
            val n = inf.inflate(buf)
            if (n == 0 && !inf.finished()) return None
            if (out.size() + n > MaxPayload) return None
            out.write(buf, 0, n)
          }
          // needsInput before finished = truncated stream; a partial body
          // must not pass as complete (the gzip path flags the same via EOF)
          if (!inf.finished() || out.size() == 0) None else Some(out.toByteArray)
        } catch { case _: Throwable => None }
      case _: EOFException => None
      case _: Throwable    => None
    }
}
