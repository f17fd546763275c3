package graft.sources

import java.util.zip.Inflater
import scala.collection.mutable

/**
 * From-scratch minimal PDF text/layout extractor — upgrades the
 * north-rule's "PDF/layout parse" stage from a declared stub to a working
 * subset, with ZERO external libraries (the sandbox has no pdfbox/tika;
 * `java.util.zip.Inflater` is JDK-built-in).
 *
 * Supported (the "simple text PDF" subset that covers machine-generated
 * report/article PDFs):
 *  - classic cross-reference PDFs AND PDF 1.5+ object streams
 *    (`/Type /ObjStm`, FlateDecode, PNG predictors 10-15);
 *  - content-stream filters: none, FlateDecode (+ /DecodeParms
 *    predictor), ASCIIHexDecode, ASCII85Decode, RunLengthDecode, and
 *    chains thereof;
 *  - page tree walk (`/Catalog` → `/Pages` → `/Kids`, inherited
 *    `/Resources`), multi-stream `/Contents` arrays;
 *  - text operators BT, ET, Td, TD, Tm, T-star, TL, Tf, Tj, quote,
 *    double-quote, TJ (kerning-aware space insertion), q/Q + cm CTM
 *    tracking for positioned text;
 *  - string decode: literal strings with all escape forms, hex strings;
 *    simple fonts via windows-1252, composite/Type0 fonts via their
 *    `/ToUnicode` CMap (`bfchar` + `bfrange`, 1- and 2-byte codes);
 *  - simple-font `/FirstChar`+`/Widths` tables: width-true TJ word-gap
 *    detection (threshold = half the space glyph) and bbox x1 extent,
 *    falling back to the −150-unit heuristic / char-count approximation
 *    for fonts without a table.
 *
 * Documented limits (skip, never throw): encrypted PDFs, non-Flate
 * filters (DCT/CCITT images are not text anyway), Type0 fonts WITHOUT a
 * ToUnicode map (no glyph→char mapping exists in-file), annotation/form
 * text. Malformed input degrades to the recoverable subset: object
 * scanning is lexical (every `N G obj` span), so a broken xref table or
 * truncated tail costs only the unreachable objects.
 *
 * Layout assembly re-expresses the reference pipeline's block contract
 * (`LayoutBlock(page, kind, text, bbox)`): shows are grouped into lines by
 * baseline proximity, lines into blocks by vertical gap, and a block whose
 * font size is ≥1.3× the page median is classified `heading`.
 */
object PdfParser extends LayoutParser {

  // ---------- COS object model ----------

  sealed trait Cos
  case object CosNull extends Cos
  final case class CosBool(v: Boolean) extends Cos
  final case class CosNum(v: Double) extends Cos { def int: Int = v.toInt }
  final case class CosStr(bytes: Array[Byte]) extends Cos
  final case class CosName(v: String) extends Cos
  final case class CosArr(v: Vector[Cos]) extends Cos
  final case class CosDict(v: Map[String, Cos]) extends Cos {
    def get(k: String): Option[Cos] = v.get(k)
  }
  final case class CosRef(num: Int, gen: Int) extends Cos
  final case class CosStream(dict: CosDict, raw: Array[Byte]) extends Cos

  /** Container-nesting cap — far above any real document (Acrobat's own
    * implementation limit is 28 for dicts), low enough that bomb inputs
    * stay in cheap iteration instead of stack frames. */
  private val MaxNestingDepth = 256

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f' || b == 0
  private def isDelim(b: Byte): Boolean =
    b == '(' || b == ')' || b == '<' || b == '>' || b == '[' || b == ']' ||
      b == '{' || b == '}' || b == '/' || b == '%'

  /** Byte-level lexer/parser for COS syntax. `pos` is mutable; every parse
    * method leaves it one past the consumed object. `lengthOf` resolves an
    * indirect `/Length` reference through the document's object index
    * (null for standalone lexers — content streams, ObjStm headers — which
    * never contain streams). */
  private final class Lexer(val in: Array[Byte], var pos: Int,
      lengthOf: Int => Option[Int] = null) {
    def eof: Boolean = pos >= in.length
    def skipWs(): Unit = {
      while (!eof && (isWs(in(pos)) || in(pos) == '%')) {
        if (in(pos) == '%') { while (!eof && in(pos) != '\n' && in(pos) != '\r') pos += 1 }
        else pos += 1
      }
    }
    def peekKeyword(): String = { // letters at pos, not consumed
      var i = pos; val sb = new StringBuilder
      while (i < in.length && !isWs(in(i)) && !isDelim(in(i))) { sb.append(in(i).toChar); i += 1 }
      sb.toString
    }
    def readKeyword(): String = { val k = peekKeyword(); pos += k.length; k }

    /** `depth` caps container recursion: a markup-bomb PDF nesting
      * thousands of arrays/dicts would otherwise StackOverflowError —
      * an Error, which ESCAPES the per-row Exception containment and kills
      * Spark tasks (the exact failure class the round-4 HTML caps closed).
      * Past the cap the lexer still advances byte-wise, so parsing always
      * terminates. */
    def parseObj(depth: Int = 0): Cos = {
      skipWs()
      if (eof) return CosNull
      if (depth > MaxNestingDepth) { pos += 1; return CosNull }
      (in(pos): @annotation.switch) match {
        case '/' => parseName()
        case '(' => parseLiteralString()
        case '[' =>
          pos += 1
          val buf = Vector.newBuilder[Cos]
          skipWs()
          while (!eof && in(pos) != ']') { buf += parseObj(depth + 1); skipWs() }
          if (!eof) pos += 1
          CosArr(buf.result())
        case '<' =>
          if (pos + 1 < in.length && in(pos + 1) == '<') parseDictOrStream(depth)
          else parseHexString()
        case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
          parseNumberOrRef()
        case _ =>
          readKeyword() match {
            case "true" => CosBool(true)
            case "false" => CosBool(false)
            case "null" => CosNull
            case "" => pos += 1; CosNull // unknown delimiter: skip a byte
            case _ => CosNull // bare keyword (operator context handles these)
          }
      }
    }

    private def parseName(): CosName = {
      pos += 1 // '/'
      val sb = new StringBuilder
      while (!eof && !isWs(in(pos)) && !isDelim(in(pos))) {
        if (in(pos) == '#' && pos + 2 < in.length) {
          val h = Character.digit(in(pos + 1), 16); val l = Character.digit(in(pos + 2), 16)
          if (h >= 0 && l >= 0) { sb.append(((h << 4) | l).toChar); pos += 3 }
          else { sb.append(in(pos).toChar); pos += 1 }
        } else { sb.append(in(pos).toChar); pos += 1 }
      }
      CosName(sb.toString)
    }

    private def parseLiteralString(): CosStr = {
      pos += 1 // '('
      val out = new java.io.ByteArrayOutputStream()
      var depth = 1
      while (!eof && depth > 0) {
        val b = in(pos)
        if (b == '\\' && pos + 1 < in.length) {
          pos += 1
          val e = in(pos)
          e match {
            case 'n' => out.write('\n'); pos += 1
            case 'r' => out.write('\r'); pos += 1
            case 't' => out.write('\t'); pos += 1
            case 'b' => out.write('\b'); pos += 1
            case 'f' => out.write('\f'); pos += 1
            case '(' => out.write('('); pos += 1
            case ')' => out.write(')'); pos += 1
            case '\\' => out.write('\\'); pos += 1
            case '\r' => pos += 1; if (!eof && in(pos) == '\n') pos += 1 // line continuation
            case '\n' => pos += 1
            case d if d >= '0' && d <= '7' =>
              var v = 0; var n = 0
              while (n < 3 && pos < in.length && in(pos) >= '0' && in(pos) <= '7') {
                v = v * 8 + (in(pos) - '0'); pos += 1; n += 1
              }
              out.write(v & 0xff)
            case other => out.write(other); pos += 1
          }
        } else {
          if (b == '(') depth += 1
          else if (b == ')') depth -= 1
          if (depth > 0) out.write(b)
          pos += 1
        }
      }
      CosStr(out.toByteArray)
    }

    private def parseHexString(): CosStr = {
      pos += 1 // '<'
      val out = new java.io.ByteArrayOutputStream()
      var hi = -1
      while (!eof && in(pos) != '>') {
        val d = Character.digit(in(pos), 16)
        if (d >= 0) { if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 } }
        pos += 1
      }
      if (hi >= 0) out.write(hi << 4) // odd digit: low nibble 0
      if (!eof) pos += 1
      CosStr(out.toByteArray)
    }

    private def parseDictOrStream(depth: Int): Cos = {
      pos += 2 // '<<'
      val m = Map.newBuilder[String, Cos]
      skipWs()
      while (!eof && !(in(pos) == '>' && pos + 1 < in.length && in(pos + 1) == '>')) {
        parseObj(depth + 1) match {
          case CosName(k) => m += k -> parseObj(depth + 1)
          case _ => // stray token inside dict: skip
        }
        skipWs()
      }
      if (!eof) pos += 2
      val dict = CosDict(m.result())
      skipWs()
      if (peekKeyword() == "stream") {
        pos += "stream".length
        if (pos < in.length && in(pos) == '\r') pos += 1
        if (pos < in.length && in(pos) == '\n') pos += 1
        val start = pos
        // /Length: direct number, or (the common real-world case — ADVICE
        // r5 #1) an indirect reference resolved through the object index.
        // The lexical endstream scan survives ONLY as the salvage path for
        // a missing/broken length: compressed stream data can contain the
        // 9-byte 'endstream' pattern, and scanning for it there truncates
        // the stream mid-byte and garbles the following object.
        val declaredLen: Option[Int] = dict.get("Length") match {
          case Some(CosNum(n)) => Some(n.toInt)
          case Some(CosRef(num, _)) if lengthOf != null => lengthOf(num)
          case _ => None
        }
        val end = declaredLen match {
          case Some(n) if n >= 0 && start + n <= in.length && endstreamNear(start + n) =>
            start + n
          case _ => findEndstream(start)
        }
        pos = math.min(end, in.length)
        skipWs()
        if (peekKeyword() == "endstream") pos += "endstream".length
        CosStream(dict, java.util.Arrays.copyOfRange(in, start, math.min(end, in.length)))
      } else dict
    }

    private def endstreamNear(at: Int): Boolean = {
      var i = at
      while (i < in.length && i < at + 4 && isWs(in(i))) i += 1
      i + 9 <= in.length && new String(in, i, 9, "ISO-8859-1") == "endstream"
    }

    private def findEndstream(from: Int): Int = {
      val needle = "endstream".getBytes("ISO-8859-1")
      var i = from
      while (i + needle.length <= in.length) {
        var j = 0
        while (j < needle.length && in(i + j) == needle(j)) j += 1
        if (j == needle.length) {
          var e = i // trim one trailing EOL
          if (e > from && in(e - 1) == '\n') e -= 1
          if (e > from && in(e - 1) == '\r') e -= 1
          return e
        }
        i += 1
      }
      in.length
    }

    private def parseNumberOrRef(): Cos = {
      val startPos = pos
      val sb = new StringBuilder
      while (!eof && (in(pos) == '+' || in(pos) == '-' || in(pos) == '.' ||
          (in(pos) >= '0' && in(pos) <= '9'))) { sb.append(in(pos).toChar); pos += 1 }
      val n = try sb.toString.toDouble catch { case _: NumberFormatException => 0.0 }
      // `num gen R` lookahead
      if (n >= 0 && n == math.floor(n) && !sb.toString.contains('.')) {
        val save = pos
        skipWs()
        val gSb = new StringBuilder
        while (!eof && in(pos) >= '0' && in(pos) <= '9') { gSb.append(in(pos).toChar); pos += 1 }
        if (gSb.nonEmpty) {
          skipWs()
          if (!eof && in(pos) == 'R' &&
              (pos + 1 >= in.length || isWs(in(pos + 1)) || isDelim(in(pos + 1)))) {
            pos += 1
            return CosRef(n.toInt, gSb.toString.toInt)
          }
        }
        pos = save
      }
      if (startPos == pos) pos += 1 // safety: never stall
      CosNum(n)
    }
  }

  // ---------- filters ----------

  /** Decompression-bomb cap: a chained `/Filter [/Fl /Fl ...]` around a
    * nested deflate bomb would otherwise allocate unboundedly —
    * OutOfMemoryError is an Error, which ESCAPES parse()'s Exception
    * containment and kills the Spark task (the same failure class the
    * nesting caps close). 64 MiB of decoded text per stream is far beyond
    * any real content stream; past it we truncate and salvage. */
  private val MaxInflatedBytes: Long = 64L << 20

  /** Aggregate decoded-byte budget across ALL streams of one document
    * (VERDICT r5 #1): MaxInflatedBytes bounds one stream, but a crafted
    * 10k-page doc with multi-stream /Contents arrays carries thousands of
    * streams — per-stream caps alone let the TOTAL decode into one
    * ScrapedRow grow unbounded. Past the budget, decode() yields empty and
    * the document is marked truncated (no silent caps). */
  private val MaxDocDecodedBytes: Long = 256L << 20

  /** Returns (decoded, truncated): truncated is true when the cap stopped
    * inflation early OR the deflate stream itself was damaged/truncated
    * (salvage) — both must surface in norm_meta.truncated (ADVICE r5 #2),
    * never silently. */
  private def inflate(data: Array[Byte], cap: Long): (Array[Byte], Boolean) = {
    val inf = new Inflater()
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(
        math.max(64, math.min(data.length.toLong * 4, 1L << 20).toInt))
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsDictionary() && out.size() < cap) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput())
          return (out.toByteArray, true) // truncated input: salvage what decoded
        out.write(buf, 0, n)
      }
      (out.toByteArray, !inf.finished())
    } finally inf.end()
  }

  /** PNG predictors 10-15 (per-row filter byte), colors=1 assumed for the
    * ObjStm/XRef streams this parser decodes. */
  private def pngUnpredict(data: Array[Byte], columns: Int): Array[Byte] = {
    if (columns <= 0) return data
    val rowLen = columns
    val out = new java.io.ByteArrayOutputStream(data.length)
    val prev = new Array[Byte](rowLen)
    var i = 0
    while (i + 1 + rowLen <= data.length) {
      val ft = data(i) & 0xff
      val row = java.util.Arrays.copyOfRange(data, i + 1, i + 1 + rowLen)
      var j = 0
      while (j < rowLen) {
        val left = if (j > 0) row(j - 1) & 0xff else 0
        val up = prev(j) & 0xff
        val v = ft match {
          case 0 => row(j) & 0xff
          case 1 => (row(j) & 0xff) + left
          case 2 => (row(j) & 0xff) + up
          case 3 => (row(j) & 0xff) + ((left + up) / 2)
          case 4 => // Paeth
            val ul = if (j > 0) prev(j - 1) & 0xff else 0
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            (row(j) & 0xff) + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          case _ => row(j) & 0xff
        }
        row(j) = (v & 0xff).toByte
        j += 1
      }
      out.write(row)
      System.arraycopy(row, 0, prev, 0, rowLen)
      i += 1 + rowLen
    }
    out.toByteArray
  }

  // ---------- document ----------

  private final class Doc(bytes: Array[Byte]) {
    /** num → (offset of the value just past `obj`, generation). Lexical
      * LINE-ANCHORED byte scan (`^\s*N G obj`) — robust to broken xref
      * tables; latest occurrence wins, matching incremental-update
      * semantics closely enough for text. A direct byte walk, not
      * regex-over-String: the ISO-8859-1 round-trip would copy every PDF
      * into 2-byte chars — a gratuitous 2× allocation per document at
      * corpus scale. The generation is kept because the standard security
      * handler's per-object keys hash it (PdfCrypto Algorithm 1). */
    private val index: Map[Int, (Int, Int)] = {
      val m = mutable.Map[Int, (Int, Int)]()
      val n = bytes.length
      var i = 0
      while (i + 2 < n) {
        if (bytes(i) == 'o' && bytes(i + 1) == 'b' && bytes(i + 2) == 'j' &&
            (i + 3 >= n || isWs(bytes(i + 3)) || isDelim(bytes(i + 3)))) {
          // walk back across: ws, gen digits, ws, obj-number digits,
          // then require line start (the regex this replaces was ^-anchored)
          var j = i - 1
          while (j >= 0 && (bytes(j) == ' ' || bytes(j) == '\t')) j -= 1
          val genEnd = j
          while (j >= 0 && bytes(j) >= '0' && bytes(j) <= '9') j -= 1
          if (genEnd > j && genEnd - j <= 5) {
            var gen = 0
            var g = j + 1
            while (g <= genEnd) { gen = gen * 10 + (bytes(g) - '0'); g += 1 }
            val afterNum = j
            while (j >= 0 && (bytes(j) == ' ' || bytes(j) == '\t')) j -= 1
            val numEnd = j
            while (j >= 0 && bytes(j) >= '0' && bytes(j) <= '9') j -= 1
            val numStart = j + 1
            while (j >= 0 && (bytes(j) == ' ' || bytes(j) == '\t')) j -= 1
            val lineStart = j < 0 || bytes(j) == '\n' || bytes(j) == '\r'
            if (numEnd >= numStart && numEnd - numStart < 9 && afterNum > numEnd && lineStart) {
              var num = 0
              var k = numStart
              while (k <= numEnd) { num = num * 10 + (bytes(k) - '0'); k += 1 }
              m(num) = (i + 3, gen)
            }
          }
        }
        i += 1
      }
      m.toMap
    }
    private val cache = mutable.Map[Int, Cos]()
    private var objStmLoaded = false
    private val objStmObjects = mutable.Map[Int, Cos]()

    /** Remaining aggregate decode budget for this document; see
      * [[MaxDocDecodedBytes]]. */
    private var decodedBudget: Long = MaxDocDecodedBytes
    /** Any bound fired while decoding this document (per-stream cap,
      * aggregate budget, damaged-stream salvage, page-tree caps) — surfaced
      * through [[PdfResult.truncated]] so norm_meta stays honest. */
    var truncated: Boolean = false

    /** Resolve an indirect /Length target: must be a direct number object.
      * Parsed with a resolver-LESS lexer, so a crafted length→stream→length
      * cycle cannot recurse. */
    private def lengthOf(num: Int): Option[Int] =
      index.get(num).flatMap { case (off, _) =>
        new Lexer(bytes, off).parseObj() match {
          case CosNum(v) => Some(v.toInt)
          case _ => None
        }
      }

    // ---- standard-security-handler decryption (round 6) ----
    // cache holds RAW parsed objects; decCache the decrypted views. The
    // split matters: objects parsed while the decryptor is still being set
    // up (trailer discovery, the /Encrypt dict itself) must stay raw, and
    // get their decrypted view on the next access instead of poisoning the
    // cache undecrypted.
    private val decCache = mutable.Map[Int, Cos]()
    private var cryptoInit = false
    private var inCryptoBuild = false
    private var cryptoVal: Option[PdfCrypto.Decryptor] = None
    private var encryptObjNum = -1
    /** /Encrypt present but no empty-password path opens it (or the scheme
      * is unsupported) → report `encrypted`, never guess. */
    private var passwordProtected = false

    private def crypto: Option[PdfCrypto.Decryptor] = {
      if (!cryptoInit && !inCryptoBuild) {
        inCryptoBuild = true
        try cryptoVal = buildCrypto()
        finally { inCryptoBuild = false; cryptoInit = true }
      }
      if (cryptoInit) cryptoVal else None // None during setup: parse raw
    }

    private def buildCrypto(): Option[PdfCrypto.Decryptor] = {
      val t = trailer.getOrElse(return None)
      val encRef = t.get("Encrypt").getOrElse(return None)
      encryptObjNum = encRef match { case CosRef(n, _) => n; case _ => -1 }
      val encDict = resolveDict(encRef) match {
        case Some(d) => d
        case None => passwordProtected = true; return None
      }
      if (!encDict.get("Filter").contains(CosName("Standard"))) {
        passwordProtected = true; return None // non-Standard handler: unsupported
      }
      def numOf(k: String, d: Int) = resolve(encDict.get(k).getOrElse(CosNull)) match {
        case CosNum(x) => x.toInt; case _ => d
      }
      def strOf(k: String) = resolve(encDict.get(k).getOrElse(CosNull)) match {
        case CosStr(b) => b; case _ => Array.emptyByteArray
      }
      val v = numOf("V", 0)
      val r = numOf("R", 0)
      // V4 crypt filters: the method named by /StmF inside /CF (the common
      // real-world shape has /StrF identical; one method serves both)
      val cfm: String =
        if (v != 4) ""
        else {
          val stmF = encDict.get("StmF") match { case Some(CosName(nm)) => nm; case _ => "Identity" }
          if (stmF == "Identity") "Identity"
          else resolveDict(encDict.get("CF").getOrElse(CosNull))
            .flatMap(cf => resolveDict(cf.get(stmF).getOrElse(CosNull)))
            .flatMap(_.get("CFM") match { case Some(CosName(m)) => Some(m); case _ => None })
            .getOrElse("Identity")
        }
      val id0 = resolve(t.get("ID").getOrElse(CosNull)) match {
        case CosArr(arr) => arr.headOption match {
          case Some(CosStr(b)) => b
          case _ => Array.emptyByteArray
        }
        case _ => Array.emptyByteArray
      }
      val lengthBits = if (v == 1) 40 else numOf("Length", if (v >= 4) 128 else 40)
      val encMeta = resolve(encDict.get("EncryptMetadata").getOrElse(CosNull)) != CosBool(false)
      val params = PdfCrypto.Params(v, r, lengthBits, numOf("P", -1),
        strOf("O"), strOf("U"), strOf("OE"), strOf("UE"), cfm, encMeta, id0)
      val d = PdfCrypto.build(params)
      if (d.isEmpty) passwordProtected = true
      d
    }

    /** Depth-capped structural decryption of one indirect object's strings
      * and stream data with its (num, gen) key. /Type /XRef streams are
      * exempt by spec (they must be readable before decryption is set up). */
    private def decryptCos(c: Cos, num: Int, gen: Int, d: PdfCrypto.Decryptor, depth: Int): Cos =
      if (depth > MaxNestingDepth) c
      else c match {
        case CosStr(b) => CosStr(d.decrypt(b, num, gen))
        case CosArr(v) => CosArr(v.map(decryptCos(_, num, gen, d, depth + 1)))
        case CosDict(m) => CosDict(m.map { case (k, v) => k -> decryptCos(v, num, gen, d, depth + 1) })
        case CosStream(dict, raw) =>
          if (dict.get("Type").contains(CosName("XRef"))) c
          else {
            val dd = decryptCos(dict, num, gen, d, depth + 1) match {
              case x: CosDict => x
              case _ => dict
            }
            CosStream(dd, d.decrypt(raw, num, gen))
          }
        case other => other
      }

    def obj(num: Int): Cos = {
      val raw = cache.getOrElseUpdate(num, {
        index.get(num) match {
          case Some((off, _)) => new Lexer(bytes, off, lengthOf).parseObj()
          case None =>
            loadObjStms()
            objStmObjects.getOrElse(num, CosNull)
        }
      })
      crypto match {
        // ObjStm-contained objects (no index entry) are NOT individually
        // encrypted — the object stream they came from already was; the
        // /Encrypt dict itself is exempt by definition
        case Some(c) if num != encryptObjNum && index.contains(num) =>
          decCache.getOrElseUpdate(num, decryptCos(raw, num, index(num)._2, c, 0))
        case _ => raw
      }
    }

    /** PDF 1.5 object streams: decompress every /Type /ObjStm once and
      * index the contained objects. */
    private def loadObjStms(): Unit = if (!objStmLoaded) {
      objStmLoaded = true
      index.keys.foreach { n =>
        obj(n) match {
          case st @ CosStream(d, _) if d.get("Type").contains(CosName("ObjStm")) =>
            val data = decode(st)
            val nObjs = resolve(d.get("N").getOrElse(CosNull)) match { case CosNum(v) => v.toInt; case _ => 0 }
            val first = resolve(d.get("First").getOrElse(CosNull)) match { case CosNum(v) => v.toInt; case _ => 0 }
            val hdr = new Lexer(data, 0)
            var i = 0
            val pairs = Vector.newBuilder[(Int, Int)]
            var ok = true
            while (i < nObjs && ok) {
              (hdr.parseObj(), hdr.parseObj()) match {
                case (CosNum(on), CosNum(ofs)) => pairs += ((on.toInt, ofs.toInt))
                case _ => ok = false
              }
              i += 1
            }
            pairs.result().foreach { case (on, ofs) =>
              if (first + ofs < data.length && !index.contains(on))
                objStmObjects(on) = new Lexer(data, first + ofs).parseObj()
            }
          case _ =>
        }
      }
    }

    /** Depth-capped: a reference cycle (`1 0 obj 2 0 R` / `2 0 obj 1 0 R`)
      * must dead-end at CosNull, not recurse forever. */
    def resolve(c: Cos, depth: Int = 0): Cos = c match {
      case CosRef(n, _) => if (depth > 32) CosNull else resolve(obj(n), depth + 1)
      case other => other
    }

    def resolveDict(c: Cos): Option[CosDict] = resolve(c) match {
      case d: CosDict => Some(d)
      case CosStream(d, _) => Some(d)
      case _ => None
    }

    /** Apply the stream's filter chain. Unsupported filter → empty. */
    def decode(st: CosStream): Array[Byte] = {
      if (decodedBudget <= 0) { truncated = true; return Array.emptyByteArray }
      val filters: Vector[String] = resolve(st.dict.get("Filter").getOrElse(CosNull)) match {
        case CosName(f) => Vector(f)
        case CosArr(fs) => fs.collect { case CosName(f) => f }
        case _ => Vector.empty
      }
      // /DecodeParms is POSITIONAL: when /Filter is an array, each entry
      // applies only to its corresponding filter stage (ADVICE r5 #4 — a
      // single dict applied after EVERY Flate stage un-predicts chained
      // streams twice and mis-decodes them).
      val parms: Vector[Cos] = resolve(
        st.dict.get("DecodeParms").getOrElse(st.dict.get("DP").getOrElse(CosNull))) match {
        case CosArr(ps) => ps
        case CosNull => Vector.empty
        case single => Vector(single)
      }
      val streamCap = math.min(MaxInflatedBytes, decodedBudget)
      var data = st.raw
      var fi = 0
      while (fi < filters.length) {
        filters(fi) match {
        case "FlateDecode" | "Fl" =>
          val (inflated, trunc) = inflate(data, streamCap)
          data = inflated
          if (trunc) truncated = true
          parms.lift(fi).flatMap(resolveDict).foreach { dp =>
            val pred = resolve(dp.get("Predictor").getOrElse(CosNull)) match { case CosNum(v) => v.toInt; case _ => 1 }
            val cols = resolve(dp.get("Columns").getOrElse(CosNull)) match { case CosNum(v) => v.toInt; case _ => 1 }
            if (pred >= 10) data = pngUnpredict(data, cols)
          }
        case "RunLengthDecode" | "RL" =>
          val out = new java.io.ByteArrayOutputStream()
          var i = 0
          var stop = false
          while (i < data.length && !stop) {
            // RL expands up to 128× per input pair — the same bomb class as
            // Flate when chained after it, so the stream cap applies here too
            if (out.size() >= streamCap) { truncated = true; stop = true }
            else {
              val len = data(i) & 0xff
              if (len == 128) stop = true // EOD
              else if (len < 128) { // literal run of len+1 bytes
                val n = math.min(len + 1, data.length - i - 1)
                out.write(data, i + 1, n)
                i += 1 + n
              } else { // next byte repeated 257-len times
                if (i + 1 < data.length) {
                  val b = data(i + 1)
                  var k = 0
                  while (k < 257 - len) { out.write(b); k += 1 }
                }
                i += 2
              }
            }
          }
          data = out.toByteArray
        case "ASCII85Decode" | "A85" =>
          val out = new java.io.ByteArrayOutputStream()
          var tuple = 0L
          var count = 0
          var done = false
          var idx = 0
          while (idx < data.length && !done) {
            val c = data(idx).toChar
            if (c == '~') done = true // '~>' terminator
            else if (c == 'z' && count == 0) out.write(Array[Byte](0, 0, 0, 0))
            else if (c >= '!' && c <= 'u') {
              tuple = tuple * 85 + (c - '!')
              count += 1
              if (count == 5) {
                out.write((tuple >> 24).toInt); out.write((tuple >> 16).toInt)
                out.write((tuple >> 8).toInt); out.write(tuple.toInt)
                tuple = 0; count = 0
              }
            } // whitespace and junk: skip
            idx += 1
          }
          if (count > 1) { // partial final group: pad with 'u', emit count-1 bytes
            var k = count
            while (k < 5) { tuple = tuple * 85 + 84; k += 1 }
            val b = Array((tuple >> 24).toInt, (tuple >> 16).toInt, (tuple >> 8).toInt)
            (0 until count - 1).foreach(j => out.write(b(j)))
          }
          data = out.toByteArray
        case "ASCIIHexDecode" | "AHx" =>
          val out = new java.io.ByteArrayOutputStream()
          var hi = -1
          data.foreach { b =>
            val d = Character.digit(b, 16)
            if (d >= 0) { if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 } }
          }
          if (hi >= 0) out.write(hi << 4)
          data = out.toByteArray
        case _ => data = Array.emptyByteArray // unsupported (DCT etc.) — not text
        }
        fi += 1
      }
      decodedBudget -= data.length
      if (decodedBudget < 0) truncated = true
      data
    }

    /** The LAST `trailer` dict in the file (incremental updates append a
      * new one); for xref-stream PDFs (no `trailer` keyword) the /Type
      * /XRef stream dict carries the same /Root//Encrypt keys. */
    lazy val trailer: Option[CosDict] = {
      val needle = "trailer".getBytes("ISO-8859-1")
      var last = -1
      var i = 0
      while (i + needle.length <= bytes.length) {
        var j = 0
        while (j < needle.length && bytes(i + j) == needle(j)) j += 1
        if (j == needle.length) last = i + needle.length
        i += 1
      }
      val fromKeyword = if (last < 0) None else new Lexer(bytes, last).parseObj() match {
        case d: CosDict => Some(d)
        case _ => None
      }
      fromKeyword.orElse {
        index.keys.toSeq.sorted.reverseIterator.map(obj).collectFirst {
          case CosStream(d, _) if d.get("Type").contains(CosName("XRef")) => d
        }
      }
    }

    /** /Root-designated catalog; lexical scan only as the salvage path for
      * a missing/broken trailer (deterministic: highest object number
      * wins, matching append-update recency better than map order). */
    def catalog: Option[CosDict] =
      trailer.flatMap(t => resolveDict(t.get("Root").getOrElse(CosNull)))
        .filter(_.get("Type").contains(CosName("Catalog")))
        .orElse {
          index.keys.toSeq.sorted.reverseIterator.map(obj).collectFirst {
            case d: CosDict if d.get("Type").contains(CosName("Catalog")) => d
          }
        }.orElse {
          loadObjStms()
          objStmObjects.keys.toSeq.sorted.reverseIterator.map(objStmObjects).collectFirst {
            case d: CosDict if d.get("Type").contains(CosName("Catalog")) => d
          }
        }

    /** True when the document declares /Encrypt (keyed trailer entry — not
      * a substring scan, which would drop any honest document whose
      * trailing content merely mentions "/Encrypt") AND no empty-password
      * path opens it. Round 6: empty-user/owner-password documents (the
      * dominant crawl case — permission restrictions, not secrecy) decrypt
      * through [[PdfCrypto]] and extract normally. */
    def encrypted: Boolean = {
      crypto // force decryptor setup
      passwordProtected
    }

    /** Page dicts in document order, each with inherited resources merged.
      * A visited set over kid OBJECT NUMBERS kills self/ancestor-referencing
      * /Kids cycles — a depth cap alone leaves `[2 0 R 2 0 R]` free to fan
      * out 2^depth times (an unkillable spin, not an exception); the page
      * cap bounds honest-looking but absurd trees. */
    def pages: Vector[CosDict] = {
      val out = Vector.newBuilder[CosDict]
      var nPages = 0
      val visited = mutable.Set[Int]()
      def walk(node: CosDict, inheritedRes: Option[Cos], depth: Int): Unit = {
        if (depth > 64 || nPages >= 10000) { truncated = true; return }
        val res = node.get("Resources").orElse(inheritedRes)
        node.get("Type") match {
          case Some(CosName("Page")) =>
            nPages += 1
            out += CosDict(res.map(r => node.v + ("Resources" -> r)).getOrElse(node.v))
          case _ =>
            resolve(node.get("Kids").getOrElse(CosNull)) match {
              case CosArr(kids) => kids.foreach {
                case ref @ CosRef(num, _) =>
                  if (visited.add(num)) resolveDict(ref).foreach(walk(_, res, depth + 1))
                case inline => resolveDict(inline).foreach(walk(_, res, depth + 1))
              }
              case _ =>
            }
        }
      }
      for {
        cat <- catalog
        pagesRoot <- resolveDict(cat.get("Pages").getOrElse(CosNull))
      } walk(pagesRoot, None, 0)
      out.result()
    }
  }

  // ---------- fonts ----------

  private val Cp1252 = java.nio.charset.Charset.forName("windows-1252")

  /** Per-font decode: simple fonts map bytes through windows-1252 (a close
    * superset of StandardEncoding's printable range); any font carrying a
    * /ToUnicode CMap uses it (bfchar + bfrange, 1- or 2-byte codes). Type0
    * without ToUnicode has no in-file glyph→char mapping → yields "".
    * `widths` is the simple-font /FirstChar + /Widths table (1/1000-em
    * units, VERDICT r5 #8) — it drives TJ word-gap detection and bbox
    * extent; absent (or Type0 /W, unmodeled), callers fall back to the
    * −150 heuristic and char-count bbox. */
  private final case class Font(toUnicode: Option[Map[Int, String]], twoByte: Boolean,
      widths: Option[(Int, Array[Int])] = None,
      cidWidths: Option[(Int, Map[Int, Int])] = None) {

    def hasWidths: Boolean =
      (widths.isDefined && !twoByte) || (cidWidths.isDefined && twoByte)

    /** (glyph count, single-byte-space count) of `bytes` — the operands of
      * the Tc/Tw spacing terms (Tw applies only to 1-byte code 32 by
      * spec, so composite fonts report zero spaces). */
    def glyphCounts(bytes: Array[Byte]): (Int, Int) =
      if (twoByte) (bytes.length / 2, 0)
      else {
        var sp = 0
        var i = 0
        while (i < bytes.length) { if (bytes(i) == 0x20) sp += 1; i += 1 }
        (bytes.length, sp)
      }

    /** Advance of `bytes` in 1/1000-em units; 0 when no width table (the
      * caller's signal to fall back to char-count extent). Simple fonts:
      * /FirstChar+/Widths per byte (unlisted → 500, the common
      * /MissingWidth default). Type0: the descendant CIDFont's /W map per
      * 2-byte code, default /DW. */
    def advanceUnits(bytes: Array[Byte]): Double = {
      if (twoByte) cidWidths match {
        case Some((dw, w)) =>
          var sum = 0.0
          var i = 0
          while (i + 1 < bytes.length) {
            val code = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
            sum += w.getOrElse(code, dw)
            i += 2
          }
          sum
        case None => 0.0
      } else widths match {
        case Some((first, w)) =>
          var sum = 0.0
          var i = 0
          while (i < bytes.length) {
            val c = bytes(i) & 0xff
            sum += (if (c >= first && c - first < w.length) w(c - first) else 500)
            i += 1
          }
          sum
        case None => 0.0
      }
    }

    /** TJ adjustment below which a positional gap is a word break: half the
      * space glyph's own width when the table knows it (the space the
      * producer would otherwise have typed), else the −150-units heuristic. */
    def kerningSpaceThreshold: Double = widths match {
      case Some((first, w)) if 32 >= first && 32 - first < w.length && w(32 - first) > 0 =>
        -w(32 - first) * 0.5
      case _ => -150.0
    }
    def decode(bytes: Array[Byte]): String = toUnicode match {
      case Some(map) =>
        val sb = new StringBuilder
        if (twoByte) {
          var i = 0
          while (i + 1 < bytes.length) {
            val code = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
            sb.append(map.getOrElse(code, ""))
            i += 2
          }
        } else bytes.foreach(b => sb.append(map.getOrElse(b & 0xff, "")))
        sb.toString
      case None =>
        if (twoByte) ""
        // BOM-prefixed UTF-16BE text strings (PDF 32000 §7.9.2.2): some
        // producers emit them even in content shows; the FE FF guard makes
        // false positives on windows-1252 glyph bytes ("þÿ" lead) negligible
        else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xfe && (bytes(1) & 0xff) == 0xff)
          new String(bytes, 2, bytes.length - 2, java.nio.charset.StandardCharsets.UTF_16BE)
        else new String(bytes, Cp1252)
    }
  }
  private val SimpleFont = Font(None, twoByte = false)

  private def parseToUnicode(cmap: Array[Byte]): Map[Int, String] = {
    val s = new String(cmap, "ISO-8859-1")
    val out = mutable.Map[Int, String]()
    def hexToInt(h: String): Int = java.lang.Integer.parseInt(h, 16)
    def hexToStr(h: String): String = {
      // UTF-16BE code units
      val sb = new StringBuilder
      var i = 0
      while (i + 4 <= h.length) { sb.append(hexToInt(h.substring(i, i + 4)).toChar); i += 4 }
      if (sb.isEmpty && h.length >= 2) sb.append(hexToInt(h).toChar)
      sb.toString
    }
    val bfchar = java.util.regex.Pattern.compile(
      "beginbfchar(.*?)endbfchar", java.util.regex.Pattern.DOTALL)
    val pair = java.util.regex.Pattern.compile("<([0-9A-Fa-f]+)>\\s*<([0-9A-Fa-f]+)>")
    val m1 = bfchar.matcher(s)
    while (m1.find()) {
      val mm = pair.matcher(m1.group(1))
      while (mm.find()) out(hexToInt(mm.group(1))) = hexToStr(mm.group(2))
    }
    val bfrange = java.util.regex.Pattern.compile(
      "beginbfrange(.*?)endbfrange", java.util.regex.Pattern.DOTALL)
    val triple = java.util.regex.Pattern.compile(
      "<([0-9A-Fa-f]+)>\\s*<([0-9A-Fa-f]+)>\\s*<([0-9A-Fa-f]+)>")
    val m2 = bfrange.matcher(s)
    while (m2.find()) {
      val mm = triple.matcher(m2.group(1))
      while (mm.find()) {
        val lo = hexToInt(mm.group(1)); val hi = hexToInt(mm.group(2))
        val dstHex = mm.group(3)
        var c = lo
        while (c <= hi && c - lo < 65536) {
          val base = hexToStr(dstHex)
          val mapped =
            if (base.length == 1) (base.charAt(0) + (c - lo)).toChar.toString
            else if (base.nonEmpty)
              base.substring(0, base.length - 1) + (base.last + (c - lo)).toChar
            else ""
          out(c) = mapped
          c += 1
        }
      }
    }
    out.toMap
  }

  // ---------- content interpreter ----------

  /** `w` = device-space advance width of the shown text (0 when the font
    * carries no width table — layout falls back to char-count extent). */
  private final case class Show(x: Double, y: Double, size: Double, text: String, w: Double)

  private final case class Mat(a: Double, b: Double, c: Double, d: Double, e: Double, f: Double) {
    def *(o: Mat): Mat = Mat(
      a * o.a + b * o.c, a * o.b + b * o.d,
      c * o.a + d * o.c, c * o.b + d * o.d,
      e * o.a + f * o.c + o.e, e * o.b + f * o.d + o.f)
  }
  private val Identity = Mat(1, 0, 0, 1, 0, 0)

  /** Returns (shows, guardTripped): the 4M-operator guard bounds crafted
    * content streams; when it fires, the remaining shows are DROPPED and the
    * flag surfaces as document truncation (VERDICT r5 #3 — no silent caps).
    * `formHandler(name, ctm)` interprets a `Do`-invoked Form XObject with
    * the CTM at invocation time and returns its device-space shows (round
    * 6 — report/letterhead text frequently lives in forms and was silently
    * lost); `baseCtm` seeds the CTM so nested forms compose /Matrix. */
  private def interpret(content: Array[Byte], fonts: Map[String, Font],
      formHandler: (String, Mat) => Vector[Show] = (_, _) => Vector.empty,
      baseCtm: Mat = Identity): (Vector[Show], Boolean) = {
    val lex = new Lexer(content, 0)
    val stack = mutable.ArrayBuffer[Cos]()
    val shows = Vector.newBuilder[Show]
    var ctm = baseCtm
    // graphics-state spacing parameters (PDF 32000 §9.3): char spacing,
    // word spacing (text-space units, added per glyph / per 1-byte space),
    // horizontal scale — all participate in q/Q save/restore
    var charSpacing = 0.0; var wordSpacing = 0.0; var hScale = 1.0
    val gsStack = mutable.ArrayBuffer[(Mat, Double, Double, Double)]()
    var tm = Identity; var tlm = Identity
    var leading = 0.0; var fontSize = 1.0
    var font: Font = SimpleFont

    def num(i: Int): Double = // operand i from the END (0 = top)
      if (stack.length > i) stack(stack.length - 1 - i) match {
        case CosNum(v) => v; case _ => 0.0
      } else 0.0

    // effective size folds the text-matrix scale in, so `/F1 1 Tf` +
    // `24 0 0 24 x y Tm` (scale-via-Tm, a common generator pattern) grades
    // the same as `/F1 24 Tf` — for EVERY show operator, Tj and TJ alike
    def emitText(t: String, units: Double, nGlyphs: Int, nSpaces: Int): Unit = if (t.nonEmpty) {
      val dev = tm * ctm
      val tmScale = math.sqrt(math.abs(tm.a * tm.d - tm.b * tm.c)).max(0.01)
      val effSize = fontSize * tmScale
      // advance in text space: glyph widths scaled by font size, plus the
      // Tc/Tw spacing terms, all under the Tz horizontal scale (§9.4.4)
      val advTs =
        if (units > 0)
          (units / 1000.0 * fontSize + nGlyphs * charSpacing + nSpaces * wordSpacing) * hScale
        else 0.0
      shows += Show(dev.e, dev.f, effSize, t, advTs * tmScale)
    }
    def emit(bytes: Array[Byte]): Unit = {
      val (ng, ns) = font.glyphCounts(bytes)
      emitText(font.decode(bytes), font.advanceUnits(bytes), ng, ns)
    }
    def nextLine(): Unit = { tlm = Mat(1, 0, 0, 1, 0, -leading) * tlm; tm = tlm }

    var guard = 0
    while (!lex.eof && guard < 4000000) {
      guard += 1
      lex.skipWs()
      if (!lex.eof) {
        val b = lex.in(lex.pos)
        if (b == '/' || b == '(' || b == '<' || b == '[' ||
            b == '+' || b == '-' || b == '.' || (b >= '0' && b <= '9')) {
          stack += lex.parseObj()
        } else {
          val op = lex.readKeyword()
          if (op.isEmpty) lex.pos += 1
          op match {
            case "BT" => tm = Identity; tlm = Identity
            case "ET" =>
            case "Td" => tlm = Mat(1, 0, 0, 1, num(1), num(0)) * tlm; tm = tlm
            case "TD" => leading = -num(0); tlm = Mat(1, 0, 0, 1, num(1), num(0)) * tlm; tm = tlm
            case "Tm" => tm = Mat(num(5), num(4), num(3), num(2), num(1), num(0)); tlm = tm
            case "T*" => nextLine()
            case "TL" => leading = num(0)
            case "Tf" =>
              fontSize = num(0)
              if (stack.length >= 2) stack(stack.length - 2) match {
                case CosName(fn) => font = fonts.getOrElse(fn, SimpleFont)
                case _ =>
              }
            case "Tj" => stack.lastOption.foreach { case CosStr(s) => emit(s); case _ => }
            case "'" => nextLine(); stack.lastOption.foreach { case CosStr(s) => emit(s); case _ => }
            case "\"" => // aw ac string: sets word/char spacing, then shows
              wordSpacing = num(2); charSpacing = num(1)
              nextLine(); stack.lastOption.foreach { case CosStr(s) => emit(s); case _ => }
            case "Tc" => charSpacing = num(0)
            case "Tw" => wordSpacing = num(0)
            case "Tz" => hScale = num(0) / 100.0
            case "TJ" => stack.lastOption.foreach {
              case CosArr(items) =>
                val sb = new StringBuilder
                var units = 0.0
                var nG = 0; var nS = 0
                // kerning adjustment in -1/1000 em: a shift below the
                // font's word-gap threshold (half a space width when the
                // /Widths table is present, −150 otherwise) is an
                // inter-word gap the producer encoded positionally
                val gap = font.kerningSpaceThreshold
                items.foreach {
                  case CosStr(s) =>
                    sb.append(font.decode(s)); units += font.advanceUnits(s)
                    val (g, sp) = font.glyphCounts(s); nG += g; nS += sp
                  case CosNum(adj) =>
                    units -= adj
                    if (adj < gap) sb.append(' ')
                  case _ =>
                }
                // without a width table the adjustment sum alone would be a
                // spuriously tiny extent — zero it so layout falls back
                emitText(sb.toString, if (font.hasWidths) units else 0.0, nG, nS)
              case _ =>
            }
            case "cm" => ctm = Mat(num(5), num(4), num(3), num(2), num(1), num(0)) * ctm
            case "q" => gsStack += ((ctm, charSpacing, wordSpacing, hScale))
            case "Q" => if (gsStack.nonEmpty) {
              val (c, tc, tw, tz) = gsStack.last
              ctm = c; charSpacing = tc; wordSpacing = tw; hScale = tz
              gsStack.dropRightInPlace(1)
            }
            case "Do" => stack.lastOption.foreach {
              case CosName(nm) => shows ++= formHandler(nm, ctm)
              case _ =>
            }
            case "BI" =>
              // inline image: skip to the ws-delimited EI — the binary
              // payload would otherwise be tokenized as garbage operators,
              // garbling the stack and wasting the operator guard
              var i = lex.pos
              while (i + 1 < lex.in.length &&
                  !(lex.in(i) == 'E' && lex.in(i + 1) == 'I' &&
                    i > 0 && isWs(lex.in(i - 1)) &&
                    (i + 2 >= lex.in.length || isWs(lex.in(i + 2)) || isDelim(lex.in(i + 2))))) i += 1
              lex.pos = math.min(i + 2, lex.in.length)
            case _ => // every other operator: drawing/color/state — irrelevant to text
          }
          stack.clear()
        }
      }
    }
    (shows.result(), !lex.eof)
  }

  // ---------- layout assembly ----------

  private def assemble(shows: Vector[Show], page: Int): Vector[LayoutBlock] = {
    if (shows.isEmpty) return Vector.empty
    // group into lines by baseline proximity
    val sorted = shows.sortBy(s => (-s.y, s.x))
    val lines = mutable.ArrayBuffer[mutable.ArrayBuffer[Show]]()
    sorted.foreach { s =>
      lines.lastOption match {
        case Some(line) if math.abs(line.head.y - s.y) <= math.max(2.0, line.head.size * 0.35) =>
          line += s
        case _ => lines += mutable.ArrayBuffer(s)
      }
    }
    val lineRows = lines.map { l =>
      val xs = l.sortBy(_.x)
      val text = xs.map(_.text.trim).filter(_.nonEmpty).mkString(" ")
      // line extent: width-true (x + /Widths advance) per show when the
      // font table is present, char-count approximation otherwise
      val xEnd = xs.iterator.map(s =>
        if (s.w > 0) s.x + s.w else s.x + s.text.length * s.size * 0.5).max
      (xs.head.x, l.head.y, xs.map(_.size).max, text, xEnd)
    }.filter(_._4.nonEmpty)
    if (lineRows.isEmpty) return Vector.empty

    val medianSize = lineRows.map(_._3).sorted.apply(lineRows.length / 2)
    // group lines into blocks by vertical gap
    val blocks = mutable.ArrayBuffer[mutable.ArrayBuffer[(Double, Double, Double, String, Double)]]()
    lineRows.foreach { row =>
      blocks.lastOption match {
        case Some(blk) if blk.last._2 - row._2 <= math.max(blk.last._3, row._3) * 1.8 &&
            // a font-size step (heading → body) starts a new block even
            // without a vertical gap
            math.max(blk.last._3, row._3) <= math.min(blk.last._3, row._3) * 1.25 =>
          blk += row
        case _ => blocks += mutable.ArrayBuffer(row)
      }
    }
    blocks.map { blk =>
      val text = blk.map(_._4).mkString("\n")
      val maxSize = blk.map(_._3).max
      val kind = if (maxSize >= medianSize * 1.3) "heading" else "text"
      val x0 = blk.map(_._1).min
      val yTop = blk.head._2 + blk.head._3
      val yBot = blk.last._2
      // x1 from per-line extents: width-true where /Widths exists,
      // char-count approximation otherwise (VERDICT r5 #8)
      val x1 = blk.map(_._5).max
      LayoutBlock(page, kind, text, x0.toFloat, yBot.toFloat, x1.toFloat, yTop.toFloat)
    }.toVector
  }

  // ---------- public API ----------

  /** Detailed parse outcome (round 6): `status` distinguishes the cases the
    * north-rule counters must keep apart — `encrypted` (needs decryption
    * support) vs `empty` (no text exists) vs `error` (broken file) vs
    * `not_pdf` (routed through [[StubLayoutParser]]); `truncated` is true
    * when ANY containment bound fired (per-stream inflate cap, aggregate
    * decode budget, damaged-stream salvage, page-tree caps, interpreter
    * operator guard) — the caller owes it to norm_meta.truncated. */
  final case class PdfResult(blocks: Vector[LayoutBlock], status: String, truncated: Boolean,
      /** Document-information dictionary (round 6): keys `title`, `author`,
        * `subject`, `keywords`, `created`, `modified` when present —
        * the PDF route's counterpart of the HTML meta extractor. */
      meta: Map[String, String] = Map.empty,
      /** /Link-annotation URI actions in page order (round 6) — the PDF
        * counterpart of the HTML links column; deduped, order-preserving. */
      links: Vector[String] = Vector.empty,
      /** /Outlines bookmark titles as (depth, title) in tree order (round
        * 6) — section structure for curation pipelines; depth starts at 1. */
      outline: Vector[(Int, String)] = Vector.empty)

  /** PDFDocEncoding (≈cp1252 for the printable range) or BOM UTF-16BE —
    * the two text-string encodings of PDF 32000 §7.9.2.2. */
  private def decodeDocString(b: Array[Byte]): String =
    if (b.length >= 2 && (b(0) & 0xff) == 0xfe && (b(1) & 0xff) == 0xff)
      new String(b, 2, b.length - 2, java.nio.charset.StandardCharsets.UTF_16BE)
    else new String(b, Cp1252)

  /** `D:YYYYMMDDHHmmSS[±HH'mm']` → ISO-8601; unparseable input passes
    * through raw (honest, deterministic). */
  private[sources] def pdfDateToIso(s: String): String = {
    val t = if (s.startsWith("D:")) s.substring(2) else s
    def num(from: Int, len: Int, default: String): String = {
      val p = t.substring(math.min(from, t.length), math.min(from + len, t.length))
      if (p.length == len && p.forall(_.isDigit)) p else default
    }
    val y = num(0, 4, "")
    if (y.isEmpty) return s
    val mo = num(4, 2, "01"); val d = num(6, 2, "01")
    val h = num(8, 2, "00"); val mi = num(10, 2, "00"); val se = num(12, 2, "00")
    val tz = if (t.length > 14) t.charAt(14) match {
      case '+' | '-' =>
        val th = num(15, 2, "00"); val tm = num(18, 2, "00")
        s"${t.charAt(14)}$th:$tm"
      case 'Z' => "Z"
      case _ => ""
    } else ""
    s"$y-$mo-${d}T$h:$mi:$se$tz"
  }

  def parseDetailed(bytes: Array[Byte], mime: String): PdfResult = {
    // 4-byte magic only (ADVICE r5 #3): anything shorter or non-matching
    // falls through to the StubLayoutParser text passthrough, so a 7-byte
    // text blob behaves the same as an 8-byte one.
    val isPdf = bytes != null && bytes.length >= 4 &&
      bytes(0) == '%' && bytes(1) == 'P' && bytes(2) == 'D' && bytes(3) == 'F'
    if (!isPdf) return PdfResult(StubLayoutParser.parse(bytes, mime), "not_pdf", truncated = false)
    try {
      val doc = new Doc(bytes)
      if (doc.encrypted) // decryption unavailable for THIS doc (non-empty
        // password or unsupported handler) — empty-password standard-
        // security docs were already decrypted transparently by PdfCrypto
        return PdfResult(Vector.empty, "encrypted", truncated = false)
      var guardTripped = false

      def fontsFor(res: Option[CosDict]): Map[String, Font] = (for {
        r <- res.toSeq
        fd <- doc.resolveDict(r.get("Font").getOrElse(CosNull)).toSeq
        (name, fref) <- fd.v
        fdict <- doc.resolveDict(fref)
      } yield {
        val twoByte = fdict.get("Subtype").contains(CosName("Type0"))
        val toUni = doc.resolve(fdict.get("ToUnicode").getOrElse(CosNull)) match {
          case st: CosStream => Some(parseToUnicode(doc.decode(st)))
          case _ => None
        }
        // simple-font /FirstChar + /Widths (1/1000-em units) for
        // width-true TJ gaps and bbox extent (VERDICT r5 #8)
        val widths = (doc.resolve(fdict.get("FirstChar").getOrElse(CosNull)),
            doc.resolve(fdict.get("Widths").getOrElse(CosNull))) match {
          case (CosNum(fc), CosArr(ws)) if ws.nonEmpty && ws.length <= 512 =>
            Some((fc.toInt, ws.map {
              case CosNum(v) => v.toInt
              case r2 => doc.resolve(r2) match { case CosNum(v) => v.toInt; case _ => 0 }
            }.toArray))
          case _ => None
        }
        // Type0: the descendant CIDFont's /W ranges + /DW default drive
        // width-true advance for 2-byte codes (same VERDICT r5 #8 story)
        val cidWidths =
          if (!twoByte) None
          else doc.resolve(fdict.get("DescendantFonts").getOrElse(CosNull)) match {
            case CosArr(dfs) => dfs.headOption.flatMap(doc.resolveDict).map { df =>
              val dw = doc.resolve(df.get("DW").getOrElse(CosNull)) match {
                case CosNum(v) => v.toInt; case _ => 1000
              }
              val m = Map.newBuilder[Int, Int]
              doc.resolve(df.get("W").getOrElse(CosNull)) match {
                case CosArr(arr) =>
                  var i = 0
                  while (i < arr.length) {
                    (doc.resolve(arr(i)),
                     if (i + 1 < arr.length) doc.resolve(arr(i + 1)) else CosNull) match {
                      case (CosNum(c), CosArr(ws)) => // c [w1 w2 ...]
                        ws.zipWithIndex.foreach {
                          case (CosNum(w), k) => m += (c.toInt + k) -> w.toInt
                          case _ =>
                        }
                        i += 2
                      case (CosNum(c1), CosNum(c2)) if i + 2 < arr.length => // c1 c2 w
                        doc.resolve(arr(i + 2)) match {
                          case CosNum(w) =>
                            var c = c1.toInt
                            while (c <= c2.toInt && c - c1.toInt < 65536) {
                              m += c -> w.toInt; c += 1
                            }
                          case _ =>
                        }
                        i += 3
                      case _ => i += 1
                    }
                  }
                case _ =>
              }
              (dw, m.result())
            }
            case _ => None
          }
        name -> Font(toUni, twoByte, widths, cidWidths)
      }).toMap

      val pageDicts = doc.pages
      val linksOut = Vector.newBuilder[String]
      val blocks = pageDicts.zipWithIndex.flatMap { case (pageDict, pageIdx) =>
        val pageRes = doc.resolveDict(pageDict.get("Resources").getOrElse(CosNull))
        val fonts = fontsFor(pageRes)

        // Form XObjects (round 6): `Do` recursively interprets /Subtype
        // /Form streams with their own resources (fallback: parent's) and
        // /Matrix composed into the invoking CTM. The stack-based visited
        // set kills self/mutual recursion; the depth cap bounds honest
        // nesting; the SAME aggregate decode budget bounds total bytes.
        val formStack = mutable.Set[Int]()
        def formHandler(res: Option[CosDict], inhFonts: Map[String, Font], depth: Int)(
            name: String, ctm: Mat): Vector[Show] = {
          if (depth > 8) { guardTripped = true; return Vector.empty }
          val ref = res.flatMap(r => doc.resolveDict(r.get("XObject").getOrElse(CosNull)))
            .flatMap(_.get(name)).getOrElse(return Vector.empty)
          val objNum = ref match { case CosRef(n, _) => n; case _ => -1 }
          if (objNum >= 0 && !formStack.add(objNum)) return Vector.empty // cycle
          try {
            doc.resolve(ref) match {
              case st @ CosStream(d, _) if d.get("Subtype").contains(CosName("Form")) =>
                val formRes = doc.resolveDict(d.get("Resources").getOrElse(CosNull)).orElse(res)
                val formFonts = inhFonts ++ fontsFor(formRes)
                val mtx = doc.resolve(d.get("Matrix").getOrElse(CosNull)) match {
                  case CosArr(Seq(CosNum(a), CosNum(b), CosNum(c), CosNum(dd), CosNum(e), CosNum(f))) =>
                    Mat(a, b, c, dd, e, f)
                  case _ => Identity
                }
                val (s, g) = interpret(doc.decode(st), formFonts,
                  formHandler(formRes, formFonts, depth + 1), mtx * ctm)
                if (g) guardTripped = true
                s
              case _ => Vector.empty // image XObject or broken ref: no text
            }
          } finally {
            if (objNum >= 0) formStack.remove(objNum): Unit // same form may recur non-cyclically
          }
        }

        val content: Array[Byte] = doc.resolve(pageDict.get("Contents").getOrElse(CosNull)) match {
          case st: CosStream => doc.decode(st)
          case CosArr(parts) =>
            val out = new java.io.ByteArrayOutputStream()
            parts.foreach { p =>
              doc.resolve(p) match {
                case st: CosStream => out.write(doc.decode(st)); out.write('\n')
                case _ =>
              }
            }
            out.toByteArray
          case _ => Array.emptyByteArray
        }
        val (shows, tripped) = interpret(content, fonts, formHandler(pageRes, fonts, 0), Identity)
        if (tripped) guardTripped = true
        // /Annots (round 6): FreeText annotations carry visible text the
        // content streams never paint; /Link URI actions feed the links
        // column. Bounded: first 256 annots per page.
        val annotBlocks = Vector.newBuilder[LayoutBlock]
        doc.resolve(pageDict.get("Annots").getOrElse(CosNull)) match {
          case CosArr(annots) =>
            if (annots.length > 256) guardTripped = true // cap surfaces as truncated
            annots.take(256).foreach { a =>
            doc.resolveDict(a).foreach { ad =>
              val rect = doc.resolve(ad.get("Rect").getOrElse(CosNull)) match {
                case CosArr(Seq(CosNum(x0), CosNum(y0), CosNum(x1), CosNum(y1))) =>
                  (x0.toFloat, y0.toFloat, x1.toFloat, y1.toFloat)
                case _ => (0f, 0f, 0f, 0f)
              }
              ad.get("Subtype") match {
                case Some(CosName("FreeText")) =>
                  doc.resolve(ad.get("Contents").getOrElse(CosNull)) match {
                    case CosStr(b) =>
                      val t = decodeDocString(b).trim
                      if (t.nonEmpty)
                        annotBlocks += LayoutBlock(pageIdx, "text", t,
                          rect._1, rect._2, rect._3, rect._4)
                    case _ =>
                  }
                case Some(CosName("Link")) =>
                  for {
                    act <- doc.resolveDict(ad.get("A").getOrElse(CosNull))
                    if act.get("S").contains(CosName("URI"))
                  } doc.resolve(act.get("URI").getOrElse(CosNull)) match {
                    case CosStr(b) =>
                      val u = decodeDocString(b).trim
                      if (u.nonEmpty) linksOut += u
                    case _ =>
                  }
                case _ =>
              }
            }
          }
          case _ =>
        }
        assemble(shows, pageIdx) ++ annotBlocks.result()
      }
      // AcroForm field values (round 6): interactive-form documents carry
      // their filled data in /AcroForm /Fields, invisible to the content
      // streams. Emitted as kind="field" blocks ("name: value", dotted
      // hierarchy per spec) after the last page — the pipeline maps them
      // onto list-type content blocks.
      val fields = {
        val out = Vector.newBuilder[LayoutBlock]
        var nFields = 0
        val visited = mutable.Set[Int]()
        def valueOf(c: Cos): Option[String] = doc.resolve(c) match {
          case CosStr(b) => Some(decodeDocString(b))
          case CosName(n) => Some(n) // radio/checkbox state, e.g. Yes
          case CosArr(vs) =>
            val parts = vs.flatMap(valueOf)
            if (parts.isEmpty) None else Some(parts.mkString(", "))
          case _ => None
        }
        def walk(f: Cos, prefix: String, depth: Int): Unit = {
          if (depth > 32 || nFields >= 1000) { if (nFields >= 1000) doc.truncated = true; return }
          val num = f match { case CosRef(n, _) => n; case _ => -1 }
          if (num >= 0 && !visited.add(num)) return
          doc.resolveDict(f).foreach { fd =>
            val name = fd.get("T") match {
              case Some(CosStr(b)) =>
                val t = decodeDocString(b)
                if (prefix.isEmpty) t else prefix + "." + t
              case _ => prefix
            }
            fd.get("V").flatMap(valueOf).filter(_.nonEmpty).foreach { v =>
              nFields += 1
              val label = if (name.isEmpty) v else s"$name: $v"
              out += LayoutBlock(pageDicts.length, "field", label, 0f, 0f, 0f, 0f)
            }
            doc.resolve(fd.get("Kids").getOrElse(CosNull)) match {
              case CosArr(kids) => kids.foreach(walk(_, name, depth + 1))
              case _ =>
            }
          }
        }
        for {
          cat <- doc.catalog
          af <- doc.resolveDict(cat.get("AcroForm").getOrElse(CosNull))
          fs <- Some(doc.resolve(af.get("Fields").getOrElse(CosNull)))
        } fs match {
          case CosArr(arr) => arr.foreach(walk(_, "", 0))
          case _ =>
        }
        out.result()
      }
      // /Info document metadata (strings decrypt through obj() like any
      // other indirect object)
      val meta: Map[String, String] = (for {
        t <- doc.trailer.toSeq
        info <- doc.resolveDict(t.get("Info").getOrElse(CosNull)).toSeq
        (src, dst, isDate) <- Seq(
          ("Title", "title", false), ("Author", "author", false),
          ("Subject", "subject", false), ("Keywords", "keywords", false),
          ("CreationDate", "created", true), ("ModDate", "modified", true))
        v <- doc.resolve(info.get(src).getOrElse(CosNull)) match {
          case CosStr(b) =>
            val s = decodeDocString(b).trim
            if (s.isEmpty) None else Some(if (isDate) pdfDateToIso(s) else s)
          case _ => None
        }
      } yield dst -> v).toMap
      // /Outlines bookmark tree: sibling chains via /Next, children via
      // /First; visited set + depth/count caps kill crafted cycles
      val outline: Vector[(Int, String)] = {
        val out = Vector.newBuilder[(Int, String)]
        val visited = mutable.Set[Int]()
        var n = 0
        def walk(item: Cos, depth: Int): Unit = {
          var cur = item
          var guard = 0
          while (cur != CosNull && guard < 2000 && n < 1000 && depth <= 16) {
            guard += 1
            val num = cur match { case CosRef(nn, _) => nn; case _ => -1 }
            if (num >= 0 && !visited.add(num)) return
            doc.resolveDict(cur) match {
              case Some(d) =>
                doc.resolve(d.get("Title").getOrElse(CosNull)) match {
                  case CosStr(b) =>
                    val t = decodeDocString(b).trim
                    if (t.nonEmpty) { out += ((depth, t)); n += 1 }
                  case _ =>
                }
                d.get("First").foreach(f => walk(f, depth + 1))
                cur = d.get("Next").getOrElse(CosNull)
              case None => cur = CosNull
            }
          }
        }
        for {
          cat <- doc.catalog
          ol <- doc.resolveDict(cat.get("Outlines").getOrElse(CosNull))
          first <- ol.get("First")
        } walk(first, 1)
        out.result()
      }
      val all = blocks ++ fields
      PdfResult(all, if (all.isEmpty) "empty" else "ok", doc.truncated || guardTripped,
        meta, linksOut.result().distinct, outline)
    } catch {
      case _: Exception => PdfResult(Vector.empty, "error", truncated = false) // never-throws pipeline contract
    }
  }

  def parse(bytes: Array[Byte], mime: String): Vector[LayoutBlock] =
    parseDetailed(bytes, mime).blocks

  /** Concatenated plain text (blocks in reading order, pages in order). */
  def extractText(bytes: Array[Byte]): String =
    parse(bytes, "application/pdf").map(_.text).mkString("\n\n")
}
