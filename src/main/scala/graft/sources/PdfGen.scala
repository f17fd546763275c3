package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.Deflater

/**
 * Deterministic minimal-PDF writer — the test/fixture counterpart of
 * [[PdfParser]]. Emits standards-shaped PDFs (header, numbered objects,
 * xref table, trailer) so the fixtures exercise the parser against real
 * file structure, not hand-fed object soup. No library, no randomness:
 * byte-identical output for identical inputs, which is what lets the
 * `pdf_fixture` driver query carry a transcribed VALUES oracle.
 */
object PdfGen {

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def bytes(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  /** Assemble numbered objects into a full PDF with xref + trailer.
    * `extraTrailer` appends raw entries to the trailer dict (e.g. an
    * `/Encrypt` reference for the encryption-detection fixture). */
  private def assemble(objs: Seq[(Int, Array[Byte])], rootNum: Int,
      extraTrailer: String = ""): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(bytes("%PDF-1.4\n%âãÏÓ\n"))
    val offsets = scala.collection.mutable.Map[Int, Int]()
    objs.foreach { case (num, body) =>
      offsets(num) = out.size()
      out.write(bytes(s"$num 0 obj\n"))
      out.write(body)
      out.write(bytes("\nendobj\n"))
    }
    val xrefPos = out.size()
    val maxNum = objs.map(_._1).max
    out.write(bytes(s"xref\n0 ${maxNum + 1}\n"))
    out.write(bytes("0000000000 65535 f \n"))
    (1 to maxNum).foreach { n =>
      val off = offsets.getOrElse(n, 0)
      out.write(bytes(f"$off%010d 00000 n \n"))
    }
    out.write(bytes(
      s"trailer\n<< /Size ${maxNum + 1} /Root $rootNum 0 R$extraTrailer >>\nstartxref\n$xrefPos\n%%EOF\n"))
    out.toByteArray
  }

  private def streamObj(dict: String, data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(bytes(s"<< $dict /Length ${data.length} >>\nstream\n"))
    out.write(data)
    out.write(bytes("\nendstream"))
    out.toByteArray
  }

  /** One-page PDF, uncompressed content stream. `contentOps` is the raw
    * content-stream text (BT/Tf/Td/Tj...). */
  def onePage(contentOps: String): Array[Byte] = {
    assemble(Seq(
      1 -> bytes("<< /Type /Catalog /Pages 2 0 R >>"),
      2 -> bytes("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      3 -> bytes("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Resources << /Font << /F1 5 0 R /F2 6 0 R >> >> /Contents 4 0 R >>"),
      4 -> streamObj("", bytes(contentOps)),
      5 -> bytes("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
      6 -> bytes("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold >>")
    ), rootNum = 1)
  }

  /** Same page shape with a FlateDecode content stream. */
  def onePageFlate(contentOps: String): Array[Byte] = {
    assemble(Seq(
      1 -> bytes("<< /Type /Catalog /Pages 2 0 R >>"),
      2 -> bytes("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      3 -> bytes("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
      4 -> streamObj("/Filter /FlateDecode", deflate(bytes(contentOps))),
      5 -> bytes("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    ), rootNum = 1)
  }

  /** Two pages, the second with a /Contents ARRAY of two Flate streams. */
  def twoPages(ops1: String, ops2a: String, ops2b: String): Array[Byte] = {
    assemble(Seq(
      1 -> bytes("<< /Type /Catalog /Pages 2 0 R >>"),
      // Resources inherited from the Pages node (tests inheritance)
      2 -> bytes("<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 " +
        "/Resources << /Font << /F1 8 0 R >> >> >>"),
      3 -> bytes("<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>"),
      4 -> bytes("<< /Type /Page /Parent 2 0 R /Contents [6 0 R 7 0 R] >>"),
      5 -> streamObj("", bytes(ops1)),
      6 -> streamObj("/Filter /FlateDecode", deflate(bytes(ops2a))),
      7 -> streamObj("/Filter /FlateDecode", deflate(bytes(ops2b))),
      8 -> bytes("<< /Type /Font /Subtype /Type1 /BaseFont /Times-Roman >>")
    ), rootNum = 1)
  }

  /** Composite (Type0) font whose text is only reachable through its
    * /ToUnicode CMap: 2-byte codes 0x0001.. map to "Unicode!" chars. */
  def type0WithToUnicode(codesToText: Seq[(Int, String)], tjHex: String): Array[Byte] = {
    val bf = codesToText.map { case (c, t) =>
      val dst = t.map(ch => f"${ch.toInt}%04X").mkString
      f"<$c%04X> <$dst>"
    }.mkString("\n")
    val cmap =
      s"""/CIDInit /ProcSet findresource begin
         |12 dict begin
         |begincmap
         |1 begincodespacerange
         |<0000> <FFFF>
         |endcodespacerange
         |${codesToText.length} beginbfchar
         |$bf
         |endbfchar
         |endcmap
         |end end""".stripMargin
    assemble(Seq(
      1 -> bytes("<< /Type /Catalog /Pages 2 0 R >>"),
      2 -> bytes("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      3 -> bytes("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Resources << /Font << /C1 5 0 R >> >> /Contents 4 0 R >>"),
      4 -> streamObj("", bytes(s"BT /C1 12 Tf 72 700 Td <$tjHex> Tj ET")),
      5 -> bytes("<< /Type /Font /Subtype /Type0 /BaseFont /Fake-Identity-H " +
        "/Encoding /Identity-H /ToUnicode 6 0 R >>"),
      6 -> streamObj("", bytes(cmap))
    ), rootNum = 1)
  }

  /** PDF 1.5 shape: page + font dicts live INSIDE a Flate object stream. */
  def objectStreamPdf(contentOps: String): Array[Byte] = {
    val inner3 = "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"
    val inner5 = "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    val body = inner3 + "\n" + inner5
    val header = s"3 0 5 ${inner3.length + 1} "
    val stmData = bytes(header + body)
    assemble(Seq(
      1 -> bytes("<< /Type /Catalog /Pages 2 0 R >>"),
      2 -> bytes("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      4 -> streamObj("", bytes(contentOps)),
      6 -> streamObj(s"/Type /ObjStm /N 2 /First ${header.length} /Filter /FlateDecode",
        deflate(stmData))
    ), rootNum = 1)
  }

  // ---- writer-side standard security handler (round 6) ----
  // An INDEPENDENT implementation of the ISO 32000 §7.6 algorithms (MD5 /
  // RC4 / SHA-2 / AES-CBC over JDK primitives) so the encrypted fixtures
  // pin PdfCrypto against the public spec, not against itself. The only
  // shared artifacts are the spec's own constants (the 32-byte pad).

  private val GenPad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private def genHash(alg: String, parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance(alg)
    parts.foreach(d.update)
    d.digest()
  }

  private def genRc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(_.toByte)
    var j = 0
    for (i <- 0 until 256) {
      j = (j + (s(i) & 0xff) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
    }
    val out = new Array[Byte](data.length)
    var x = 0; var y = 0
    for (k <- data.indices) {
      x = (x + 1) & 0xff
      y = (y + (s(x) & 0xff)) & 0xff
      val t = s(x); s(x) = s(y); s(y) = t
      out(k) = (data(k) ^ s(((s(x) & 0xff) + (s(y) & 0xff)) & 0xff)).toByte
    }
    out
  }

  private def genAes(encrypt: Boolean, key: Array[Byte], iv: Array[Byte],
      data: Array[Byte], padding: String): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance(s"AES/CBC/$padding")
    c.init(if (encrypt) javax.crypto.Cipher.ENCRYPT_MODE else javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c.doFinal(data)
  }

  private def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02X").mkString

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private val GenId0: Array[Byte] = Array.tabulate(16)(i => ((i * 31 + 7) & 0xff).toByte)
  private val GenP = -44

  /** R3/R4 key material for EMPTY user+owner passwords: (O, U, fileKey). */
  private def genR34Keys(r: Int): (Array[Byte], Array[Byte], Array[Byte]) = {
    val n = 16 // /Length 128
    // Algorithm 3: O from the (empty) owner password
    var okey = genHash("MD5", GenPad)
    for (_ <- 0 until 50) okey = genHash("MD5", okey.take(n))
    val ok = okey.take(n)
    var o = genRc4(ok, GenPad)
    for (i <- 1 to 19) o = genRc4(ok.map(b => (b ^ i).toByte), o)
    // Algorithm 2: file key from the (empty) user password
    var key = genHash("MD5", GenPad, o, le32(GenP), GenId0)
    for (_ <- 0 until 50) key = genHash("MD5", key.take(n))
    val fileKey = key.take(n)
    // Algorithm 5: U
    var u = genRc4(fileKey, genHash("MD5", GenPad, GenId0))
    for (i <- 1 to 19) u = genRc4(fileKey.map(b => (b ^ i).toByte), u)
    (o, u ++ new Array[Byte](16), fileKey)
  }

  private def genObjKey(fileKey: Array[Byte], num: Int, aes: Boolean): Array[Byte] = {
    val ext = Array((num & 0xff).toByte, ((num >> 8) & 0xff).toByte, ((num >> 16) & 0xff).toByte,
      0.toByte, 0.toByte) // gen 0
    val h = if (aes) genHash("MD5", fileKey, ext, Array(0x73, 0x41, 0x6c, 0x54).map(_.toByte))
            else genHash("MD5", fileKey, ext)
    h.take(math.min(fileKey.length + 5, 16))
  }

  private def encryptedOnePage(encDict: String, encryptOps: Array[Byte] => Array[Byte],
      ops: String): Array[Byte] = {
    assemble(Seq(
      1 -> bytes("<< /Type /Catalog /Pages 2 0 R >>"),
      2 -> bytes("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      3 -> bytes("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
      4 -> streamObj("", encryptOps(bytes(ops))),
      5 -> bytes("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
      8 -> bytes(encDict)
    ), rootNum = 1,
      extraTrailer = s" /Encrypt 8 0 R /ID [<${hex(GenId0)}> <${hex(GenId0)}>]")
  }

  /** R3 / V2: RC4-128, empty passwords — the classic owner-restrictions-only
    * document the parser must now DECRYPT and extract. */
  def rc4EncryptedPdf(): Array[Byte] = {
    val (o, u, fileKey) = genR34Keys(3)
    encryptedOnePage(
      s"<< /Filter /Standard /V 2 /R 3 /Length 128 /P $GenP /O <${hex(o)}> /U <${hex(u)}> >>",
      data => genRc4(genObjKey(fileKey, 4, aes = false), data),
      "BT /F1 12 Tf 72 700 Td (Decrypted RC4 content extracted.) Tj ET")
  }

  /** R4 / V4 with the /AESV2 crypt filter: AES-128-CBC, IV-prefixed. */
  def aesv2EncryptedPdf(): Array[Byte] = {
    val (o, u, fileKey) = genR34Keys(4)
    val iv = Array.tabulate(16)(i => ((i * 13 + 5) & 0xff).toByte)
    encryptedOnePage(
      s"<< /Filter /Standard /V 4 /R 4 /Length 128 /P $GenP /O <${hex(o)}> /U <${hex(u)}> " +
        "/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen /Length 16 >> >> " +
        "/StmF /StdCF /StrF /StdCF >>",
      data => iv ++ genAes(encrypt = true, genObjKey(fileKey, 4, aes = true), iv, data, "PKCS5Padding"),
      "BT /F1 12 Tf 72 700 Td (Decrypted AESV2 content extracted.) Tj ET")
  }

  /** Independent Algorithm 2.B (R6 iterated SHA-2/AES password hash). */
  private def genHash2B(pwd: Array[Byte], salt: Array[Byte], udata: Array[Byte]): Array[Byte] = {
    var k = genHash("SHA-256", pwd, salt, udata)
    var round = 0
    while (round < 512) { // spec terminates well under 512; hard backstop
      val block = pwd ++ k ++ udata
      val k1 = Array.fill(64)(block).flatten
      val e = genAes(encrypt = true, k.take(16), k.slice(16, 32), k1, "NoPadding")
      k = (e.take(16).map(_ & 0xff).sum % 3) match {
        case 0 => genHash("SHA-256", e)
        case 1 => genHash("SHA-384", e)
        case _ => genHash("SHA-512", e)
      }
      round += 1
      if (round >= 64 && (e(e.length - 1) & 0xff) <= round - 32) return k.take(32)
    }
    k.take(32)
  }

  /** R6 / V5: AES-256 (the PDF 2.0 scheme), empty passwords. */
  def aes256EncryptedPdf(): Array[Byte] = {
    val fileKey = Array.tabulate(32)(i => ((i * 47 + 3) & 0xff).toByte)
    val valSalt = Array.tabulate(8)(i => ((i * 11 + 1) & 0xff).toByte)
    val keySalt = Array.tabulate(8)(i => ((i * 17 + 2) & 0xff).toByte)
    val oValSalt = Array.tabulate(8)(i => ((i * 19 + 3) & 0xff).toByte)
    val oKeySalt = Array.tabulate(8)(i => ((i * 23 + 4) & 0xff).toByte)
    val empty = Array.emptyByteArray
    val u = genHash2B(empty, valSalt, empty) ++ valSalt ++ keySalt
    val ue = genAes(encrypt = true, genHash2B(empty, keySalt, empty), new Array[Byte](16), fileKey, "NoPadding")
    val o = genHash2B(empty, oValSalt, u) ++ oValSalt ++ oKeySalt
    val oe = genAes(encrypt = true, genHash2B(empty, oKeySalt, u), new Array[Byte](16), fileKey, "NoPadding")
    val iv = Array.tabulate(16)(i => ((i * 29 + 9) & 0xff).toByte)
    encryptedOnePage(
      s"<< /Filter /Standard /V 5 /R 6 /Length 256 /P $GenP /O <${hex(o)}> /U <${hex(u)}> " +
        s"/OE <${hex(oe)}> /UE <${hex(ue)}> " +
        "/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> /StmF /StdCF /StrF /StdCF >>",
      data => iv ++ genAes(encrypt = true, fileKey, iv, data, "PKCS5Padding"),
      "BT /F1 12 Tf 72 700 Td (Decrypted AES-256 content extracted.) Tj ET")
  }

  /** R5 / V5: the pre-ISO Adobe 9 AES-256 revision — single SHA-256
    * password hash instead of the R6 iteration. */
  def aes256R5EncryptedPdf(): Array[Byte] = {
    val fileKey = Array.tabulate(32)(i => ((i * 53 + 7) & 0xff).toByte)
    val valSalt = Array.tabulate(8)(i => ((i * 7 + 5) & 0xff).toByte)
    val keySalt = Array.tabulate(8)(i => ((i * 13 + 6) & 0xff).toByte)
    val oValSalt = Array.tabulate(8)(i => ((i * 3 + 7) & 0xff).toByte)
    val oKeySalt = Array.tabulate(8)(i => ((i * 5 + 8) & 0xff).toByte)
    val u = genHash("SHA-256", valSalt) ++ valSalt ++ keySalt
    val ue = genAes(encrypt = true, genHash("SHA-256", keySalt), new Array[Byte](16), fileKey, "NoPadding")
    val o = genHash("SHA-256", oValSalt, u) ++ oValSalt ++ oKeySalt
    val oe = genAes(encrypt = true, genHash("SHA-256", oKeySalt, u), new Array[Byte](16), fileKey, "NoPadding")
    val iv = Array.tabulate(16)(i => ((i * 37 + 11) & 0xff).toByte)
    encryptedOnePage(
      s"<< /Filter /Standard /V 5 /R 5 /Length 256 /P $GenP /O <${hex(o)}> /U <${hex(u)}> " +
        s"/OE <${hex(oe)}> /UE <${hex(ue)}> " +
        "/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> /StmF /StdCF /StrF /StdCF >>",
      data => iv ++ genAes(encrypt = true, fileKey, iv, data, "PKCS5Padding"),
      "BT /F1 12 Tf 72 700 Td (Decrypted AES-256 R5 content extracted.) Tj ET")
  }

  /** One-page PDF whose trailer carries /Encrypt — standard RC4 stream
    * cipher declaration. The parser must REPORT encryption (status
    * `encrypted` → pipeline `encrypted_pdf`), never mis-file it as
    * empty/broken (VERDICT r5 #4). */
  def encryptedPdf(): Array[Byte] = {
    assemble(Seq(
      1 -> bytes("<< /Type /Catalog /Pages 2 0 R >>"),
      2 -> bytes("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      3 -> bytes("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
      // content bytes present but (nominally) ciphered — must NOT surface
      4 -> streamObj("", bytes("BT /F1 12 Tf 72 700 Td (ciphertext-bytes) Tj ET")),
      5 -> bytes("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
      6 -> bytes("<< /Filter /Standard /V 2 /R 3 /Length 128 /P -44 >>")
    ), rootNum = 1, extraTrailer = " /Encrypt 6 0 R")
  }

  /** Cross-route exact-dedup plant (VERDICT r5 #3): this PDF and
    * [[crossRouteHtml]] carry the same heading + two paragraphs, so both
    * routes must emit byte-identical `normalized_text` (h1 and the 24pt
    * display heading both normalize to `# …`) and therefore the same
    * `norm_hash` — the property the `pdf_dedup_fixture` oracle gates. */
  def crossRoutePdf(): Array[Byte] = onePage(
    """BT /F2 24 Tf 72 720 Td (Shared Cross-Route Document) Tj ET
      |BT /F1 12 Tf 72 680 Td (This exact paragraph exists in both routes.) Tj ET
      |BT /F1 12 Tf 72 640 Td (A second matching paragraph closes the document.) Tj ET""".stripMargin)

  val crossRouteHtml: String =
    "<html><head><title>unrelated head title</title></head><body>" +
      "<h1>Shared Cross-Route Document</h1>" +
      "<p>This exact paragraph exists in both routes.</p>" +
      "<p>A second matching paragraph closes the document.</p>" +
      "</body></html>"

  private lazy val r3Keys: (Array[Byte], Array[Byte], Array[Byte]) = genR34Keys(3)

  /** Synthetic RC4-encrypted (R3, empty passwords) document `i` — the
    * PdfBench decryption-throughput probe: one page, ~170 words of
    * seed-derived text, stream RC4-encrypted with the per-object key. */
  def syntheticEncryptedDoc(i: Long): Array[Byte] = {
    val (o, u, fileKey) = r3Keys
    def word(seed: Long): String =
      "w" + java.lang.Math.floorMod(graft.ops.TextOps.mix64(seed), 9000L)
    val sb = new StringBuilder
    sb.append(s"BT /F1 18 Tf 72 740 Td (Encrypted document $i) Tj ET\n")
    sb.append("BT /F1 11 Tf 72 700 Td\n")
    (0 until 18).foreach { ln =>
      sb.append("(").append((0 until 9).map(k => word(i * 7919L + ln * 17L + k)).mkString(" "))
        .append(") Tj 0 -14 Td\n")
    }
    sb.append("ET")
    encryptedOnePage(
      s"<< /Filter /Standard /V 2 /R 3 /Length 128 /P $GenP /O <${hex(o)}> /U <${hex(u)}> >>",
      data => genRc4(genObjKey(fileKey, 4, aes = false), data),
      sb.toString)
  }

  /** Page whose text partly lives in a Form XObject invoked via `Do` (the
    * letterhead/report shape): direct page text + a form with its OWN font
    * resource and a /Matrix, invoked under a `cm` translation — the parser
    * must compose Matrix × CTM and merge resources. */
  def formXObjectPdf(): Array[Byte] = {
    assemble(Seq(
      1 -> bytes("<< /Type /Catalog /Pages 2 0 R >>"),
      2 -> bytes("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      3 -> bytes("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Resources << /Font << /F1 5 0 R >> /XObject << /Fx1 6 0 R >> >> /Contents 4 0 R >>"),
      4 -> streamObj("", bytes(
        "BT /F1 12 Tf 72 700 Td (Direct page text.) Tj ET\nq 1 0 0 1 0 -40 cm /Fx1 Do Q")),
      5 -> bytes("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
      6 -> streamObj("/Type /XObject /Subtype /Form /Matrix [1 0 0 1 0 -20] " +
        "/Resources << /Font << /F2 7 0 R >> >>",
        bytes("BT /F2 12 Tf 72 700 Td (Form XObject text.) Tj ET")),
      7 -> bytes("<< /Type /Font /Subtype /Type1 /BaseFont /Times-Roman >>")
    ), rootNum = 1)
  }

  /** Interactive form (round 6): /AcroForm /Fields with a text field, a
    * checkbox (/V as a name), and a parent.child hierarchy — the filled
    * data lives nowhere in the content streams. */
  def acroFormPdf(): Array[Byte] = {
    assemble(Seq(
      1 -> bytes("<< /Type /Catalog /Pages 2 0 R /AcroForm << /Fields [6 0 R 7 0 R 8 0 R] >> >>"),
      2 -> bytes("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      3 -> bytes("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
      4 -> streamObj("", bytes("BT /F1 12 Tf 72 700 Td (Application form below.) Tj ET")),
      5 -> bytes("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
      6 -> bytes("<< /FT /Tx /T (applicant) /V (Ada Lovelace) >>"),
      7 -> bytes("<< /FT /Btn /T (subscribed) /V /Yes >>"),
      8 -> bytes("<< /T (address) /Kids [9 0 R] >>"),
      9 -> bytes("<< /FT /Tx /T (city) /V (London) >>")
    ), rootNum = 1)
  }

  /** One-page doc with a trailer /Info dictionary (round 6): UTF-16BE
    * (BOM) title as a hex string, cp1252 author/subject, mixed-delimiter
    * keywords, and `D:` dates with offset and Z forms. */
  def docInfoPdf(): Array[Byte] = {
    val titleHex = "FEFF" + "Document Info Title".map(c => f"${c.toInt}%04X").mkString
    assemble(Seq(
      1 -> bytes("<< /Type /Catalog /Pages 2 0 R >>"),
      2 -> bytes("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      3 -> bytes("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
      4 -> streamObj("", bytes("BT /F1 12 Tf 72 700 Td (Body text for the info document.) Tj ET")),
      5 -> bytes("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
      6 -> bytes(s"<< /Title <$titleHex> /Author (Jane Q. Author) " +
        "/Subject (A concise subject line.) /Keywords (alpha, beta; gamma) " +
        "/CreationDate (D:20240102030405+01'00') /ModDate (D:20240601120000Z) >>")
    ), rootNum = 1, extraTrailer = " /Info 6 0 R")
  }

  /** Page with /Annots (round 6): a FreeText annotation (visible text the
    * content stream never paints), two /Link URI actions (internal +
    * external domains), and a mailto the pipeline must filter. */
  def annotsPdf(): Array[Byte] = {
    assemble(Seq(
      1 -> bytes("<< /Type /Catalog /Pages 2 0 R >>"),
      2 -> bytes("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      3 -> bytes("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R " +
        "/Annots [6 0 R 7 0 R 8 0 R 9 0 R] >>"),
      4 -> streamObj("", bytes("BT /F1 12 Tf 72 700 Td (Annotated body text.) Tj ET")),
      5 -> bytes("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
      6 -> bytes("<< /Type /Annot /Subtype /FreeText /Rect [100 100 300 140] " +
        "/Contents (A margin note worth keeping.) >>"),
      7 -> bytes("<< /Type /Annot /Subtype /Link /Rect [0 0 10 10] " +
        "/A << /S /URI /URI (https://elsewhere.example.org/x) >> >>"),
      8 -> bytes("<< /Type /Annot /Subtype /Link /Rect [0 0 10 10] " +
        "/A << /S /URI /URI (https://pdf.example.com/other) >> >>"),
      9 -> bytes("<< /Type /Annot /Subtype /Link /Rect [0 0 10 10] " +
        "/A << /S /URI /URI (mailto:nobody@example.com) >> >>")
    ), rootNum = 1)
  }

  /** Document with an /Outlines bookmark tree (round 6): two top-level
    * sections, the second with a child — section structure the content
    * streams don't carry. */
  def outlinePdf(): Array[Byte] = {
    assemble(Seq(
      1 -> bytes("<< /Type /Catalog /Pages 2 0 R /Outlines 6 0 R >>"),
      2 -> bytes("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      3 -> bytes("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
      4 -> streamObj("", bytes("BT /F1 12 Tf 72 700 Td (Sectioned body text.) Tj ET")),
      5 -> bytes("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
      6 -> bytes("<< /Type /Outlines /First 7 0 R /Last 8 0 R /Count 3 >>"),
      7 -> bytes("<< /Title (Introduction) /Parent 6 0 R /Next 8 0 R >>"),
      8 -> bytes("<< /Title (Results) /Parent 6 0 R /Prev 7 0 R /First 9 0 R /Last 9 0 R >>"),
      9 -> bytes("<< /Title (Detailed Results) /Parent 8 0 R >>")
    ), rootNum = 1)
  }

  /** Deterministic synthetic PDF document `i` — the PDF-route counterpart
    * of PagesGen's HTML pages (throughput probes, mixed-corpus tests):
    * 2 pages, Flate-compressed streams, a heading + ~18 body lines of
    * seed-derived tokens. Pure function of `i`. */
  def syntheticDoc(i: Long): Array[Byte] = {
    def word(seed: Long): String =
      "w" + java.lang.Math.floorMod(graft.ops.TextOps.mix64(seed), 9000L)
    def line(page: Int, ln: Int): String =
      (0 until 9).map(k => word(i * 10007L + page * 131L + ln * 17L + k)).mkString(" ")
    def pageOps(page: Int): String = {
      val sb = new StringBuilder
      sb.append(s"BT /F1 18 Tf 72 740 Td (Document $i page $page) Tj ET\n")
      sb.append("BT /F1 11 Tf 72 700 Td\n")
      (0 until 18).foreach { ln =>
        sb.append(s"(${line(page, ln)}) Tj 0 -14 Td\n")
      }
      sb.append("ET")
      sb.toString
    }
    twoPages(pageOps(0), pageOps(1), "BT /F1 11 Tf 72 120 Td (-- end --) Tj ET")
  }

  /** The frozen fixture corpus for the `pdf_fixture` driver query. */
  def fixtureDocs: Seq[(String, Array[Byte])] = Seq(
    "plain" -> onePage(
      """BT /F2 24 Tf 72 720 Td (Annual Report) Tj ET
        |BT /F1 12 Tf 72 680 Td (The first body line.) Tj 0 -16 Td (The second body line.) Tj ET
        |BT /F1 12 Tf 72 600 Td (A separate paragraph block.) Tj ET""".stripMargin),
    "flate" -> onePageFlate(
      """BT /F1 12 Tf 72 700 Td (Compressed content stream works.) Tj ET"""),
    "escapes" -> onePage(
      """BT /F1 12 Tf 72 700 Td (Parens \(nested\) and a backslash \\ and octal \101) Tj ET
        |BT /F1 12 Tf 72 680 Td <48656C6C6F2068657821> Tj ET""".stripMargin),
    "kerning" -> onePage(
      """BT /F1 12 Tf 72 700 Td [(Ker) 20 (ned) -250 (words) -300 (here)] TJ ET"""),
    "twopage" -> twoPages(
      "BT /F1 12 Tf 72 700 Td (Page one text.) Tj ET",
      "BT /F1 12 Tf 72 700 Td (Page two part A.) Tj ET",
      "BT /F1 12 Tf 72 660 Td (Page two part B.) Tj ET"),
    "tounicode" -> type0WithToUnicode(
      Seq(1 -> "P", 2 -> "D", 3 -> "F", 4 -> "!", 5 -> " ", 6 -> "map"),
      tjHex = "000100020003000500060004"),
    "objstm" -> objectStreamPdf(
      "BT /F1 12 Tf 72 700 Td (Object stream page.) Tj ET"),
    "corrupt" -> bytes("%PDF-1.4\nthis is not a valid body"),
    "notpdf" -> bytes("plain text, not a PDF at all"),
    "encrypted" -> encryptedPdf(),
    "crossroute" -> crossRoutePdf(),
    "formxobj" -> formXObjectPdf(),
    "acroform" -> acroFormPdf(),
    "docinfo" -> docInfoPdf(),
    "annots" -> annotsPdf(),
    "outline" -> outlinePdf(),
    "rc4enc" -> rc4EncryptedPdf(),
    "aesv2enc" -> aesv2EncryptedPdf(),
    "aes256enc" -> aes256EncryptedPdf())
}
