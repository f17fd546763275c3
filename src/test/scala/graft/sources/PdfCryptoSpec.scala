package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Round-6 standard-security-handler decryption: documents whose USER (or
  * owner) password is empty — the dominant "encrypted" class in a crawl
  * (permission restrictions, not secrecy) — must decrypt and extract;
  * genuinely password-protected documents must still report `encrypted`.
  * The fixtures come from PdfGen's INDEPENDENT writer-side implementation
  * of the ISO 32000 §7.6 algorithms, so parser/generator agreement pins
  * both against the public spec. */
class PdfCryptoSpec extends AnyFunSuite {

  private def texts(pdf: Array[Byte]): Vector[String] =
    PdfParser.parse(pdf, "application/pdf").map(_.text)

  test("RC4-128 (V2/R3) with empty passwords decrypts and extracts") {
    val res = PdfParser.parseDetailed(PdfGen.rc4EncryptedPdf(), "application/pdf")
    assert(res.status == "ok")
    assert(res.blocks.map(_.text) == Vector("Decrypted RC4 content extracted."))
    assert(!res.truncated)
  }

  test("AES-128 crypt filter (V4/R4 /AESV2) with empty passwords decrypts and extracts") {
    val res = PdfParser.parseDetailed(PdfGen.aesv2EncryptedPdf(), "application/pdf")
    assert(res.status == "ok")
    assert(res.blocks.map(_.text) == Vector("Decrypted AESV2 content extracted."))
  }

  test("AES-256 (V5/R6 /AESV3) with empty passwords decrypts and extracts") {
    val res = PdfParser.parseDetailed(PdfGen.aes256EncryptedPdf(), "application/pdf")
    assert(res.status == "ok")
    assert(res.blocks.map(_.text) == Vector("Decrypted AES-256 content extracted."))
  }

  test("AES-256 revision 5 (pre-ISO single-SHA-256 hash) decrypts and extracts") {
    val res = PdfParser.parseDetailed(PdfGen.aes256R5EncryptedPdf(), "application/pdf")
    assert(res.status == "ok")
    assert(res.blocks.map(_.text) == Vector("Decrypted AES-256 R5 content extracted."))
  }

  test("a REAL password still reports encrypted (no guessing)") {
    // flip one byte of /U in the RC4 doc: neither empty-password path can
    // authenticate any more → encrypted, never garbage text
    val pdf = PdfGen.rc4EncryptedPdf()
    val s = new String(pdf, "ISO-8859-1")
    val uIdx = s.indexOf("/U <")
    assert(uIdx > 0)
    val flipped = (s.substring(0, uIdx + 4) +
      (if (s.charAt(uIdx + 4) == '0') '1' else '0') + s.substring(uIdx + 5)).getBytes("ISO-8859-1")
    val res = PdfParser.parseDetailed(flipped, "application/pdf")
    assert(res.status == "encrypted")
    assert(res.blocks.isEmpty)
  }

  test("declared-but-malformed /Encrypt still reports encrypted (fixture doc)") {
    assert(PdfParser.parseDetailed(PdfGen.encryptedPdf(), "application/pdf").status == "encrypted")
  }

  test("scrapePdf routes decrypted docs as ok and protected docs as encrypted_pdf") {
    val ok = graft.pipeline.ScrapePipeline.scrapePdf(
      PdfGen.rc4EncryptedPdf(), "https://pdf.example.com/rc4.pdf")
    assert(ok.status == "ok")
    assert(ok.text_content == "Decrypted RC4 content extracted.")
    val locked = graft.pipeline.ScrapePipeline.scrapePdf(
      PdfGen.encryptedPdf(), "https://pdf.example.com/locked.pdf")
    assert(locked.status == "encrypted_pdf")
  }

  test("RC4 is an involution for deterministic key/data sweeps") {
    (1 to 30).foreach { seed =>
      val keyLen = 1 + (seed % 16)
      val key = Array.tabulate(keyLen)(i => graft.ops.TextOps.mix64(seed * 31L + i).toByte)
      val data = Array.tabulate(64 + seed)(i => graft.ops.TextOps.mix64(seed * 131L + i).toByte)
      val twice = PdfCrypto.rc4(key, PdfCrypto.rc4(key, data))
      assert(java.util.Arrays.equals(twice, data), s"seed=$seed")
    }
  }

  test("RC4 of a known vector (public test vector: key 'Key', 'Plaintext')") {
    val out = PdfCrypto.rc4("Key".getBytes("US-ASCII"), "Plaintext".getBytes("US-ASCII"))
    assert(out.map(b => f"${b & 0xff}%02x").mkString == "bbf316e8d940af0ad3")
  }

  test("pdfDateToIso: offset, Z, partial, and garbage forms") {
    assert(PdfParser.pdfDateToIso("D:20240102030405+01'00'") == "2024-01-02T03:04:05+01:00")
    assert(PdfParser.pdfDateToIso("D:20240601120000Z") == "2024-06-01T12:00:00Z")
    assert(PdfParser.pdfDateToIso("D:2024") == "2024-01-01T00:00:00")
    assert(PdfParser.pdfDateToIso("20240102") == "2024-01-02T00:00:00")
    assert(PdfParser.pdfDateToIso("not a date") == "not a date")
    assert(PdfParser.pdfDateToIso("") == "")
  }

  test("decryption fuzz: mutated encrypted docs never throw") {
    Seq(PdfGen.rc4EncryptedPdf(), PdfGen.aesv2EncryptedPdf(), PdfGen.aes256EncryptedPdf())
      .zipWithIndex.foreach { case (orig, di) =>
        (0 until 40).foreach { seed =>
          val b = orig.clone()
          val p1 = math.floorMod(graft.ops.TextOps.mix64(seed * 131L + di), b.length.toLong).toInt
          seed % 3 match {
            case 0 => b(p1) = (b(p1) ^ 0x5a).toByte
            case 1 => b(p1) = 0
            case _ =>
          }
          val bytes = if (seed % 3 == 2) java.util.Arrays.copyOfRange(b, 0, math.max(8, p1)) else b
          PdfParser.parse(bytes, "application/pdf") // must not throw
        }
      }
  }
}
