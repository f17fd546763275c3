package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Round-6 hardening of the PDF route (VERDICT r5 #1/#3/#4, ADVICE r5
  * #1/#3/#4): indirect /Length resolution, per-filter /DecodeParms
  * alignment, the aggregate per-document decode budget, and the rule that
  * EVERY containment bound surfaces as `PdfResult.truncated` — no silent
  * caps anywhere in the parser. */
class PdfHardeningSpec extends AnyFunSuite {

  private def b(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  private def deflate(d: Array[Byte]): Array[Byte] = {
    val df = new java.util.zip.Deflater(); df.setInput(d); df.finish()
    val out = new java.io.ByteArrayOutputStream(); val buf = new Array[Byte](8192)
    while (!df.finished()) out.write(buf, 0, df.deflate(buf))
    df.end(); out.toByteArray
  }

  /** Hand-rolled one-page PDF with a fully custom content-stream object
    * body (dict + raw bytes), for cases PdfGen deliberately cannot emit. */
  private def onePageWith(streamDict: String, data: Array[Byte], extraObjs: String = ""): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(b("%PDF-1.4\n"))
    out.write(b("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"))
    out.write(b("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"))
    out.write(b("3 0 obj\n<< /Type /Page /Parent 2 0 R " +
      "/Resources << /Font << /F1 6 0 R >> >> /Contents 4 0 R >>\nendobj\n"))
    out.write(b(s"4 0 obj\n<< $streamDict >>\nstream\n"))
    out.write(data)
    out.write(b("\nendstream\nendobj\n"))
    out.write(b("6 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n"))
    out.write(b(extraObjs))
    out.write(b("trailer\n<< /Size 9 /Root 1 0 R >>\n%%EOF\n"))
    out.toByteArray
  }

  test("indirect /Length: stream data containing 'endstream' bytes parses fully (ADVICE r5 #1)") {
    // the literal word endstream INSIDE the stream data — the lexical
    // salvage scan would truncate the stream mid-show and drop the tail
    val ops = "BT /F1 12 Tf 72 700 Td (before endstream and after it too.) Tj ET"
    val pdf = onePageWith(s"/Length 7 0 R", b(ops),
      extraObjs = s"7 0 obj\n${ops.length}\nendobj\n")
    val res = PdfParser.parseDetailed(pdf, "application/pdf")
    assert(res.status == "ok")
    assert(res.blocks.map(_.text) == Vector("before endstream and after it too."))
    assert(!res.truncated)
  }

  test("/DecodeParms aligns per filter stage on chained filters (ADVICE r5 #4)") {
    // predictor belongs to the SECOND Flate stage only; applying it after
    // the first stage (the old single-dict behavior) mangles the data
    val ops = "BT /F1 12 Tf 72 700 Td (Predictor roundtrip ok.) Tj ET"
    val row = b(ops)
    val predicted = new Array[Byte](row.length + 1) // PNG filter-type 0 row
    predicted(0) = 0
    System.arraycopy(row, 0, predicted, 1, row.length)
    val data = deflate(deflate(predicted))
    val pdf = onePageWith(
      s"/Filter [/FlateDecode /FlateDecode] " +
        s"/DecodeParms [null << /Predictor 12 /Columns ${row.length} >>] " +
        s"/Length ${data.length}", data)
    val res = PdfParser.parseDetailed(pdf, "application/pdf")
    assert(res.status == "ok")
    assert(res.blocks.map(_.text) == Vector("Predictor roundtrip ok."))
  }

  test("single-dict /DecodeParms on a single Flate stream still applies") {
    val ops = "BT /F1 12 Tf 72 700 Td (Single stage predictor.) Tj ET"
    val row = b(ops)
    val predicted = new Array[Byte](row.length + 1)
    predicted(0) = 0
    System.arraycopy(row, 0, predicted, 1, row.length)
    val data = deflate(predicted)
    val pdf = onePageWith(
      s"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns ${row.length} >> " +
        s"/Length ${data.length}", data)
    assert(PdfParser.parseDetailed(pdf, "application/pdf").blocks.map(_.text) ==
      Vector("Single stage predictor."))
  }

  test("aggregate decode budget bounds a many-stream inflate bomb and flags truncation (VERDICT r5 #1)") {
    // one 60 MiB-decoded stream (under the 64 MiB per-stream cap),
    // referenced 6 times from /Contents — 360 MiB total would blow past the
    // 256 MiB per-document budget; the parse must complete bounded AND
    // report truncation
    val bomb = deflate(new Array[Byte](60 << 20))
    val out = new java.io.ByteArrayOutputStream()
    out.write(b("%PDF-1.4\n"))
    out.write(b("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"))
    out.write(b("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"))
    out.write(b("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents [4 0 R 4 0 R 4 0 R 4 0 R 4 0 R 4 0 R] >>\nendobj\n"))
    out.write(b(s"4 0 obj\n<< /Filter /FlateDecode /Length ${bomb.length} >>\nstream\n"))
    out.write(bomb)
    out.write(b("\nendstream\nendobj\n"))
    out.write(b("trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n"))
    val t0 = System.nanoTime()
    val res = PdfParser.parseDetailed(out.toByteArray, "application/pdf")
    assert((System.nanoTime() - t0) / 1e9 < 30.0)
    assert(res.truncated, "budget exhaustion must be reported, not silent")
    assert(res.status == "empty") // zero bytes carry no text
  }

  test("page-tree page cap flags truncation (10k pages)") {
    val n = 10100
    val sb = new StringBuilder
    sb.append("%PDF-1.4\n")
    sb.append("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    sb.append((3 until 3 + n).map(i => s"$i 0 R").mkString(
      s"2 0 obj\n<< /Type /Pages /Kids [", " ", s"] /Count $n >>\nendobj\n"))
    (3 until 3 + n).foreach(i => sb.append(s"$i 0 obj\n<< /Type /Page /Parent 2 0 R >>\nendobj\n"))
    sb.append("trailer\n<< /Size 99999 /Root 1 0 R >>\n%%EOF\n")
    val res = PdfParser.parseDetailed(sb.toString.getBytes("ISO-8859-1"), "application/pdf")
    assert(res.truncated, "the 10k-page cap must be reported, not silent")
  }

  test("damaged Flate stream salvages AND flags truncation (ADVICE r5 #2)") {
    val ops = "BT /F1 12 Tf 72 700 Td (Salvage this partial content please.) Tj ET"
    val full = deflate(b(ops))
    val cut = java.util.Arrays.copyOfRange(full, 0, full.length - 6)
    val pdf = onePageWith(s"/Filter /FlateDecode /Length ${cut.length}", cut)
    val res = PdfParser.parseDetailed(pdf, "application/pdf")
    assert(res.truncated, "salvaged partial inflate must flag truncation")
  }

  test("interpreter operator guard flags truncation and keeps prior shows") {
    val ops = "BT /F1 12 Tf 72 700 Td (seen before guard.) Tj " +
      ("T* " * 4100000) + "(never reached) Tj ET"
    val res = PdfParser.parseDetailed(PdfGen.onePage(ops), "application/pdf")
    assert(res.truncated, "the 4M-operator guard must be reported, not silent")
    assert(res.blocks.exists(_.text.contains("seen before guard.")))
    assert(!res.blocks.exists(_.text.contains("never reached")))
  }

  test("tiny text blobs pass through regardless of length (4-byte magic only, ADVICE r5 #3)") {
    assert(PdfParser.parse(b("1234567"), "text/plain").map(_.text) == Vector("1234567"))
    assert(PdfParser.parse(b("12345678"), "text/plain").map(_.text) == Vector("12345678"))
    assert(PdfParser.parse(b("ab"), "text/plain").map(_.text) == Vector("ab"))
    assert(PdfParser.parseDetailed(b("ab"), "text/plain").status == "not_pdf")
    // non-text binary junk shorter than the old 8-byte floor: still empty
    assert(PdfParser.parse(Array[Byte](1, 2, 3), "application/octet-stream").isEmpty)
  }

  test("parseDetailed status taxonomy: ok / encrypted / empty / not_pdf") {
    val docs = PdfGen.fixtureDocs.toMap
    assert(PdfParser.parseDetailed(docs("flate"), "application/pdf").status == "ok")
    assert(PdfParser.parseDetailed(docs("encrypted"), "application/pdf").status == "encrypted")
    assert(PdfParser.parseDetailed(docs("corrupt"), "application/pdf").status == "empty")
    assert(PdfParser.parseDetailed(docs("notpdf"), "application/pdf").status == "not_pdf")
  }

  test("well-formed documents report truncated = false") {
    PdfGen.fixtureDocs.filter(d => d._1 != "corrupt" && d._1 != "notpdf").foreach { case (name, bytes) =>
      assert(!PdfParser.parseDetailed(bytes, "application/pdf").truncated, s"doc $name")
    }
  }
}
