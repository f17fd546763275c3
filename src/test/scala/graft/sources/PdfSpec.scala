package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** From-scratch PDF text/layout extractor (round 5 — replaces the declared
  * stub for the north-rule's PDF/layout stage). Each test pins one feature
  * of the supported subset against PDFs built by the independent PdfGen
  * writer; adversarial cases pin the never-throws contract. */
class PdfSpec extends AnyFunSuite {

  private def texts(pdf: Array[Byte]): Vector[String] =
    PdfParser.parse(pdf, "application/pdf").map(_.text)

  test("uncompressed content stream: lines, blocks, heading classification") {
    val blocks = PdfParser.parse(PdfGen.fixtureDocs.toMap.apply("plain"), "application/pdf")
    assert(blocks.map(_.kind) == Vector("heading", "text", "text"))
    assert(blocks(0).text == "Annual Report")
    assert(blocks(1).text == "The first body line.\nThe second body line.")
    assert(blocks(2).text == "A separate paragraph block.")
    // geometry: heading sits above the body, blocks carry plausible bboxes
    assert(blocks(0).y0 > blocks(1).y0)
    assert(blocks.forall(b => b.x1 > b.x0))
  }

  test("FlateDecode content stream inflates and parses") {
    assert(texts(PdfGen.fixtureDocs.toMap.apply("flate")) ==
      Vector("Compressed content stream works."))
  }

  test("literal-string escapes (parens, backslash, octal) and hex strings") {
    assert(texts(PdfGen.fixtureDocs.toMap.apply("escapes")) ==
      Vector("Parens (nested) and a backslash \\ and octal A\nHello hex!"))
  }

  test("TJ kerning: large negative adjustments become spaces, small ones do not") {
    assert(texts(PdfGen.fixtureDocs.toMap.apply("kerning")) == Vector("Kerned words here"))
  }

  test("two pages, /Contents array, resources inherited from the Pages node") {
    val blocks = PdfParser.parse(PdfGen.fixtureDocs.toMap.apply("twopage"), "application/pdf")
    assert(blocks.map(b => (b.page, b.text)) == Vector(
      (0, "Page one text."), (1, "Page two part A."), (1, "Page two part B.")))
  }

  test("BOM-prefixed UTF-16BE literal strings decode (PDF 32000 7.9.2.2)") {
    // "Héllo" as UTF-16BE with BOM, via octal escapes inside a literal string
    val utf16 = "\\376\\377\\000H\\000\\351\\000l\\000l\\000o"
    val pdf = PdfGen.onePage(s"BT /F1 12 Tf 72 700 Td ($utf16) Tj ET")
    assert(texts(pdf) == Vector("Héllo"))
  }

  test("Type0 font decodes through its ToUnicode CMap (2-byte codes)") {
    assert(texts(PdfGen.fixtureDocs.toMap.apply("tounicode")) == Vector("PDF map!"))
  }

  test("Type0 font WITHOUT ToUnicode yields no text (documented limit, no crash)") {
    val pdf = PdfGen.type0WithToUnicode(Seq(1 -> "X"), "0001")
    // strip the ToUnicode entry to simulate the unmappable case
    val s = new String(pdf, "ISO-8859-1").replace("/ToUnicode 6 0 R", "")
    assert(texts(s.getBytes("ISO-8859-1")).isEmpty)
  }

  test("ASCII85Decode content streams (independent encoder in the test)") {
    // independent Ascii85 encoder — shares nothing with the parser
    def a85(data: Array[Byte]): String = {
      val sb = new StringBuilder
      data.grouped(4).foreach { g =>
        var t = 0L
        g.foreach(b => t = (t << 8) | (b & 0xff))
        t <<= 8 * (4 - g.length)
        if (t == 0 && g.length == 4) sb.append('z')
        else {
          val cs = new Array[Char](5)
          var v = t
          (4 to 0 by -1).foreach { i => cs(i) = ('!' + (v % 85)).toChar; v /= 85 }
          (0 until g.length + 1).foreach(i => sb.append(cs(i)))
        }
      }
      sb.append("~>").toString
    }
    val ops = "BT /F1 12 Tf 72 700 Td (Ascii85 stream works.) Tj ET"
    val enc = a85(ops.getBytes("ISO-8859-1"))
    val body = "%PDF-1.4\n" +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>\nendobj\n" +
      s"4 0 obj\n<< /Filter /ASCII85Decode /Length ${enc.length} >>\nstream\n$enc\nendstream\nendobj\n" +
      "5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n" +
      "trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n"
    assert(texts(body.getBytes("ISO-8859-1")) == Vector("Ascii85 stream works."))
  }

  test("RunLengthDecode content streams (independent encoder in the test)") {
    def rle(data: Array[Byte]): Array[Byte] = {
      // naive independent encoder: literal runs of ≤8 plus one repeat run
      val out = new java.io.ByteArrayOutputStream()
      data.grouped(8).foreach { g =>
        out.write(g.length - 1); out.write(g, 0, g.length)
      }
      out.write(257 - 4); out.write(' ') // 4 repeated spaces
      out.write(128) // EOD
      out.toByteArray
    }
    val ops = "BT /F1 12 Tf 72 700 Td (RLE stream works.) Tj ET"
    // the 4 trailing spaces land OUTSIDE the ops (after ET) — harmless ws
    val enc = rle(ops.getBytes("ISO-8859-1"))
    val body = new java.io.ByteArrayOutputStream()
    body.write(("%PDF-1.4\n" +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>\nendobj\n" +
      s"4 0 obj\n<< /Filter /RunLengthDecode /Length ${enc.length} >>\nstream\n").getBytes("ISO-8859-1"))
    body.write(enc)
    body.write(("\nendstream\nendobj\n" +
      "5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n" +
      "trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n").getBytes("ISO-8859-1"))
    assert(texts(body.toByteArray) == Vector("RLE stream works."))
  }

  test("PDF 1.5 object streams: page + font dicts inside a Flate ObjStm") {
    assert(texts(PdfGen.fixtureDocs.toMap.apply("objstm")) == Vector("Object stream page."))
  }

  test("never throws: corrupt body, truncated stream, binary junk, empty") {
    assert(PdfParser.parse(PdfGen.fixtureDocs.toMap.apply("corrupt"), "application/pdf").isEmpty)
    val valid = PdfGen.fixtureDocs.toMap.apply("flate")
    // truncate inside the Flate data: salvage what inflates, never throw
    val truncated = java.util.Arrays.copyOfRange(valid, 0, valid.length / 2)
    PdfParser.parse(truncated, "application/pdf") // must not throw
    val junk = Array.tabulate[Byte](4096)(i => (i * 37 + 11).toByte)
    junk(0) = '%'; junk(1) = 'P'; junk(2) = 'D'; junk(3) = 'F'
    assert(PdfParser.parse(junk, "application/pdf").isEmpty)
    assert(PdfParser.parse(Array.emptyByteArray, "application/pdf").isEmpty)
    assert(PdfParser.parse(null, "application/pdf").isEmpty)
  }

  test("encrypted PDFs are skipped by design") {
    val pdf = PdfGen.onePage("BT /F1 12 Tf 72 700 Td (secret) Tj ET")
    val s = new String(pdf, "ISO-8859-1")
      .replace("/Root 1 0 R", "/Root 1 0 R /Encrypt 9 0 R")
    assert(texts(s.getBytes("ISO-8859-1")).isEmpty)
  }

  test("non-PDF bytes fall through to the text passthrough parser") {
    val blocks = PdfParser.parse("para one\n\npara two".getBytes("UTF-8"), "text/plain")
    assert(blocks.map(_.text) == Vector("para one", "para two"))
  }

  test("extractText concatenates blocks in reading order") {
    assert(PdfParser.extractText(PdfGen.fixtureDocs.toMap.apply("plain")) ==
      "Annual Report\n\nThe first body line.\nThe second body line.\n\nA separate paragraph block.")
  }

  test("determinism: identical bytes parse to identical blocks") {
    val pdf = PdfGen.fixtureDocs.toMap.apply("plain")
    assert(PdfParser.parse(pdf, "application/pdf") == PdfParser.parse(pdf, "application/pdf"))
  }

  test("adversarial: chained-Flate decompression bomb is capped, not an OOM task kill") {
    // ~100 MB of zeros double-deflated into a few hundred bytes; /Filter
    // [/Fl /Fl] makes decode() re-inflate multiplicatively. The 64 MiB cap
    // must truncate-and-salvage (OutOfMemoryError is an Error — it would
    // escape Exception containment and kill the task).
    def deflate(d: Array[Byte]): Array[Byte] = {
      val df = new java.util.zip.Deflater(); df.setInput(d); df.finish()
      val out = new java.io.ByteArrayOutputStream(); val buf = new Array[Byte](8192)
      while (!df.finished()) out.write(buf, 0, df.deflate(buf))
      df.end(); out.toByteArray
    }
    val bomb = deflate(deflate(new Array[Byte](100 << 20)))
    val body = new java.io.ByteArrayOutputStream()
    body.write("%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n".getBytes("ISO-8859-1"))
    body.write("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n".getBytes("ISO-8859-1"))
    body.write("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n".getBytes("ISO-8859-1"))
    body.write(s"4 0 obj\n<< /Filter [/Fl /Fl] /Length ${bomb.length} >>\nstream\n".getBytes("ISO-8859-1"))
    body.write(bomb)
    body.write("\nendstream\nendobj\ntrailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n".getBytes("ISO-8859-1"))
    val t0 = System.nanoTime()
    PdfParser.parse(body.toByteArray, "application/pdf") // must not throw / OOM
    assert((System.nanoTime() - t0) / 1e9 < 30.0)
  }

  test("adversarial: self-referencing /Kids does not fan out exponentially") {
    val body = "%PDF-1.4\n" +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [2 0 R 2 0 R] /Count 1 >>\nendobj\n" +
      "trailer\n<< /Size 3 /Root 1 0 R >>\n%%EOF\n"
    val t0 = System.nanoTime()
    assert(PdfParser.parse(body.getBytes("ISO-8859-1"), "application/pdf").isEmpty)
    assert((System.nanoTime() - t0) / 1e9 < 5.0) // 2^64 walk would never return
  }

  test("scale-via-Tm headings classify like Tf-sized ones (Tj and TJ)") {
    val pdf = PdfGen.onePage(
      """BT /F1 1 Tf 24 0 0 24 72 720 Tm [(Scaled Title)] TJ ET
        |BT /F1 12 Tf 72 680 Td (Body line one.) Tj 0 -16 Td (Body line two.) Tj ET""".stripMargin)
    val blocks = PdfParser.parse(pdf, "application/pdf")
    assert(blocks.map(b => (b.kind, b.text)) == Vector(
      ("heading", "Scaled Title"), ("text", "Body line one.\nBody line two.")))
  }

  test("a document that merely MENTIONS /Encrypt in content is not dropped") {
    val pdf = PdfGen.onePage(
      """BT /F1 12 Tf 72 700 Td (see the /Encrypt entry for details) Tj ET""")
    assert(texts(pdf) == Vector("see the /Encrypt entry for details"))
  }

  test("fuzz: deterministic byte mutations of valid PDFs never throw") {
    // mutation fuzz over every fixture doc: flip / zero / truncate at
    // mix64-derived positions. Pins the never-throws contract against the
    // whole parser surface (lexer, inflater, page walk, interpreter).
    val docs = PdfGen.fixtureDocs.filter(_._2.length > 16)
    docs.foreach { case (name, orig) =>
      (0 until 60).foreach { seed =>
        val b = orig.clone()
        val p1 = math.floorMod(graft.ops.TextOps.mix64(seed * 31L + name.hashCode), b.length.toLong).toInt
        val p2 = math.floorMod(graft.ops.TextOps.mix64(seed * 131L + 7), b.length.toLong).toInt
        seed % 3 match {
          case 0 => b(p1) = (b(p1) ^ 0x5a).toByte
          case 1 => b(p1) = 0; b(p2) = (b(p2) ^ 0xff).toByte
          case _ => // truncation
        }
        val bytes = if (seed % 3 == 2) java.util.Arrays.copyOfRange(b, 0, math.max(8, p1)) else b
        PdfParser.parse(bytes, "application/pdf") // must not throw
      }
    }
  }

  test("adversarial: reference cycles dead-end instead of recursing forever") {
    val body = "%PDF-1.4\n" +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n3 0 R\nendobj\n" + // Pages resolves into a ref cycle
      "3 0 obj\n2 0 R\nendobj\n" +
      "trailer\n<< /Size 4 /Root 1 0 R >>\n%%EOF\n"
    assert(PdfParser.parse(body.getBytes("ISO-8859-1"), "application/pdf").isEmpty)
  }

  test("/Widths tables drive TJ word-gap detection and bbox extent (round 6)") {
    // space glyph width 600 → word-gap threshold −300: the −250 adjustment
    // is kerning (no space), −400 is a positional word gap. A,B,C carry
    // widths 1000/800/600, so extents are exact, not char-count guesses.
    val widths = "[600 " + Seq.fill(32)("500").mkString(" ") + " 1000 800 600]"
    val ops = "BT /F1 10 Tf 72 700 Td [(A) -250 (B) -400 (C)] TJ ET\n" +
      "BT /F1 10 Tf 72 600 Td (AAAA) Tj ET"
    val body = "%PDF-1.4\n" +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 5 0 R >> >> " +
      "/Contents 4 0 R >>\nendobj\n" +
      s"4 0 obj\n<< /Length ${ops.length} >>\nstream\n" + ops + "\nendstream\nendobj\n" +
      "5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Courier " +
      s"/FirstChar 32 /Widths $widths >>\nendobj\n" +
      "trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n"
    val blocks = PdfParser.parse(body.getBytes("ISO-8859-1"), "application/pdf")
    assert(blocks.map(_.text) == Vector("AB C", "AAAA"))
    // TJ advance: 1000 +250 +800 +400 +600 = 3050 units at size 10 → 30.5
    assert(math.abs(blocks(0).x1 - 102.5f) < 0.01f)
    // Tj advance: 4 × 1000 units at size 10 → 40
    assert(math.abs(blocks(1).x1 - 112.0f) < 0.01f)
    // a font WITHOUT /Widths keeps the −150 heuristic (−250 IS a gap)
    val noW = PdfGen.onePage("BT /F1 10 Tf 72 700 Td [(A) -250 (B) -400 (C)] TJ ET")
    assert(PdfParser.parse(noW, "application/pdf").map(_.text) == Vector("A B C"))
  }

  test("Tc/Tw/Tz spacing operators shape advances and restore under q/Q (round 6)") {
    val widths = "[600 " + Seq.fill(32)("500").mkString(" ") + " 1000 800 600]"
    // inside q..Q: 2 Tc + 5 Tw + 200 Tz → (2400/1000·10 + 3·2 + 1·5)·2 = 70
    // after Q: spacing restored → plain width advance 24
    val ops = "q 2 Tc 5 Tw 200 Tz\nBT /F1 10 Tf 72 700 Td (A B) Tj ET\nQ\n" +
      "BT /F1 10 Tf 72 600 Td (A B) Tj ET"
    val body = "%PDF-1.4\n" +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 5 0 R >> >> " +
      "/Contents 4 0 R >>\nendobj\n" +
      s"4 0 obj\n<< /Length ${ops.length} >>\nstream\n" + ops + "\nendstream\nendobj\n" +
      "5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Courier " +
      s"/FirstChar 32 /Widths $widths >>\nendobj\n" +
      "trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n"
    val blocks = PdfParser.parse(body.getBytes("ISO-8859-1"), "application/pdf")
    assert(blocks.map(_.text) == Vector("A B", "A B"))
    assert(math.abs(blocks(0).x1 - 142f) < 0.01f)
    assert(math.abs(blocks(1).x1 - 96f) < 0.01f)
  }

  test("Type0 /W CID widths drive advance and bbox extent (round 6)") {
    val base = PdfGen.type0WithToUnicode(
      Seq(1 -> "A", 2 -> "B", 3 -> "C", 4 -> "D", 5 -> "E"), tjHex = "00010002000300040005")
    // inject a descendant CIDFont carrying /DW + /W (both range forms)
    val s = new String(base, "ISO-8859-1")
      .replace("/Encoding /Identity-H", "/Encoding /Identity-H /DescendantFonts [7 0 R]")
      .replace("trailer",
        "7 0 obj\n<< /Type /Font /Subtype /CIDFontType2 /DW 1000 /W [1 [500 600] 3 5 250] >>\nendobj\ntrailer")
    val blocks = PdfParser.parse(s.getBytes("ISO-8859-1"), "application/pdf")
    assert(blocks.map(_.text) == Vector("ABCDE"))
    // 500+600+250+250+250 = 1850 units at size 12 → 22.2 from x 72
    assert(math.abs(blocks(0).x1 - (72f + 1.85f * 12f)) < 0.01f)
    // the fixture WITHOUT /DescendantFonts keeps the char-count fallback
    val fallback = PdfParser.parse(base, "application/pdf")
    assert(math.abs(fallback(0).x1 - (72f + 5 * 12f * 0.5f)) < 0.01f)
  }

  test("AcroForm field values extract with dotted hierarchy (round 6)") {
    val blocks = PdfParser.parse(PdfGen.acroFormPdf(), "application/pdf")
    assert(blocks.map(b => (b.kind, b.text)) == Vector(
      ("text", "Application form below."),
      ("field", "applicant: Ada Lovelace"),
      ("field", "subscribed: Yes"),
      ("field", "address.city: London")))
    // route: fields map onto list blocks, so short name:value rows survive
    // the classifier, and markdown renders them as bullets
    val row = graft.pipeline.ScrapePipeline.scrapePdf(
      PdfGen.acroFormPdf(), "https://pdf.example.com/form.pdf")
    assert(row.norm_meta.blocks_accepted == 4)
    assert(row.content.contains("- applicant: Ada Lovelace"))
  }

  test("/Outlines bookmarks extract as (depth, title) in tree order (round 6)") {
    val res = PdfParser.parseDetailed(PdfGen.outlinePdf(), "application/pdf")
    assert(res.outline == Vector(
      (1, "Introduction"), (1, "Results"), (2, "Detailed Results")))
    val row = graft.pipeline.ScrapePipeline.scrapePdf(
      PdfGen.outlinePdf(), "https://pdf.example.com/o.pdf")
    assert(row.custom.get("pdf_outline").contains(
      "1|Introduction\n1|Results\n2|Detailed Results"))
  }

  test("adversarial: /Outlines /Next cycle terminates") {
    val body = "%PDF-1.4\n" +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R /Outlines 4 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R >>\nendobj\n" +
      "4 0 obj\n<< /Type /Outlines /First 5 0 R >>\nendobj\n" +
      "5 0 obj\n<< /Title (a) /Next 6 0 R >>\nendobj\n" +
      "6 0 obj\n<< /Title (b) /Next 5 0 R /First 6 0 R >>\nendobj\n" + // both cycle forms
      "trailer\n<< /Size 7 /Root 1 0 R >>\n%%EOF\n"
    val res = PdfParser.parseDetailed(body.getBytes("ISO-8859-1"), "application/pdf")
    assert(res.outline == Vector((1, "a"), (1, "b")))
  }

  test("adversarial: AcroForm /Kids cycle terminates") {
    val body = "%PDF-1.4\n" +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R /AcroForm << /Fields [4 0 R] >> >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R >>\nendobj\n" +
      "4 0 obj\n<< /T (a) /V (x) /Kids [4 0 R 5 0 R] >>\nendobj\n" +
      "5 0 obj\n<< /T (b) /V (y) /Kids [4 0 R] >>\nendobj\n" +
      "trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n"
    val blocks = PdfParser.parse(body.getBytes("ISO-8859-1"), "application/pdf")
    assert(blocks.map(_.text) == Vector("a: x", "a.b: y"))
  }

  test("Form XObjects: Do interprets the form with merged resources and composed matrix (round 6)") {
    val blocks = PdfParser.parse(PdfGen.formXObjectPdf(), "application/pdf")
    assert(blocks.map(_.text) == Vector("Direct page text.", "Form XObject text."))
    // device y of the form text: 700 (Td) − 20 (/Matrix) − 40 (cm) = 640
    assert(math.abs(blocks(1).y0 - 640f) < 0.01f)
  }

  test("adversarial: self-invoking Form XObject terminates (cycle kill)") {
    val body = "%PDF-1.4\n" +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 6 0 R >> " +
      "/XObject << /Fx 4 0 R >> >> /Contents 5 0 R >>\nendobj\n" +
      // the form's resources point BACK at itself → /Fx Do inside recurses
      "4 0 obj\n<< /Type /XObject /Subtype /Form /Resources << /XObject << /Fx 4 0 R >> " +
      "/Font << /F1 6 0 R >> >> /Length 44 >>\nstream\n" +
      "BT /F1 12 Tf 0 0 Td (loop) Tj ET\n/Fx Do\n" +
      "\nendstream\nendobj\n" +
      "5 0 obj\n<< /Length 42 >>\nstream\n" +
      "BT /F1 12 Tf 72 700 Td (top) Tj ET\n/Fx Do\n" +
      "\nendstream\nendobj\n" +
      "6 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n" +
      "trailer\n<< /Size 7 /Root 1 0 R >>\n%%EOF\n"
    val t0 = System.nanoTime()
    val blocks = PdfParser.parse(body.getBytes("ISO-8859-1"), "application/pdf")
    assert((System.nanoTime() - t0) / 1e9 < 5.0)
    assert(blocks.exists(_.text.contains("top")))
    assert(blocks.exists(_.text.contains("loop"))) // first entry extracts; recursion stops
  }

  test("inline images (BI..ID..EI) are skipped, not tokenized as operators (round 6)") {
    // the binary payload contains an unbalanced '(' and fake text operators
    // that would garble the stream if lexed
    val ops = "BT /F1 12 Tf 72 700 Td (before image.) Tj ET\n" +
      "BI /W 2 /H 2 /BPC 8 /CS /RGB ID  (BT (fake) Tj ÿþ EI\n" +
      "BT /F1 12 Tf 72 660 Td (after image.) Tj ET"
    val blocks = PdfParser.parse(PdfGen.onePage(ops), "application/pdf")
    assert(blocks.map(_.text) == Vector("before image.", "after image."))
  }

  test("adversarial: deeply nested arrays/dicts in content do not recurse unboundedly") {
    val nested = "[" * 10000 + "]" * 10000
    val pdf = PdfGen.onePage(s"BT /F1 12 Tf 72 700 Td (ok) Tj ET $nested")
    // nested garbage after the text ops must not break the extracted text
    assert(texts(pdf).headOption.contains("ok"))
  }
}
