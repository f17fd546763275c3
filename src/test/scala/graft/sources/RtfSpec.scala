package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** RTF extractor: control-word stream → paragraphs, skipped destinations,
  * escapes, unicode with \uc fallbacks, \info metadata, totality. */
class RtfSpec extends AnyFunSuite {

  private def rtf(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  test("paragraphs, tabs, escapes; font/color tables never leak") {
    val doc = """{\rtf1\ansi{\fonttbl{\f0 Times New Roman;}}{\colortbl;\red0\green0\blue0;}
      |\f0\fs24 First paragraph with \b bold\b0  inside.\par
      |Second\tab column \{braced\} and 50\'25 done.\par}""".stripMargin
    val r = Rtf.parseDetailed(rtf(doc))
    assert(r.status == "ok" && !r.truncated)
    assert(r.blocks.map(_.text) == Vector(
      "First paragraph with bold inside.",
      "Second\tcolumn {braced} and 50% done."))
  }

  test("\\u unicode with \\uc fallback skip; \\~ nbsp") {
    // ordinary escaped string: Scala pre-processes \uXXXX inside RAW
    // strings, so \uc1/\u233 cannot appear in one
    val doc = "{\\rtf1\\uc1 caf\\u233 e au\\~lait\\par}"
    val r = Rtf.parseDetailed(rtf(doc))
    assert(r.blocks.map(_.text) == Vector("caf\u00e9 au\u00a0lait")) // \\~ = NBSP
  }

  test("\\info title/author captured as meta, not body text") {
    val doc = """{\rtf1{\info{\title Harbour Notes}{\author A. Keeper}{\creatim\yr2024}}Body only.\par}"""
    val r = Rtf.parseDetailed(rtf(doc))
    assert(r.blocks.map(_.text) == Vector("Body only."))
    assert(r.meta("title") == "Harbour Notes")
    assert(r.meta("author") == "A. Keeper")
    assert(!r.meta.contains(""))
  }

  test("\\* ignorable destinations and pict data are skipped") {
    val doc = """{\rtf1{\*\generator Writer 7;}{\pict 0a0b0c0d}kept\par}"""
    val r = Rtf.parseDetailed(rtf(doc))
    assert(r.blocks.map(_.text) == Vector("kept"))
  }

  test("\\bin raw bytes are skipped, never scanned as text") {
    val head = """{\rtf1{\*\objdata\bin8 """
    val bytes = head.getBytes("ISO-8859-1") ++
      Array[Byte]('\\', 'p', 'a', 'r', ' ', 'X', '{', '}') ++ // raw junk incl. rtf-looking bytes
      """}visible\par}""".getBytes("ISO-8859-1")
    val r = Rtf.parseDetailed(bytes)
    assert(r.blocks.map(_.text) == Vector("visible"))
  }

  test("\\bin with a parameter past the old 1e6 digit cap skips exactly N bytes") {
    // 1500000 > 1e6: every digit must be consumed (leftover digits would
    // shift the skip start) and all N raw bytes skipped (round-7 fix)
    val n = 1500000
    val head = s"{\\rtf1{\\*\\objdata\\bin$n "
    val junk = new Array[Byte](n)
    java.util.Arrays.fill(junk, 'Z'.toByte)
    junk(0) = '\\'; junk(1) = 'p'; junk(2) = 'a'; junk(3) = 'r' // rtf-looking
    val bytes = head.getBytes("ISO-8859-1") ++ junk ++
      "}after\\par}".getBytes("ISO-8859-1")
    val r = Rtf.parseDetailed(bytes)
    assert(r.blocks.map(_.text) == Vector("after"), s"got ${r.blocks.map(_.text)}")
  }

  test("\\'hh decodes through windows-1252: smart quotes, not C1 controls") {
    // 0x93/0x94 are curly quotes and 0x97 an em-dash in cp1252; latin-1
    // would turn them into invisible control characters
    val doc = "{\\rtf1 \\'93hi\\'94 \\'97 ok\\par}"
    val r = Rtf.parseDetailed(doc.getBytes("ISO-8859-1"))
    assert(r.blocks.map(_.text) == Vector("“hi” — ok"),
      s"got ${r.blocks.map(_.text)}")
  }

  test("\\u fallback skip applies even for unrepresentable codepoints") {
    val doc = "{\\rtf1\\uc2 a\\u0 XYb\\par}" // \u0 invalid: emit nothing, skip 2
    val r = Rtf.parseDetailed(doc.getBytes("ISO-8859-1"))
    assert(r.blocks.map(_.text) == Vector("ab"), s"got ${r.blocks.map(_.text)}")
  }

  test("totality: garbage, non-rtf, empty, runaway braces") {
    assert(Rtf.parseDetailed("plain text".getBytes("UTF-8")).status == "not_rtf")
    assert(Rtf.parseDetailed(Array.emptyByteArray).status == "not_rtf")
    assert(Rtf.parseDetailed(null).status == "not_rtf")
    val runaway = "{\\rtf1 " + ("{" * 10000) + "deep" + "}" * 10000 + "\\par}"
    val r = Rtf.parseDetailed(rtf(runaway))
    assert(r.truncated, "group-depth cap must surface")
    val empty = Rtf.parseDetailed(rtf("""{\rtf1{\fonttbl{\f0 X;}}}"""))
    assert(empty.status == "empty")
  }

  test("routes through scrapeAny with content_type rtf and honest title") {
    val doc = """{\rtf1{\info{\title Meeting Minutes}}The quarterly goals were reviewed in detail.\par Attendees agreed on the plan.\par}"""
    val row = graft.pipeline.ExtractJob.scrapeAny(
      "https://files.example.com/minutes.rtf", rtf(doc))
    assert(row.status == "ok" && row.content_type == "rtf")
    assert(row.title == "Meeting Minutes")
    assert(row.word_count > 5)
    // non-rtf text still goes down the HTML route
    val html = graft.pipeline.ExtractJob.scrapeAny(
      "https://files.example.com/x.html", "<html><body><p>hi there</p></body></html>".getBytes("UTF-8"))
    assert(html.content_type != "rtf")
  }
}
