package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.{Docx, DocxGen}

/**
 * Frozen DOCX fixture corpus + the `docx_fixture` driver query: every
 * block, metadata field, link, and error disposition of the
 * [[graft.sources.Docx]] extractor as `(test_case, seq, kind, text)` rows
 * against a transcribed VALUES oracle (the PdfGen/WarcGen pattern —
 * expected rows written from the format spec, not from running the
 * code). Tabs/newlines inside block text are replaced with visible
 * `<TAB>`/`<NL>` tokens on BOTH sides so the oracle SQL stays literal.
 */
object DocxFixture {

  def corpus: Seq[(String, Array[Byte])] = Seq(
    "report" -> DocxGen.report,
    "minimal" -> DocxGen.minimal,
    "deck" -> DocxGen.deck,
    "workbook" -> DocxGen.workbook,
    "book" -> DocxGen.book,
    "plain_zip" -> DocxGen.plainZip,
    "not_zip" -> "<html>nope</html>".getBytes("UTF-8"))

  /** Transcribed expected rows. */
  def expectedRows: Seq[(String, Long, String, String)] = Seq(
    ("book", 0L, "heading", "Winter"),
    ("book", 1L, "text", "Ice sealed the harbour mouth in January."),
    ("book", 2L, "text", "The keeper logged each frozen morning."),
    ("book", 3L, "heading", "Spring"),
    ("book", 4L, "text", "The first sloop cleared the point in April."),
    ("book", 100L, "meta:title", "The Harbour Year"),
    ("book", 101L, "meta:author", "A. Keeper"),
    ("book", 102L, "meta:subject", "maritime"),
    ("book", 104L, "meta:created", "2024-02-02"),
    ("deck", 0L, "heading", "Launch Plan"),
    ("deck", 1L, "text", "Ship the beta in October"),
    ("deck", 2L, "heading", "Risks"),
    ("deck", 3L, "text", "Vendor delay"),
    ("deck", 4L, "text", "Hiring gap"),
    ("minimal", 0L, "text", "Just one plain paragraph."),
    ("not_zip", -1L, "status", "not_docx"),
    ("plain_zip", -1L, "status", "not_docx"),
    ("report", 0L, "heading", "Quarterly Review"),
    ("report", 1L, "heading", "Findings"),
    ("report", 2L, "text", "Revenue grew modestly across the northern region."),
    ("report", 3L, "text", "Before<TAB>after tab<NL>new line"),
    ("report", 4L, "table", "Metric | Value<NL>Margin | 12%"),
    ("report", 5L, "text", "details here"),
    ("report", 100L, "meta:title", "Q3 Operations Report"),
    ("report", 101L, "meta:author", "Ops Team"),
    ("report", 102L, "meta:subject", "quarterly metrics"),
    ("report", 103L, "meta:keywords", "revenue, margin"),
    ("report", 104L, "meta:created", "2024-10-01T08:00:00Z"),
    ("report", 105L, "meta:modified", "2024-10-02T09:30:00Z"),
    ("report", 200L, "link", "https://data.example.com/q3"),
    ("workbook", 0L, "table", "Region | Sales<NL>North | 1250<NL>South | 990"))

  private def visible(s: String): String =
    s.replace("\t", "<TAB>").replace("\n", "<NL>")

  def fixtureDf(s: SparkSession): DataFrame = {
    import s.implicits._
    s.createDataset(corpus.map { case (n, b) => (n, b) })(
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.STRING, org.apache.spark.sql.Encoders.BINARY))
      .repartition(2)
      .mapPartitions(_.flatMap { case (name, bytes) =>
        val r = Docx.parseDetailed(bytes)
        if (r.status == "not_docx")
          Iterator((name, -1L, "status", "not_docx"))
        else {
          val blocks = r.blocks.iterator.zipWithIndex.map { case (b, i) =>
            (name, i.toLong, b.kind, visible(b.text))
          }
          val metaOrder = Seq("title", "author", "subject", "keywords",
            "created", "modified")
          val metas = metaOrder.iterator.zipWithIndex.collect {
            case (k, i) if r.meta.contains(k) =>
              (name, 100L + i, s"meta:$k", r.meta(k))
          }
          val links = r.links.iterator.zipWithIndex.map { case (u, i) =>
            (name, 200L + i, "link", u)
          }
          blocks ++ metas ++ links
        }
      })
      .toDF("test_case", "seq", "kind", "text")
      .orderBy("test_case", "seq")
  }

  def fixtureOracle: String = {
    val values = expectedRows.map { case (c, q, k, t) =>
      s"  ('$c', $q, '$k', '${t.replace("'", "''")}')"
    }
    "SELECT test_case, CAST(seq AS BIGINT) AS seq, kind, text " +
      s"FROM (VALUES\n${values.mkString(",\n")}\n) AS t(test_case, seq, kind, text) " +
      "ORDER BY test_case, seq"
  }
}
