package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Rtf

/**
 * Frozen RTF fixture corpus + the `rtf_fixture` driver query — the
 * DocxFixture pattern: every block, meta field, and error disposition of
 * [[graft.sources.Rtf]] as `(test_case, seq, kind, text)` rows against a
 * transcribed VALUES oracle. TAB inside block text becomes `<TAB>` on
 * both sides.
 */
object RtfFixture {

  def corpus: Seq[(String, Array[Byte])] = Seq(
    "plain" -> ("""{\rtf1\ansi{\fonttbl{\f0 Arial;}}""" +
      """First paragraph with \b emphasis\b0  kept.\par """ +
      """Second\tab cell and 25\'25 more.\par}""").getBytes("ISO-8859-1"),
    "meta" -> ("""{\rtf1{\info{\title Field Notes}{\author R. Surveyor}}""" +
      """Only the body survives.\par}""").getBytes("ISO-8859-1"),
    "not_rtf" -> "just some text".getBytes("UTF-8"),
    "empty" -> """{\rtf1{\fonttbl{\f0 X;}}}""".getBytes("ISO-8859-1"))

  /** Transcribed expected rows. */
  def expectedRows: Seq[(String, Long, String, String)] = Seq(
    ("empty", -1L, "status", "empty"),
    ("meta", 0L, "text", "Only the body survives."),
    ("meta", 100L, "meta:title", "Field Notes"),
    ("meta", 101L, "meta:author", "R. Surveyor"),
    ("not_rtf", -1L, "status", "not_rtf"),
    ("plain", 0L, "text", "First paragraph with emphasis kept."),
    ("plain", 1L, "text", "Second<TAB>cell and 25% more."))

  def fixtureDf(s: SparkSession): DataFrame = {
    import s.implicits._
    s.createDataset(corpus.map { case (n, b) => (n, b) })(
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.STRING, org.apache.spark.sql.Encoders.BINARY))
      .repartition(2)
      .mapPartitions(_.flatMap { case (name, bytes) =>
        val r = Rtf.parseDetailed(bytes)
        if (r.status != "ok")
          Iterator((name, -1L, "status", r.status))
        else {
          val blocks = r.blocks.iterator.zipWithIndex.map { case (b, i) =>
            (name, i.toLong, b.kind, b.text.replace("\t", "<TAB>"))
          }
          val metaOrder = Seq("title", "author", "subject")
          val metas = metaOrder.iterator.zipWithIndex.collect {
            case (k, i) if r.meta.contains(k) =>
              (name, 100L + i, s"meta:$k", r.meta(k))
          }
          blocks ++ metas
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
