package graft.feed

/** One-off generator for `feed_goldens.tsv` (run via `sbt Test/runMain
  * graft.feed.FeedGoldenGen`): freezes the parsed + normalized form of every
  * item across the 11 vendored feed fixtures. Regenerate CONSCIOUSLY when
  * feed semantics change on purpose. */
object FeedGoldenGen {
  val Fixtures = Seq(
    "atom-basic.xml", "atom-unsafe-links.xml", "atom.xml", "podcast-itunes.xml",
    "rss1-basic.xml", "rss1-rdf.xml", "rss2-basic.xml", "rss2-dc.xml",
    "rss2-dirty.xml", "rss2-malformed.xml", "rss2-media.xml")

  def fixture(name: String): String = {
    val in = getClass.getResourceAsStream(s"/scrapex-fixtures/$name")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  /** One canonical TSV line per feed item (and one `!feed` header line per
    * fixture): every serialized field is part of the frozen contract. */
  def lines(name: String): Seq[String] = {
    val parser = new RssParser()
    val xml = fixture(name)
    if (!parser.canParse(xml)) return Seq(s"$name\t!feed\tUNPARSEABLE")
    val result =
      try parser.parse(xml, Some("https://feeds.example.com/base"))
      catch { case e: Exception => return Seq(s"$name\t!feed\tERROR:${e.getClass.getSimpleName}") }
    val f = result.data
    val head = s"$name\t!feed\t${f.format}\t${f.title}\t${f.link}\t${f.items.length}"
    val items = f.items.zipWithIndex.map { case (it, i) =>
      val norm = FeedOps.normalizeFeedItem(it)
      Seq(
        name, i.toString, it.id, it.title, it.link,
        it.publishedAt.getOrElse(""), it.author.getOrElse(""),
        it.categories.mkString(","),
        it.enclosure.map(_.url).getOrElse(""),
        graft.ops.TextOps.sha256Hex(norm.text).take(16),
        norm.meta.blocksAccepted.toString
      ).mkString("\t")
    }
    head +: items
  }

  def allLines: Seq[String] = Fixtures.flatMap(lines)

  def main(args: Array[String]): Unit = allLines.foreach(println)
}
