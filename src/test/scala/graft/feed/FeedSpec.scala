package graft.feed

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

/** Ported from `test/parsers/rss.test.ts` — same fixtures, same expected values. */
class FeedSpec extends AnyFunSuite {

  private def fixture(name: String): String = {
    val in = getClass.getResourceAsStream(s"/scrapex-fixtures/$name")
    require(in != null, s"missing $name")
    val s = Source.fromInputStream(in, "UTF-8").mkString
    in.close(); s
  }

  test("parses RSS 2.0 feeds") {
    val parser = new RssParser()
    val content = fixture("rss2-basic.xml")
    assert(parser.canParse(content))
    val data = parser.parse(content, Some("https://example.com/feed.xml")).data

    assert(data.format == "rss2")
    assert(data.title == "Scrapex RSS 2.0 Test")
    assert(data.link == "https://example.com/")
    assert(data.copyright.contains("Copyright 2024"))
    assert(data.items.length == 2)

    val item1 = data.items(0)
    assert(item1.title == "RSS Item 1")
    assert(item1.link == "https://example.com/item1")
    assert(item1.description.contains("This is a short description."))
    assert(item1.content.contains("This is the full content."))
    assert(item1.author.contains("John Doe"))
    assert(item1.categories == Seq("Tech", "News"))
    assert(item1.enclosure.contains(FeedEnclosure("https://example.com/podcast.mp3", Some("audio/mpeg"), Some(123456))))
    assert(item1.publishedAt.contains("2024-09-06T16:45:00.000Z"))

    val item2 = data.items(1)
    assert(item2.author.contains("Jane Smith")) // dc:creator fallback
    assert(item2.id == "abc-123")
  }

  test("parses Atom feeds") {
    val parser = new RssParser()
    val content = fixture("atom-basic.xml")
    assert(parser.canParse(content))
    val data = parser.parse(content, Some("https://example.com/atom")).data

    assert(data.format == "atom")
    assert(data.title == "Scrapex Atom Test")
    assert(data.next.contains("https://example.com/atom?page=2"))

    val item = data.items(0)
    assert(item.title == "Atom Entry 1")
    assert(item.id == "urn:uuid:1225c695-cfb8-4ebb-aaaa-80da344efa6a")
    assert(item.publishedAt.contains("2024-09-06T16:45:00.000Z"))
    assert(item.categories == Seq("Atom", "Testing"))
  }

  test("parses RSS 1.0 (RDF) feeds") {
    val parser = new RssParser()
    val content = fixture("rss1-basic.xml")
    assert(parser.canParse(content))
    val data = parser.parse(content).data
    assert(data.format == "rss1")
    assert(data.title == "Scrapex RSS 1.0 Test")
    val item = data.items(0)
    assert(item.title == "RSS 1.0 Item")
    assert(item.link == "https://example.com/item1")
    assert(item.categories == Seq("RDF Category"))
  }

  test("drops non-https links") {
    val parser = new RssParser()
    val data = parser.parse(fixture("atom-unsafe-links.xml"), Some("https://example.com/atom")).data
    assert(data.link == "https://example.com/atom")
    assert(data.items(0).link == "")
    assert(data.items(1).link == "")
  }

  test("protocol-relative URLs: https base resolves, http base drops") {
    val xml =
      """<rss version="2.0"><channel><title>Test Feed</title><link>//example.com/</link>
        |<item><title>Item</title><link>//example.com/article</link></item></channel></rss>""".stripMargin
    val parser = new RssParser()
    val https = parser.parse(xml, Some("https://example.com/feed.xml")).data
    assert(https.link == "https://example.com/")
    assert(https.items(0).link == "https://example.com/article")
    val http = parser.parse(xml, Some("http://example.com/feed.xml")).data
    assert(http.link == "")
    assert(http.items(0).link == "")
  }

  test("extracts custom fields (itunes)") {
    val xml =
      """<rss version="2.0" xmlns:itunes="http://www.itunes.com/dtds/podcast-1.0.dtd">
        |<channel><title>Podcast</title><item><title>Episode 1</title>
        |<itunes:duration>10:00</itunes:duration><itunes:explicit>no</itunes:explicit>
        |</item></channel></rss>""".stripMargin
    val parser = new RssParser(Map("duration" -> "itunes\\:duration", "explicit" -> "itunes\\:explicit"))
    val item = parser.parse(xml).data.items(0)
    assert(item.customFields == Map("duration" -> "10:00", "explicit" -> "no"))
  }

  test("media namespace custom fields with @attr syntax") {
    val parser = new RssParser(Map(
      "imageUrl" -> "media\\:thumbnail@url",
      "mediaContent" -> "media\\:content@url",
      "creator" -> "dc\\:creator"))
    val data = parser.parse(fixture("rss2-media.xml"), Some("https://example.com/feed.xml")).data
    assert(data.title == "Media RSS Test Feed")
    assert(data.items.length == 5)
    val item1 = data.items(0)
    assert(item1.title == "Article with Media Thumbnail")
    assert(item1.customFields.get("imageUrl").contains("https://example.com/images/thumbnail-1.jpg"))
    assert(item1.customFields.get("creator").contains("John Doe"))
    val item2 = data.items(1)
    assert(item2.customFields.get("mediaContent").contains("https://example.com/images/full-image-2.jpg"))
    val item3 = data.items(2)
    assert(item3.customFields.get("imageUrl").contains("https://example.com/images/thumb-3.jpg"))
    assert(item3.customFields.get("mediaContent").contains("https://example.com/images/hero-3.jpg"))
    val item5 = data.items(4)
    assert(!item5.customFields.contains("imageUrl"))
    assert(!item5.customFields.contains("mediaContent"))
  }

  test("malformed feed does not throw") {
    val parser = new RssParser()
    val data = parser.parse(fixture("rss2-malformed.xml"), Some("https://example.com/feed.xml")).data
    assert(data.format == "rss2")
  }

  test("discovers feeds in HTML") {
    val html =
      """<html><head>
        |<link rel="alternate" type="application/rss+xml" href="/feed.xml" />
        |<link rel="alternate" type="application/atom+xml" href="https://example.com/atom" />
        |</head></html>""".stripMargin
    val feeds = FeedOps.discoverFeeds(html, "https://example.com")
    assert(feeds == Vector("https://example.com/feed.xml", "https://example.com/atom"))
  }

  test("filters items by date; undated included") {
    def item(t: String, p: Option[String]) =
      FeedItem(t, t, "", None, None, None, p, None, None, Nil, None, Map.empty)
    val items = Seq(
      item("New", Some("2024-01-01T00:00:00Z")),
      item("Old", Some("2023-01-01T00:00:00Z")),
      item("Undated", None))
    val after = JsDate.parseInstant("2023-12-31")
    val filtered = FeedOps.filterByDate(items, after, None)
    assert(filtered.map(_.id) == Seq("New", "Undated"))
  }

  test("feedToMarkdown deterministic templating") {
    val feed = ParsedFeed("rss2", "My Feed", Some("Feed desc"), "https://example.com/", None, None, None, None,
      Seq(FeedItem("1", "Item One", "https://example.com/1", Some("Desc one"), None, None,
        Some("2024-01-02T00:00:00.000Z"), None, None, Nil, None, Map.empty)), Map.empty)
    val md = FeedOps.feedToMarkdown(feed)
    assert(md.startsWith("# My Feed\n"))
    assert(md.contains("## Item One"))
    assert(md.contains("*2024-01-02*"))
    assert(md.contains("[Read more](https://example.com/1)"))
    val txt = FeedOps.feedToText(feed)
    assert(txt == "Item One\n\nDesc one")
  }

  test("normalizeFeedItem: block pipeline over item html with fallback") {
    val item = FeedItem("1", "T", "https://example.com/1",
      Some("plain description text that is long enough to pass."),
      Some("<p>First paragraph of content that is meaningful and long.</p><p>Second one also has enough substance here.</p>"),
      None, None, None, None, Nil, None, Map.empty)
    val r = FeedOps.normalizeFeedItem(item)
    assert(r.text.contains("First paragraph of content"))
    assert(r.meta.blocksTotal == 2)
  }
}

/** Additional fixture coverage: dc fallbacks, dirty CDATA, podcast custom fields. */
class FeedFixturesSpec extends org.scalatest.funsuite.AnyFunSuite {
  private def fixture(name: String): String = {
    val in = getClass.getResourceAsStream(s"/scrapex-fixtures/$name")
    require(in != null, s"missing $name")
    val s = scala.io.Source.fromInputStream(in, "UTF-8").mkString
    in.close(); s
  }

  test("rss2-dc: dublin-core creator and GMT pubDate") {
    val data = new RssParser().parse(fixture("rss2-dc.xml"), Some("https://example.com/feed")).data
    assert(data.title == "My Blog")
    val item = data.items(0)
    assert(item.author.contains("Jane Roe"))
    assert(item.publishedAt.contains("2024-09-06T16:45:00.000Z"))
    assert(item.categories == Seq("Tech", "News"))
    assert(data.items(1).publishedAt.contains("2024-09-05T10:00:00.000Z"))
  }

  test("rss2-dirty: CDATA + entities, relative links resolved against base") {
    val data = new RssParser().parse(fixture("rss2-dirty.xml"), Some("https://example.com/feed.xml")).data
    assert(data.title == "Dirty Feed & Stuff")
    assert(data.description.contains("Contains <b>HTML</b> and stuff"))
    val item = data.items(0)
    assert(item.title == "CDATA <em>Title</em>")
    assert(item.link == "https://example.com/relative/article/1")
    assert(item.content.contains("Full content with bold text."))
    assert(item.description.exists(_.contains("""<a href="/internal">link</a>""")))
  }

  test("podcast-itunes: namespaced custom fields") {
    val parser = new RssParser(Map("duration" -> "itunes\\:duration"))
    val data = parser.parse(fixture("podcast-itunes.xml"), Some("https://example.com/pod")).data
    assert(data.items.nonEmpty)
    assert(data.items.exists(_.customFields.contains("duration")))
  }

  test("atom unsafe links: javascript/data/http all dropped") {
    val data = new RssParser().parse(fixture("atom-unsafe-links.xml"), Some("https://example.com/atom")).data
    data.items.foreach(i => assert(i.link == "" || i.link.startsWith("https://")))
  }

  test("malformed items survive with empty fields; guid fallback link (feed-utilities.test.ts:126-137)") {
    val data = new RssParser().parse(fixture("rss2-malformed.xml"), Some("https://example.com/feed.xml")).data
    assert(data.title == "Broken Feed")
    assert(data.items.length == 2)
    assert(data.items(0).title == "")
    assert(data.items(0).link == "")
    assert(data.items(0).publishedAt.isEmpty)
    assert(data.items(1).link == "https://example.com/guid-only")
  }

  test("podcast enclosure url extracted (feed-utilities.test.ts:245-252)") {
    val data = new RssParser().parse(fixture("podcast-itunes.xml"), Some("https://example.com/podcast.xml")).data
    assert(data.items.head.title == "Episode 1")
    assert(data.items.head.enclosure.exists(_.url == "https://example.com/ep1.mp3"))
  }

  test("feedToText over the rss2-dc fixture (feed-utilities.test.ts:183-190)") {
    val data = new RssParser().parse(fixture("rss2-dc.xml"), Some("https://example.com/feed.xml")).data
    val text = FeedOps.feedToText(data, maxItems = Some(5))
    assert(text.contains("Article Title"))
    assert(text.contains("Article description text"))
  }
}
