package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.feed.{MarkdownParser, RssParser}

/**
 * Fixture-anchored driver queries for the FEED and MARKDOWN parser families
 * (K1–K10), extending the `FixtureQueries` pattern: parse the vendored feed
 * fixtures / the reference's inline markdown snippets as a distributed
 * Dataset transform, emit `(case, field, value)` rows, and let the driver
 * compare against `SELECT * FROM (VALUES ...)` oracles whose expected cells
 * are transcribed from the REFERENCE'S OWN assertions — independent ground
 * truth, not frozen Spark output:
 *
 *  - `/root/reference/test/parsers/rss.test.ts:30-52` (RSS2 channel/item/
 *    enclosure/dc:creator), `:57-71` (Atom title/next/id/ISO date/categories),
 *    `:74-87` (RSS 1.0 RDF), `:89-98` (https-only links), `:101-146`
 *    (protocol-relative resolution both ways), `:148-176` (custom fields),
 *    `:178-199` (media namespace via escaped selector).
 *  - `/root/reference/test/parsers/markdown.test.ts:8-24` (canParse),
 *    `:28-50` (title/description precedence), `:54-79` (sections),
 *    `:82-119` (links + context), `:121-148` (code blocks), `:150-177`
 *    (frontmatter coercion), `:182-228` (extractListLinks), `:231-251`
 *    (parseByHeadings).
 *
 * Everything is computed per-row inside `mapPartitions` — the same shape
 * these parsers run at scale (a pure function over a string column).
 */
object FeedFixtureQueries {

  private def fixture(name: String): String = {
    val in = getClass.getResourceAsStream(s"/scrapex-fixtures/$name")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  private val protoRelXml =
    """<rss version="2.0">
      |  <channel>
      |    <title>Test Feed</title>
      |    <link>//example.com/</link>
      |    <item>
      |      <title>Item with protocol-relative link</title>
      |      <link>//example.com/article</link>
      |    </item>
      |  </channel>
      |</rss>""".stripMargin

  private val itunesXml =
    """<rss version="2.0" xmlns:itunes="http://www.itunes.com/dtds/podcast-1.0.dtd">
      |  <channel>
      |    <title>Podcast</title>
      |    <item>
      |      <title>Episode 1</title>
      |      <itunes:duration>10:00</itunes:duration>
      |      <itunes:explicit>no</itunes:explicit>
      |    </item>
      |  </channel>
      |</rss>""".stripMargin

  /** (case name, xml, feed url or "", custom-field selectors). */
  private def feedSpecs: Seq[(String, String, String, Map[String, String])] = Seq(
    ("rss2_basic", fixture("rss2-basic.xml"), "https://example.com/feed.xml", Map.empty[String, String]),
    ("atom_basic", fixture("atom-basic.xml"), "https://example.com/atom", Map.empty[String, String]),
    ("rss1_basic", fixture("rss1-basic.xml"), "", Map.empty[String, String]),
    ("atom_unsafe", fixture("atom-unsafe-links.xml"), "https://example.com/atom", Map.empty[String, String]),
    ("proto_rel_https", protoRelXml, "https://example.com/feed.xml", Map.empty[String, String]),
    ("proto_rel_http", protoRelXml, "http://example.com/feed.xml", Map.empty[String, String]),
    ("custom_itunes", itunesXml, "",
      Map("duration" -> "itunes\\:duration", "explicit" -> "itunes\\:explicit")),
    ("rss2_media", fixture("rss2-media.xml"), "https://example.com/feed.xml",
      Map("creator" -> "dc\\:creator"))
  )

  /** One row per reference assertion: (case, field, value) — all strings. */
  def feedFixtureItems(s: SparkSession): DataFrame = {
    import s.implicits._
    s.createDataset(feedSpecs).repartition(2).mapPartitions(_.flatMap {
      case (name, xml, url, custom) =>
        val d = new RssParser(custom).parse(xml, Option(url).filter(_.nonEmpty)).data
        def item(i: Int) = d.items(i)
        val rows: Seq[(String, String)] = name match {
          case "rss2_basic" => Seq(
            "format" -> d.format,
            "feed_title" -> d.title,
            "feed_link" -> d.link,
            "copyright" -> d.copyright.getOrElse(""),
            "n_items" -> d.items.length.toString,
            "item0_title" -> item(0).title,
            "item0_link" -> item(0).link,
            "item0_description" -> item(0).description.getOrElse(""),
            "item0_content" -> item(0).content.getOrElse(""),
            "item0_author" -> item(0).author.getOrElse(""),
            "item0_categories" -> item(0).categories.mkString("|"),
            "item0_enclosure_url" -> item(0).enclosure.map(_.url).getOrElse(""),
            "item0_enclosure_length" -> item(0).enclosure.flatMap(_.length).map(_.toString).getOrElse(""),
            "item0_enclosure_type" -> item(0).enclosure.flatMap(_.enclosureType).getOrElse(""),
            "item1_author" -> item(1).author.getOrElse(""),
            "item1_id" -> item(1).id)
          case "atom_basic" => Seq(
            "format" -> d.format,
            "feed_title" -> d.title,
            "next" -> d.next.getOrElse(""),
            "item0_title" -> item(0).title,
            "item0_id" -> item(0).id,
            "item0_published_at" -> item(0).publishedAt.getOrElse(""),
            "item0_categories" -> item(0).categories.mkString("|"))
          case "rss1_basic" => Seq(
            "format" -> d.format,
            "feed_title" -> d.title,
            "item0_title" -> item(0).title,
            "item0_link" -> item(0).link,
            "item0_categories" -> item(0).categories.mkString("|"))
          case "atom_unsafe" => Seq(
            "feed_link" -> d.link,
            "item0_link" -> item(0).link,
            "item1_link" -> item(1).link)
          case "proto_rel_https" => Seq(
            "feed_link" -> d.link,
            "item0_link" -> item(0).link)
          case "proto_rel_http" => Seq(
            "feed_link" -> d.link,
            "item0_link" -> item(0).link)
          case "custom_itunes" => Seq(
            "item0_custom_duration" -> item(0).customFields.getOrElse("duration", ""),
            "item0_custom_explicit" -> item(0).customFields.getOrElse("explicit", ""))
          case "rss2_media" => Seq(
            "format" -> d.format,
            "feed_title" -> d.title,
            "n_items" -> d.items.length.toString,
            "item0_title" -> item(0).title,
            "item0_custom_creator" -> item(0).customFields.getOrElse("creator", ""))
          case _ => Nil
        }
        rows.map { case (f, v) => (name, f, v) }
    }).toDF("test_case", "field", "value").orderBy("test_case", "field")
  }

  val feedOracle: String = {
    val rows = Seq(
      ("atom_basic", "feed_title", "Scrapex Atom Test"),
      ("atom_basic", "format", "atom"),
      ("atom_basic", "item0_categories", "Atom|Testing"),
      ("atom_basic", "item0_id", "urn:uuid:1225c695-cfb8-4ebb-aaaa-80da344efa6a"),
      ("atom_basic", "item0_published_at", "2024-09-06T16:45:00.000Z"),
      ("atom_basic", "item0_title", "Atom Entry 1"),
      ("atom_basic", "next", "https://example.com/atom?page=2"),
      ("atom_unsafe", "feed_link", "https://example.com/atom"),
      ("atom_unsafe", "item0_link", ""),
      ("atom_unsafe", "item1_link", ""),
      ("custom_itunes", "item0_custom_duration", "10:00"),
      ("custom_itunes", "item0_custom_explicit", "no"),
      ("proto_rel_http", "feed_link", ""),
      ("proto_rel_http", "item0_link", ""),
      ("proto_rel_https", "feed_link", "https://example.com/"),
      ("proto_rel_https", "item0_link", "https://example.com/article"),
      ("rss1_basic", "feed_title", "Scrapex RSS 1.0 Test"),
      ("rss1_basic", "format", "rss1"),
      ("rss1_basic", "item0_categories", "RDF Category"),
      ("rss1_basic", "item0_link", "https://example.com/item1"),
      ("rss1_basic", "item0_title", "RSS 1.0 Item"),
      ("rss2_basic", "copyright", "Copyright 2024"),
      ("rss2_basic", "feed_link", "https://example.com/"),
      ("rss2_basic", "feed_title", "Scrapex RSS 2.0 Test"),
      ("rss2_basic", "format", "rss2"),
      ("rss2_basic", "item0_author", "John Doe"),
      ("rss2_basic", "item0_categories", "Tech|News"),
      ("rss2_basic", "item0_content", "This is the full content."),
      ("rss2_basic", "item0_description", "This is a short description."),
      ("rss2_basic", "item0_enclosure_length", "123456"),
      ("rss2_basic", "item0_enclosure_type", "audio/mpeg"),
      ("rss2_basic", "item0_enclosure_url", "https://example.com/podcast.mp3"),
      ("rss2_basic", "item0_link", "https://example.com/item1"),
      ("rss2_basic", "item0_title", "RSS Item 1"),
      ("rss2_basic", "item1_author", "Jane Smith"),
      ("rss2_basic", "item1_id", "abc-123"),
      ("rss2_basic", "n_items", "2"),
      ("rss2_media", "feed_title", "Media RSS Test Feed"),
      ("rss2_media", "format", "rss2"),
      ("rss2_media", "item0_custom_creator", "John Doe"),
      ("rss2_media", "item0_title", "Article with Media Thumbnail"),
      ("rss2_media", "n_items", "5")
    )
    FixtureSupport.valuesOracle(rows)
  }

  // ---- markdown (K1–K3) ----

  /** (case name, markdown input) — inputs are the reference's inline
    * snippets (markdown.test.ts). */
  private val mdSpecs: Seq[(String, String)] = Seq(
    ("canparse_h1", "# Heading"),
    ("canparse_h2", "## Subheading"),
    ("canparse_dash_link", "- [Link](https://example.com)"),
    ("canparse_star_link", "* [Link](https://example.com)"),
    ("canparse_fence", "```js\nconsole.log(\"hi\");\n```"),
    ("canparse_plain", "Just plain text without markdown"),
    ("title_h1", "# My Title\n\nSome content"),
    ("title_frontmatter", "---\ntitle: Frontmatter Title\n---\n\n# Different Title"),
    ("desc_frontmatter", "---\ntitle: Title\ndescription: My description\n---\n\nContent"),
    ("desc_paragraph", "This is the description.\n\n# Heading\n\nContent"),
    ("sections", "\n# Main Title\n\n## Section One\nContent for section one.\n\n## Section Two\nContent for section two.\n      "),
    ("links", "\n# Title\n\nCheck out [Link One](https://one.com) and [Link Two](https://two.com).\n      "),
    ("link_title", "[Link](https://example.com \"Link Title\")"),
    ("link_context", "\n## Section One\n[Link in One](https://one.com)\n\n## Section Two\n[Link in Two](https://two.com)\n      "),
    ("codeblock", "\n# Code Example\n\n```javascript\nconsole.log('Hello');\n```\n      "),
    ("codeblock_meta", "```ts title=\"example.ts\"\nconst x = 1;\n```"),
    ("codeblock_nolang", "```\nplain code\n```"),
    ("fm_string", "---\nkey: value\n---\n"),
    ("fm_bool", "---\nenabled: true\ndisabled: false\n---\n"),
    ("fm_number", "---\ncount: 42\nprice: 19.99\n---\n"),
    ("fm_quoted", "---\nsingle: 'quoted'\ndouble: \"quoted\"\n---\n"),
    ("list_links", "\n## Resources\n\n- [Resource One](https://one.com) - Description\n- [Resource Two](https://two.com) - Another description\n    "),
    ("list_nested", "\n## Category\n\n- [Parent](https://parent.com)\n  - [Child One](https://child1.com)\n  - [Child Two](https://child2.com)\n    "),
    ("list_context", "\n## First Section\n- [Link A](https://a.com)\n\n## Second Section\n- [Link B](https://b.com)\n    "),
    ("by_headings_min2", "\n# H1 Title\n\n## H2 Section\n\n### H3 Subsection\n\n#### H4 Deep\n    "),
    ("by_headings_default", "# Title\n\n## Section")
  )

  def markdownFixture(s: SparkSession): DataFrame = {
    import s.implicits._
    s.createDataset(mdSpecs).repartition(2).mapPartitions(_.flatMap { case (name, md) =>
      val rows: Seq[(String, String)] = name match {
        case n if n.startsWith("canparse_") =>
          Seq("can_parse" -> MarkdownParser.canParse(md).toString)
        case "title_h1" | "title_frontmatter" =>
          Seq("title" -> MarkdownParser.parse(md).title.getOrElse(""))
        case "desc_frontmatter" | "desc_paragraph" =>
          Seq("description" -> MarkdownParser.parse(md).description.getOrElse(""))
        case "sections" =>
          val r = MarkdownParser.parse(md)
          Seq(
            "n_sections" -> r.sections.length.toString,
            "s0" -> s"${r.sections(0).level}:${r.sections(0).title}",
            "s1" -> s"${r.sections(1).level}:${r.sections(1).title}",
            "s2" -> s"${r.sections(2).level}:${r.sections(2).title}")
        case "links" =>
          val r = MarkdownParser.parse(md)
          Seq(
            "n_links" -> r.links.length.toString,
            "link0_url" -> r.links(0).url,
            "link0_text" -> r.links(0).text)
        case "link_title" =>
          Seq("link0_title" -> MarkdownParser.parse(md).links(0).title.getOrElse(""))
        case "link_context" =>
          val r = MarkdownParser.parse(md)
          Seq(
            "ctx_one" -> r.links.find(_.url.contains("one.com")).flatMap(_.context).getOrElse(""),
            "ctx_two" -> r.links.find(_.url.contains("two.com")).flatMap(_.context).getOrElse(""))
        case "codeblock" =>
          val r = MarkdownParser.parse(md)
          Seq(
            "n_blocks" -> r.codeBlocks.length.toString,
            "language" -> r.codeBlocks(0).language.getOrElse(""),
            "code" -> r.codeBlocks(0).code)
        case "codeblock_meta" =>
          Seq("meta" -> MarkdownParser.parse(md).codeBlocks(0).meta.getOrElse(""))
        case "codeblock_nolang" =>
          Seq("language" -> MarkdownParser.parse(md).codeBlocks(0).language.getOrElse(""))
        case "fm_string" =>
          Seq("key" -> MarkdownParser.parse(md).frontmatter.getOrElse("key", ""))
        case "fm_bool" =>
          val r = MarkdownParser.parse(md)
          Seq("enabled" -> r.frontmatter.getOrElse("enabled", ""),
            "disabled" -> r.frontmatter.getOrElse("disabled", ""))
        case "fm_number" =>
          val r = MarkdownParser.parse(md)
          Seq("count" -> r.frontmatter.getOrElse("count", ""),
            "price" -> r.frontmatter.getOrElse("price", ""))
        case "fm_quoted" =>
          val r = MarkdownParser.parse(md)
          Seq("single" -> r.frontmatter.getOrElse("single", ""),
            "double" -> r.frontmatter.getOrElse("double", ""))
        case "list_links" =>
          val links = MarkdownParser.extractListLinks(md)
          Seq(
            "n_links" -> links.length.toString,
            "link0_url" -> links(0).url,
            "link0_text" -> links(0).text,
            "link0_context" -> links(0).context.getOrElse(""))
        case "list_nested" =>
          val urls = MarkdownParser.extractListLinks(md).map(_.url).toSet
          Seq(
            "has_parent" -> urls.contains("https://parent.com").toString,
            "has_child1" -> urls.contains("https://child1.com").toString,
            "has_child2" -> urls.contains("https://child2.com").toString)
        case "list_context" =>
          val links = MarkdownParser.extractListLinks(md)
          Seq(
            "ctx_a" -> links.find(_.url.contains("a.com")).flatMap(_.context).getOrElse(""),
            "ctx_b" -> links.find(_.url.contains("b.com")).flatMap(_.context).getOrElse(""))
        case "by_headings_min2" =>
          val secs = MarkdownParser.parseByHeadings(md, 2)
          Seq("all_ge_2" -> secs.forall(_.level >= 2).toString)
        case "by_headings_default" =>
          val secs = MarkdownParser.parseByHeadings(md)
          Seq("n_sections" -> secs.length.toString, "s0_title" -> secs(0).title)
        case _ => Nil
      }
      rows.map { case (f, v) => (name, f, v) }
    }).toDF("test_case", "field", "value").orderBy("test_case", "field")
  }

  val markdownOracle: String = {
    val rows = Seq(
      ("by_headings_default", "n_sections", "1"),
      ("by_headings_default", "s0_title", "Section"),
      ("by_headings_min2", "all_ge_2", "true"),
      ("canparse_dash_link", "can_parse", "true"),
      ("canparse_fence", "can_parse", "true"),
      ("canparse_h1", "can_parse", "true"),
      ("canparse_h2", "can_parse", "true"),
      ("canparse_plain", "can_parse", "false"),
      ("canparse_star_link", "can_parse", "true"),
      ("codeblock", "code", "console.log('Hello');"),
      ("codeblock", "language", "javascript"),
      ("codeblock", "n_blocks", "1"),
      ("codeblock_meta", "meta", "title=\"example.ts\""),
      ("codeblock_nolang", "language", ""),
      ("desc_frontmatter", "description", "My description"),
      ("desc_paragraph", "description", "This is the description."),
      ("fm_bool", "disabled", "false"),
      ("fm_bool", "enabled", "true"),
      ("fm_number", "count", "42"),
      ("fm_number", "price", "19.99"),
      ("fm_quoted", "double", "quoted"),
      ("fm_quoted", "single", "quoted"),
      ("fm_string", "key", "value"),
      ("link_context", "ctx_one", "Section One"),
      ("link_context", "ctx_two", "Section Two"),
      ("link_title", "link0_title", "Link Title"),
      ("links", "link0_text", "Link One"),
      ("links", "link0_url", "https://one.com"),
      ("links", "n_links", "2"),
      ("list_context", "ctx_a", "First Section"),
      ("list_context", "ctx_b", "Second Section"),
      ("list_links", "link0_context", "Resources"),
      ("list_links", "link0_text", "Resource One"),
      ("list_links", "link0_url", "https://one.com"),
      ("list_links", "n_links", "2"),
      ("list_nested", "has_child1", "true"),
      ("list_nested", "has_child2", "true"),
      ("list_nested", "has_parent", "true"),
      ("sections", "n_sections", "3"),
      ("sections", "s0", "1:Main Title"),
      ("sections", "s1", "2:Section One"),
      ("sections", "s2", "2:Section Two"),
      ("title_frontmatter", "title", "Frontmatter Title"),
      ("title_h1", "title", "My Title")
    )
    val values = rows.map { case (c, f, v) =>
      s"  ('$c', '$f', '${v.replace("'", "''")}')"
    }
    s"SELECT * FROM (VALUES\n${values.mkString(",\n")}\n) AS t(test_case, field, value) ORDER BY test_case, field"
  }

  // ---- feed utilities (K11–K13, rss.test.ts:239-296) ----

  private val discoverHtml =
    """<html>
      |  <head>
      |    <link rel="alternate" type="application/rss+xml" href="/feed.xml" />
      |    <link rel="alternate" type="application/atom+xml" href="https://example.com/atom" />
      |  </head>
      |</html>""".stripMargin

  def feedUtilsFixture(s: SparkSession): DataFrame = {
    import s.implicits._
    import graft.feed.{FeedItem, FeedOps}
    val cases = Seq("discover", "filter_by_date", "to_markdown", "markdown_safe")
    FixtureSupport.fixtureDf(s, cases) { name =>
      def bare(title: String, publishedAt: Option[String]) = FeedItem(
        id = "", title = title, link = "", description = None, content = None,
        author = None, publishedAt = publishedAt, rawPublishedAt = publishedAt,
        updatedAt = None, categories = Nil, enclosure = None, customFields = Map.empty)
      val rows: Seq[(String, String)] = name match {
        case "discover" =>
          Seq("feeds" -> FeedOps.discoverFeeds(discoverHtml, "https://example.com").mkString("|"))
        case "filter_by_date" =>
          val items = Seq(
            bare("New", Some("2024-01-01T00:00:00Z")),
            bare("Old", Some("2023-01-01T00:00:00Z")),
            bare("Undated", None))
          val after = Some(java.time.Instant.parse("2023-12-31T00:00:00Z"))
          val strict = FeedOps.filterByDate(items, after, None, includeUndated = false)
          val loose = FeedOps.filterByDate(items, after, None, includeUndated = true)
          Seq(
            "n_strict" -> strict.length.toString,
            "first_strict" -> strict.head.title,
            "n_with_undated" -> loose.length.toString)
        case "to_markdown" =>
          val feed = new RssParser().parse(fixture("rss2-basic.xml")).data
          val md = FeedOps.feedToMarkdown(feed, maxItems = Some(1))
          Seq(
            "has_feed_title" -> md.contains("# Scrapex RSS 2.0 Test").toString,
            "has_item1_heading" -> md.contains("## RSS Item 1").toString,
            "has_date" -> md.contains("*2024-09-06*").toString,
            "has_description" -> md.contains("This is a short description.").toString,
            "excludes_item2" -> (!md.contains("RSS Item 2")).toString)
        case "markdown_safe" =>
          val feed = new RssParser()
            .parse(fixture("atom-unsafe-links.xml"), Some("https://example.com/atom")).data
          val md = FeedOps.feedToMarkdown(feed)
          Seq(
            "no_javascript" -> (!md.contains("javascript:")).toString,
            "no_data" -> (!md.contains("data:")).toString,
            "no_file" -> (!md.contains("file:")).toString)
        case _ => Nil
      }
      rows
    }
  }

  val feedUtilsOracle: String = {
    val rows = Seq(
      ("discover", "feeds", "https://example.com/feed.xml|https://example.com/atom"),
      ("filter_by_date", "first_strict", "New"),
      ("filter_by_date", "n_strict", "1"),
      ("filter_by_date", "n_with_undated", "2"),
      ("markdown_safe", "no_data", "true"),
      ("markdown_safe", "no_file", "true"),
      ("markdown_safe", "no_javascript", "true"),
      ("to_markdown", "excludes_item2", "true"),
      ("to_markdown", "has_date", "true"),
      ("to_markdown", "has_description", "true"),
      ("to_markdown", "has_feed_title", "true"),
      ("to_markdown", "has_item1_heading", "true")
    )
    FixtureSupport.valuesOracle(rows)
  }

  // ---- GitHub utils (K14, github.test.ts) ----

  private val ghRepo = "https://github.com/developer-rakeshpaul/scrapex"

  def githubFixture(s: SparkSession): DataFrame = {
    import s.implicits._
    import graft.feed.{GitHubOps, MarkdownLink}
    val cases = Seq(
      "is_repo_basic", "is_repo_trailing_slash", "is_repo_http", "is_repo_www",
      "not_repo_root", "not_repo_owner_only", "not_repo_issues", "not_repo_blob",
      "not_repo_gitlab", "parse_basic", "parse_trailing_path", "parse_git_suffix",
      "parse_invalid_example", "parse_invalid_root", "parse_invalid_owner",
      "raw_default", "raw_branch", "raw_file", "raw_not_github",
      "group_cat_one_len", "group_cat_two_len", "group_uncat_len", "group_empty_size")
    s.createDataset(cases).repartition(2).mapPartitions(_.map { name =>
      def parsed(u: String) = GitHubOps.parseGitHubUrl(u).map { case (o, r) => s"$o/$r" }.getOrElse("")
      lazy val grouped = MarkdownParser.groupByCategory(Seq(
        MarkdownLink("https://a.com", "A", None, Some("Category One")),
        MarkdownLink("https://b.com", "B", None, Some("Category One")),
        MarkdownLink("https://c.com", "C", None, Some("Category Two"))))
      lazy val uncat = MarkdownParser.groupByCategory(Seq(
        MarkdownLink("https://a.com", "A", None, None),
        MarkdownLink("https://b.com", "B", None, None)))
      val value = name match {
        case "is_repo_basic"          => GitHubOps.isGitHubRepo(ghRepo).toString
        case "is_repo_trailing_slash" => GitHubOps.isGitHubRepo(ghRepo + "/").toString
        case "is_repo_http"           => GitHubOps.isGitHubRepo("http://github.com/developer-rakeshpaul/scrapex").toString
        case "is_repo_www"            => GitHubOps.isGitHubRepo("https://www.github.com/developer-rakeshpaul/scrapex").toString
        case "not_repo_root"          => GitHubOps.isGitHubRepo("https://github.com").toString
        case "not_repo_owner_only"    => GitHubOps.isGitHubRepo("https://github.com/developer-rakeshpaul").toString
        case "not_repo_issues"        => GitHubOps.isGitHubRepo(ghRepo + "/issues").toString
        case "not_repo_blob"          => GitHubOps.isGitHubRepo(ghRepo + "/blob/main/README.md").toString
        case "not_repo_gitlab"        => GitHubOps.isGitHubRepo("https://gitlab.com/developer-rakeshpaul/scrapex").toString
        case "parse_basic"            => parsed(ghRepo)
        case "parse_trailing_path"    => parsed(ghRepo + "/issues/123")
        case "parse_git_suffix"       => parsed(ghRepo + ".git")
        case "parse_invalid_example"  => parsed("https://example.com")
        case "parse_invalid_root"     => parsed("https://github.com")
        case "parse_invalid_owner"    => parsed("https://github.com/developer-rakeshpaul")
        case "raw_default"            => GitHubOps.toRawUrl(ghRepo)
        case "raw_branch"             => GitHubOps.toRawUrl(ghRepo, "master")
        case "raw_file"               => GitHubOps.toRawUrl(ghRepo, "main", "CONTRIBUTING.md")
        case "raw_not_github"         => GitHubOps.toRawUrl("https://example.com/not-github")
        case "group_cat_one_len"      => grouped.getOrElse("Category One", Nil).length.toString
        case "group_cat_two_len"      => grouped.getOrElse("Category Two", Nil).length.toString
        case "group_uncat_len"        => uncat.getOrElse("Uncategorized", Nil).length.toString
        case "group_empty_size"       => MarkdownParser.groupByCategory(Nil).size.toString
        case _                        => ""
      }
      (name, value)
    }).toDF("test_case", "value").orderBy("test_case")
  }

  val githubOracle: String = {
    val rows = Seq(
      ("group_cat_one_len", "2"),
      ("group_cat_two_len", "1"),
      ("group_empty_size", "0"),
      ("group_uncat_len", "2"),
      ("is_repo_basic", "true"),
      ("is_repo_http", "true"),
      ("is_repo_trailing_slash", "true"),
      ("is_repo_www", "true"),
      ("not_repo_blob", "false"),
      ("not_repo_gitlab", "false"),
      ("not_repo_issues", "false"),
      ("not_repo_owner_only", "false"),
      ("not_repo_root", "false"),
      ("parse_basic", "developer-rakeshpaul/scrapex"),
      ("parse_git_suffix", "developer-rakeshpaul/scrapex"),
      ("parse_invalid_example", ""),
      ("parse_invalid_owner", ""),
      ("parse_invalid_root", ""),
      ("parse_trailing_path", "developer-rakeshpaul/scrapex"),
      ("raw_branch", "https://raw.githubusercontent.com/developer-rakeshpaul/scrapex/master/README.md"),
      ("raw_default", "https://raw.githubusercontent.com/developer-rakeshpaul/scrapex/main/README.md"),
      ("raw_file", "https://raw.githubusercontent.com/developer-rakeshpaul/scrapex/main/CONTRIBUTING.md"),
      ("raw_not_github", "https://example.com/not-github")
    )
    FixtureSupport.valuesOracle2(rows)
  }

  // ---- S4: paginateFeed (RFC 5005 rel="next" walking) ----

  /** One Atom page of a pre-crawled chain; `next = None` ends the chain. */
  private def atomChainPage(title: String, entryId: Int, next: Option[String]): String =
    s"""<?xml version="1.0" encoding="utf-8"?>
       |<feed xmlns="http://www.w3.org/2005/Atom">
       |  <title>$title</title>
       |  <id>urn:feed:$entryId</id>
       |  ${next.map(n => s"""<link rel="next" href="$n"/>""").getOrElse("")}
       |  <entry><title>Entry $entryId</title><link href="https://example.com/e/$entryId"/><id>urn:e$entryId</id></entry>
       |</feed>""".stripMargin

  /** S4 driver gate (VERDICT r3 #8): replay a 3-page RFC-5005 `rel="next"`
    * chain (feed.ts:171-191 semantics — the same shape the reference's
    * paginateFeed test walks with a mock fetcher, rss.test.ts:320-350)
    * through `FeedOps.paginateFeed` against a pre-crawled url→xml lookup.
    * Cells are fixed by construction: page count, walk order (titles and
    * per-page entry links), maxPages truncation, and cycle-safety (a 2-page
    * `rel="next"` cycle terminates at exactly maxPages). */
  def paginateFixture(s: SparkSession): DataFrame = {
    val chain = Map(
      "https://example.com/feed?page=1" ->
        atomChainPage("Chain Page 1", 1, Some("https://example.com/feed?page=2")),
      "https://example.com/feed?page=2" ->
        atomChainPage("Chain Page 2", 2, Some("https://example.com/feed?page=3")),
      "https://example.com/feed?page=3" -> atomChainPage("Chain Page 3", 3, None))
    val cycle = Map(
      "https://example.com/cycle/a" ->
        atomChainPage("Cycle A", 10, Some("https://example.com/cycle/b")),
      "https://example.com/cycle/b" ->
        atomChainPage("Cycle B", 11, Some("https://example.com/cycle/a")))
    FixtureSupport.fixtureDf(s, Seq("chain_3_pages", "chain_max_pages_2", "cycle_bounded")) {
      case "chain_3_pages" =>
        val pages = graft.feed.FeedOps.paginateFeed("https://example.com/feed?page=1", chain.get)
        Seq(
          "n_pages" -> pages.length.toString,
          "titles" -> pages.map(_.title).mkString("|"),
          "entry_links" -> pages.map(_.items.head.link).mkString("|"),
          "last_has_next" -> pages.last.next.isDefined.toString)
      case "chain_max_pages_2" =>
        val pages = graft.feed.FeedOps.paginateFeed(
          "https://example.com/feed?page=1", chain.get, maxPages = 2)
        Seq(
          "n_pages" -> pages.length.toString,
          "titles" -> pages.map(_.title).mkString("|"))
      case "cycle_bounded" =>
        val pages = graft.feed.FeedOps.paginateFeed(
          "https://example.com/cycle/a", cycle.get, maxPages = 5)
        Seq(
          "n_pages" -> pages.length.toString,
          "titles" -> pages.map(_.title).mkString("|"))
    }
  }

  val paginateOracle: String = FixtureSupport.valuesOracle(Seq(
    ("chain_3_pages", "entry_links",
      "https://example.com/e/1|https://example.com/e/2|https://example.com/e/3"),
    ("chain_3_pages", "last_has_next", "false"),
    ("chain_3_pages", "n_pages", "3"),
    ("chain_3_pages", "titles", "Chain Page 1|Chain Page 2|Chain Page 3"),
    ("chain_max_pages_2", "n_pages", "2"),
    ("chain_max_pages_2", "titles", "Chain Page 1|Chain Page 2"),
    ("cycle_bounded", "n_pages", "5"),
    ("cycle_bounded", "titles", "Cycle A|Cycle B|Cycle A|Cycle B|Cycle A")))
}
