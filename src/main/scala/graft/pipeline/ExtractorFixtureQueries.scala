package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.dom.HtmlParser
import graft.extract.{ExtractionContext, LinksExtractor, MetaExtractor}

/**
 * Fixture-anchored driver queries for the extractor unit families: M1
 * metadata precedence chains and M4 link extraction/filtering rules, run as
 * distributed Dataset transforms over the REFERENCE'S OWN inline test
 * documents, compared by the driver against VALUES oracles transcribed from
 * those tests' assertions:
 *
 *  - `/root/reference/test/extractors/meta.test.ts:25-247` — og/twitter/tag
 *    title precedence, og/meta description, og/twitter image, author tiers,
 *    canonical link→og:url→finalUrl, published/modified/time dates,
 *    lang attr→og:locale, keyword splitting, site name.
 *  - `/root/reference/test/extractors/links.test.ts:24-335` — external
 *    marking, relative resolution, text + title fallback, anchor/js/mailto/
 *    tel skips, short-text skip, dedupe, nav/header/footer/nav-class skips,
 *    article/main container preference, 200-char text cap, 100-link cap.
 */
object ExtractorFixtureQueries {

  private def ctx(html: String, url: String = "https://example.com"): ExtractionContext =
    ExtractionContext(url, url, HtmlParser.parse(html))

  private def art(inner: String): String = s"<html><body><article>$inner</article></body></html>"

  def metaFixture(s: SparkSession): DataFrame = {
    import s.implicits._
    val cases = Seq(
      "name_priority", "title_og", "title_twitter", "title_tag", "desc_og", "desc_meta",
      "image_og", "image_twitter", "author_meta", "author_article", "canonical_link",
      "canonical_og", "canonical_final", "published_meta", "published_time_el",
      "modified_meta", "lang_attr", "lang_og_locale", "keywords_split", "keywords_empty",
      "site_name")
    FixtureSupport.fixtureDf(s, cases) { name =>
      def meta(html: String, url: String = "https://example.com") =
        MetaExtractor.extract(ctx(html, url))
      val rows: Seq[(String, String)] = name match {
        case "name_priority" =>
          Seq("name" -> MetaExtractor.name, "priority" -> MetaExtractor.priority.toString)
        case "title_og" => Seq("title" -> meta(
          """<html><head><title>Page Title</title><meta property="og:title" content="OG Title"><meta name="twitter:title" content="Twitter Title"></head></html>""").title.getOrElse(""))
        case "title_twitter" => Seq("title" -> meta(
          """<html><head><title>Page Title</title><meta name="twitter:title" content="Twitter Title"></head></html>""").title.getOrElse(""))
        case "title_tag" => Seq("title" -> meta(
          "<html><head><title>Page Title</title></head></html>").title.getOrElse(""))
        case "desc_og" => Seq("description" -> meta(
          """<html><head><meta name="description" content="Meta description"><meta property="og:description" content="OG description"></head></html>""").description.getOrElse(""))
        case "desc_meta" => Seq("description" -> meta(
          """<html><head><meta name="description" content="Meta description"></head></html>""").description.getOrElse(""))
        case "image_og" => Seq("image" -> meta(
          """<html><head><meta property="og:image" content="https://example.com/image.jpg"></head></html>""").image.getOrElse(""))
        case "image_twitter" => Seq("image" -> meta(
          """<html><head><meta name="twitter:image" content="https://example.com/twitter.jpg"></head></html>""").image.getOrElse(""))
        case "author_meta" => Seq("author" -> meta(
          """<html><head><meta name="author" content="John Doe"></head></html>""").author.getOrElse(""))
        case "author_article" => Seq("author" -> meta(
          """<html><head><meta property="article:author" content="Jane Doe"></head></html>""").author.getOrElse(""))
        case "canonical_link" => Seq("canonical" -> meta(
          """<html><head><link rel="canonical" href="https://example.com/canonical"></head></html>""").canonicalUrl.getOrElse(""))
        case "canonical_og" => Seq("canonical" -> meta(
          """<html><head><meta property="og:url" content="https://example.com/og-url"></head></html>""").canonicalUrl.getOrElse(""))
        case "canonical_final" => Seq("canonical" -> meta(
          "<html><head></head></html>", url = "https://example.com/final").canonicalUrl.getOrElse(""))
        case "published_meta" => Seq("published_at" -> meta(
          """<html><head><meta property="article:published_time" content="2024-01-15T10:00:00Z"></head></html>""").publishedAt.getOrElse(""))
        case "published_time_el" => Seq("published_at" -> meta(
          """<html><body><time datetime="2024-01-15">Published Date</time></body></html>""").publishedAt.getOrElse(""))
        case "modified_meta" => Seq("modified_at" -> meta(
          """<html><head><meta property="article:modified_time" content="2024-02-01T12:00:00Z"></head></html>""").modifiedAt.getOrElse(""))
        case "lang_attr" => Seq("language" -> meta(
          """<html lang="en-US"><head></head></html>""").language.getOrElse(""))
        case "lang_og_locale" => Seq("language" -> meta(
          """<html><head><meta property="og:locale" content="fr_FR"></head></html>""").language.getOrElse(""))
        case "keywords_split" => Seq("keywords" -> meta(
          """<html><head><meta name="keywords" content="javascript, typescript, nodejs"></head></html>""").keywords.getOrElse(Nil).mkString("|"))
        case "keywords_empty" => Seq("keywords" -> meta(
          "<html><head></head></html>").keywords.getOrElse(Nil).mkString("|"))
        case "site_name" => Seq("site_name" -> meta(
          """<html><head><meta property="og:site_name" content="My Site"></head></html>""").siteName.getOrElse(""))
        case _ => Nil
      }
      rows
    }
  }

  val metaOracle: String = {
    val rows = Seq(
      ("author_article", "author", "Jane Doe"),
      ("author_meta", "author", "John Doe"),
      ("canonical_final", "canonical", "https://example.com/final"),
      ("canonical_link", "canonical", "https://example.com/canonical"),
      ("canonical_og", "canonical", "https://example.com/og-url"),
      ("desc_meta", "description", "Meta description"),
      ("desc_og", "description", "OG description"),
      ("image_og", "image", "https://example.com/image.jpg"),
      ("image_twitter", "image", "https://example.com/twitter.jpg"),
      ("keywords_empty", "keywords", ""),
      ("keywords_split", "keywords", "javascript|typescript|nodejs"),
      ("lang_attr", "language", "en-US"),
      ("lang_og_locale", "language", "fr_FR"),
      ("modified_meta", "modified_at", "2024-02-01T12:00:00Z"),
      ("name_priority", "name", "meta"),
      ("name_priority", "priority", "100"),
      ("published_meta", "published_at", "2024-01-15T10:00:00Z"),
      ("published_time_el", "published_at", "2024-01-15"),
      ("site_name", "site_name", "My Site"),
      ("title_og", "title", "OG Title"),
      ("title_tag", "title", "Page Title"),
      ("title_twitter", "title", "Twitter Title")
    )
    FixtureSupport.valuesOracle(rows)
  }

  /** M2 JSON-LD polymorphism (`test/extractors/jsonld.test.ts:24-300`). */
  def jsonldFixture(s: SparkSession): DataFrame = {
    import s.implicits._
    import graft.extract.JsonLdExtractor
    def sc(json: String) = s"""<script type="application/ld+json">$json</script>"""
    val cases = Seq(
      "name_priority", "script_extract", "multiple_blocks", "jsonld_array",
      "skip_invalid", "no_jsonld", "article_meta", "author_string",
      "multiple_authors", "image_object", "image_array", "org_site_name",
      "product", "keywords_string", "keywords_array", "keywords_dedupe", "type_array")
    FixtureSupport.fixtureDf(s, cases) { name =>
      def jl(body: String) = JsonLdExtractor.extract(ctx(s"<html><head>$body</head></html>"))
      val rows: Seq[(String, String)] = name match {
        case "name_priority" =>
          Seq("name" -> JsonLdExtractor.name, "priority" -> JsonLdExtractor.priority.toString)
        case "script_extract" =>
          val r = jl(sc("""{"@context": "https://schema.org", "@type": "Article", "headline": "Test Article"}"""))
          Seq(
            "n_blocks" -> r.jsonLd.getOrElse(Nil).length.toString,
            "has_headline" -> r.jsonLd.getOrElse(Nil).headOption.exists(_.contains("Test Article")).toString)
        case "multiple_blocks" =>
          Seq("n_blocks" -> jl(sc("""{"@type": "Article", "headline": "One"}""") +
            sc("""{"@type": "Organization", "name": "Org"}""")).jsonLd.getOrElse(Nil).length.toString)
        case "jsonld_array" =>
          Seq("n_blocks" -> jl(sc("""[{"@type": "Article", "headline": "Article One"}, {"@type": "Article", "headline": "Article Two"}]"""))
            .jsonLd.getOrElse(Nil).length.toString)
        case "skip_invalid" =>
          Seq("n_blocks" -> jl(sc("invalid json{") + sc("""{"@type": "Valid"}"""))
            .jsonLd.getOrElse(Nil).length.toString)
        case "no_jsonld" =>
          Seq("jsonld_defined" -> jl("").jsonLd.isDefined.toString)
        case "article_meta" =>
          val r = jl(sc("""{"@type": "Article", "headline": "Test Headline", "description": "Test description", "author": {"@type": "Person", "name": "John Doe"}, "datePublished": "2024-01-15", "dateModified": "2024-02-01", "image": "https://example.com/image.jpg"}"""))
          Seq(
            "title" -> r.title.getOrElse(""),
            "description" -> r.description.getOrElse(""),
            "author" -> r.author.getOrElse(""),
            "published_at" -> r.publishedAt.getOrElse(""),
            "modified_at" -> r.modifiedAt.getOrElse(""),
            "image" -> r.image.getOrElse(""))
        case "author_string" =>
          Seq("author" -> jl(sc("""{"@type": "Article", "author": "Jane Doe"}""")).author.getOrElse(""))
        case "multiple_authors" =>
          Seq("author" -> jl(sc("""{"@context": "https://schema.org", "@type": "Article", "headline": "Test", "author": [{"@type": "Person", "name": "Author One"}, {"@type": "Person", "name": "Author Two"}]}""")).author.getOrElse(""))
        case "image_object" =>
          Seq("image" -> jl(sc("""{"@type": "Article", "image": {"@type": "ImageObject", "url": "https://example.com/image.jpg"}}""")).image.getOrElse(""))
        case "image_array" =>
          Seq("image" -> jl(sc("""{"@context": "https://schema.org", "@type": "Article", "headline": "Test", "image": ["https://example.com/first.jpg", "https://example.com/second.jpg"]}""")).image.getOrElse(""))
        case "org_site_name" =>
          Seq("site_name" -> jl(sc("""{"@type": "Organization", "name": "My Organization"}""")).siteName.getOrElse(""))
        case "product" =>
          val r = jl(sc("""{"@type": "Product", "name": "Test Product", "description": "Product description", "image": "https://example.com/product.jpg"}"""))
          Seq(
            "title" -> r.title.getOrElse(""),
            "description" -> r.description.getOrElse(""),
            "image" -> r.image.getOrElse(""))
        case "keywords_string" =>
          Seq("keywords" -> jl(sc("""{"@type": "Article", "keywords": "javascript, typescript, nodejs"}""")).keywords.getOrElse(Nil).mkString("|"))
        case "keywords_array" =>
          Seq("keywords" -> jl(sc("""{"@type": "Article", "keywords": ["javascript", "typescript"]}""")).keywords.getOrElse(Nil).mkString("|"))
        case "keywords_dedupe" =>
          Seq("keywords" -> jl(sc("""{"keywords": "javascript, typescript"}""") +
            sc("""{"keywords": "typescript, nodejs"}""")).keywords.getOrElse(Nil).mkString("|"))
        case "type_array" =>
          Seq("title" -> jl(sc("""{"@type": ["Article", "NewsArticle"], "headline": "News"}""")).title.getOrElse(""))
        case _ => Nil
      }
      rows
    }
  }

  val jsonldOracle: String = {
    val rows = Seq(
      ("article_meta", "author", "John Doe"),
      ("article_meta", "description", "Test description"),
      ("article_meta", "image", "https://example.com/image.jpg"),
      ("article_meta", "modified_at", "2024-02-01"),
      ("article_meta", "published_at", "2024-01-15"),
      ("article_meta", "title", "Test Headline"),
      ("author_string", "author", "Jane Doe"),
      ("image_array", "image", "https://example.com/first.jpg"),
      ("image_object", "image", "https://example.com/image.jpg"),
      ("jsonld_array", "n_blocks", "2"),
      ("keywords_array", "keywords", "javascript|typescript"),
      ("keywords_dedupe", "keywords", "javascript|typescript|nodejs"),
      ("keywords_string", "keywords", "javascript|typescript|nodejs"),
      ("multiple_authors", "author", "Author One, Author Two"),
      ("multiple_blocks", "n_blocks", "2"),
      ("name_priority", "name", "jsonld"),
      ("name_priority", "priority", "80"),
      ("no_jsonld", "jsonld_defined", "false"),
      ("org_site_name", "site_name", "My Organization"),
      ("product", "description", "Product description"),
      ("product", "image", "https://example.com/product.jpg"),
      ("product", "title", "Test Product"),
      ("script_extract", "has_headline", "true"),
      ("script_extract", "n_blocks", "1"),
      ("skip_invalid", "n_blocks", "1"),
      ("type_array", "title", "News")
    )
    FixtureSupport.valuesOracle(rows)
  }

  def linksFixture(s: SparkSession): DataFrame = {
    import s.implicits._
    val cases = Seq(
      "name_priority", "extract_two", "mark_external", "resolve_relative",
      "link_text", "title_fallback", "skip_anchor", "skip_javascript",
      "skip_mailto_tel", "skip_short_text", "dedupe", "skip_nav",
      "skip_header", "skip_footer", "skip_nav_class", "prefer_article",
      "prefer_main", "fallback_body", "cap_text_200", "cap_100_links")
    FixtureSupport.fixtureDf(s, cases) { name =>
      def links(html: String, url: String = "https://example.com") =
        LinksExtractor.extract(ctx(html, url)).links.getOrElse(Nil)
      val rows: Seq[(String, String)] = name match {
        case "name_priority" =>
          Seq("name" -> LinksExtractor.name, "priority" -> LinksExtractor.priority.toString)
        case "extract_two" =>
          Seq("n_links" -> links(art(
            """<a href="https://external.com/page">External Link</a><a href="/internal/page">Internal Link</a>""")).length.toString)
        case "mark_external" =>
          val ls = links(art(
            """<a href="https://other.com/page">External</a><a href="https://example.com/page">Internal</a>"""))
          Seq(
            "external" -> ls.find(_.url.contains("other.com")).map(_.isExternal).getOrElse(false).toString,
            "internal" -> ls.find(_.url.contains("example.com")).map(_.isExternal).getOrElse(true).toString)
        case "resolve_relative" =>
          val ls = links(art(
            """<a href="/relative/path">Relative Link</a><a href="./another/path">Another Relative</a>"""),
            url = "https://example.com/page/")
          Seq("resolved" -> ls.exists(_.url == "https://example.com/relative/path").toString)
        case "link_text" =>
          Seq("text" -> links(art("""<a href="https://example.com/link">Link Text Here</a>""")).head.text)
        case "title_fallback" =>
          val ls = links(art("""<a href="https://example.com/link" title="Title Text"></a>"""))
          Seq("n_links" -> ls.length.toString, "text" -> ls.head.text)
        case "skip_anchor" =>
          val ls = links(art("""<a href="#section">Anchor Link</a><a href="https://example.com/real">Real Link</a>"""))
          Seq("n_links" -> ls.length.toString, "no_hash" -> (!ls.head.url.contains("#")).toString)
        case "skip_javascript" =>
          Seq("n_links" -> links(art(
            """<a href="javascript:void(0)">JS Link</a><a href="https://example.com/real">Real Link</a>""")).length.toString)
        case "skip_mailto_tel" =>
          Seq("n_links" -> links(art(
            """<a href="mailto:test@example.com">Email</a><a href="tel:+1234567890">Phone</a><a href="https://example.com/real">Real Link</a>""")).length.toString)
        case "skip_short_text" =>
          val ls = links(art(
            """<a href="https://example.com/a">X</a><a href="https://example.com/b">Longer Text</a>"""))
          Seq("n_links" -> ls.length.toString, "text" -> ls.head.text)
        case "dedupe" =>
          Seq("n_links" -> links(art(
            """<a href="https://example.com/page">Link One</a><a href="https://example.com/page">Link Two</a>""")).length.toString)
        case "skip_nav" =>
          val ls = links(
            """<html><body><nav><a href="https://example.com/nav">Nav Link</a></nav><article><a href="https://example.com/content">Content Link</a></article></body></html>""")
          Seq("n_links" -> ls.length.toString, "in_content" -> ls.head.url.contains("content").toString)
        case "skip_header" =>
          Seq("n_links" -> links(
            """<html><body><header><a href="https://example.com/header">Header Link</a></header><article><a href="https://example.com/content">Content Link</a></article></body></html>""").length.toString)
        case "skip_footer" =>
          Seq("n_links" -> links(
            """<html><body><article><a href="https://example.com/content">Content Link</a></article><footer><a href="https://example.com/footer">Footer Link</a></footer></body></html>""").length.toString)
        case "skip_nav_class" =>
          Seq("n_links" -> links(
            """<html><body><div class="navigation-menu"><a href="https://example.com/menu">Menu Link</a></div><article><a href="https://example.com/content">Content Link</a></article></body></html>""").length.toString)
        case "prefer_article" =>
          val ls = links(
            """<html><body><article><a href="https://example.com/article">Article Link</a></article><aside><a href="https://example.com/aside">Aside Link</a></aside></body></html>""")
          Seq("n_links" -> ls.length.toString, "in_article" -> ls.head.url.contains("article").toString)
        case "prefer_main" =>
          Seq("n_links" -> links(
            """<html><body><main><a href="https://example.com/main">Main Link</a></main><aside><a href="https://example.com/aside">Aside Link</a></aside></body></html>""").length.toString)
        case "fallback_body" =>
          Seq("n_links" -> links(
            """<html><body><div><a href="https://example.com/div">Div Link</a></div></body></html>""").length.toString)
        case "cap_text_200" =>
          val long = "A" * 300
          Seq("text_len" -> links(art(s"""<a href="https://example.com/link">$long</a>""")).head.text.length.toString)
        case "cap_100_links" =>
          val many = (0 until 150).map(i =>
            s"""<a href="https://example.com/link$i">Link $i</a>""").mkString
          Seq("n_links" -> links(art(many)).length.toString)
        case _ => Nil
      }
      rows
    }
  }

  val linksOracle: String = {
    val rows = Seq(
      ("cap_100_links", "n_links", "100"),
      ("cap_text_200", "text_len", "200"),
      ("dedupe", "n_links", "1"),
      ("extract_two", "n_links", "2"),
      ("fallback_body", "n_links", "1"),
      ("link_text", "text", "Link Text Here"),
      ("mark_external", "external", "true"),
      ("mark_external", "internal", "false"),
      ("name_priority", "name", "links"),
      ("name_priority", "priority", "30"),
      ("prefer_article", "in_article", "true"),
      ("prefer_article", "n_links", "1"),
      ("prefer_main", "n_links", "1"),
      ("resolve_relative", "resolved", "true"),
      ("skip_anchor", "n_links", "1"),
      ("skip_anchor", "no_hash", "true"),
      ("skip_footer", "n_links", "1"),
      ("skip_header", "n_links", "1"),
      ("skip_javascript", "n_links", "1"),
      ("skip_mailto_tel", "n_links", "1"),
      ("skip_nav", "in_content", "true"),
      ("skip_nav", "n_links", "1"),
      ("skip_nav_class", "n_links", "1"),
      ("skip_short_text", "n_links", "1"),
      ("skip_short_text", "text", "Longer Text"),
      ("title_fallback", "n_links", "1"),
      ("title_fallback", "text", "Title Text")
    )
    FixtureSupport.valuesOracle(rows)
  }
}
