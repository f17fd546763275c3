package graft.pipeline

import java.io.ByteArrayOutputStream
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Sitemap

/**
 * Frozen sitemap fixture corpus + the two driver queries over it.
 *
 * `sitemap_fixture` — per-blob parse surface: every [[Sitemap.parse]] /
 * [[Sitemap.robotsSitemaps]] output field as `(test_case, seq, kind, loc,
 * lastmod, changefreq, priority, truncated)` rows against a transcribed
 * VALUES oracle (the PdfGen/WarcGen pattern: the expected rows are written
 * from the spec, not from running the code).
 *
 * `sitemap_frontier` — the composition the parser exists for: discovered
 * urlset entries, normalized ([[graft.urlx.UrlOps.normalizeUrl]]),
 * robots-gated per host (broadcast side table), already-crawled URLs
 * anti-joined out, deduped. Every stage is the same shape it runs at
 * archive scale (mapPartitions parse, broadcast robots, left-anti seen
 * set); the small corpus only makes the oracle transcribable.
 */
object SitemapFixture {

  private def gz(s: String): Array[Byte] = {
    val bo = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bo)
    g.write(s.getBytes("UTF-8")); g.close()
    bo.toByteArray
  }

  /** Deterministic fixture blobs, one per test case. */
  def blobs: Seq[(String, Array[Byte])] = Seq(
    "urlset" -> (
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<url><loc>https://shop.example.com/p?id=1&amp;v=2</loc><lastmod>2024-03-01T10:00:00Z</lastmod><changefreq>daily</changefreq><priority>0.8</priority></url>
        |<url><loc>http://shop.example.com/bare</loc></url>
        |<url><loc>ftp://shop.example.com/skipped</loc></url>
        |<url><loc>https://shop.example.com/private/page</loc><priority>0.5</priority></url>
        |</urlset>""".stripMargin.getBytes("UTF-8")),
    "gz_urlset" -> gz(
      "<urlset><url><loc>https://gz.example.com/only</loc><lastmod>2024-05-05</lastmod></url></urlset>"),
    "ns_prefixed" -> (
      """<sm:urlset xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<sm:url><sm:loc>https://ns.example.com/x</sm:loc><sm:priority>1.0</sm:priority></sm:url>
        |</sm:urlset>""".stripMargin.getBytes("UTF-8")),
    "index" -> (
      """<sitemapindex><sitemap><loc>https://idx.example.com/a.xml</loc><lastmod>2024-01-01</lastmod></sitemap>
        |<sitemap><loc>https://idx.example.com/b.xml.gz</loc></sitemap></sitemapindex>""".stripMargin.getBytes("UTF-8")),
    "txt" -> "https://txt.example.com/a\nnot a url\nhttp://txt.example.com/b\n".getBytes("UTF-8"),
    "robots" -> (
      """User-agent: *
        |Disallow: /private/
        |Sitemap: https://shop.example.com/sitemap.xml
        |sitemap: https://shop.example.com/news.xml
        |Sitemap: https://shop.example.com/sitemap.xml
        |""".stripMargin.getBytes("UTF-8")),
    "bad_xml" -> "<rss><channel></channel></rss>".getBytes("UTF-8"),
    "empty" -> Array.emptyByteArray)

  /** Transcribed expected rows (spec-derived, not code-derived). */
  def expectedRows: Seq[(String, Long, String, String, String, String, String, Boolean)] = Seq(
    ("bad_xml", -1L, "error", "", "", "", "", false),
    ("empty", -1L, "empty", "", "", "", "", false),
    ("gz_urlset", 0L, "urlset", "https://gz.example.com/only", "2024-05-05", "", "", false),
    ("index", 0L, "index", "https://idx.example.com/a.xml", "", "", "", false),
    ("index", 1L, "index", "https://idx.example.com/b.xml.gz", "", "", "", false),
    ("ns_prefixed", 0L, "urlset", "https://ns.example.com/x", "", "", "1.0", false),
    ("robots", 0L, "robots", "https://shop.example.com/sitemap.xml", "", "", "", false),
    ("robots", 1L, "robots", "https://shop.example.com/news.xml", "", "", "", false),
    ("txt", 0L, "txt", "https://txt.example.com/a", "", "", "", false),
    ("txt", 1L, "txt", "http://txt.example.com/b", "", "", "", false),
    ("urlset", 0L, "urlset", "https://shop.example.com/p?id=1&v=2", "2024-03-01T10:00:00Z", "daily", "0.8", false),
    ("urlset", 1L, "urlset", "http://shop.example.com/bare", "", "", "", false),
    ("urlset", 2L, "urlset", "https://shop.example.com/private/page", "", "", "0.5", false))

  def fixtureDf(s: SparkSession): DataFrame = {
    import s.implicits._
    s.createDataset(blobs.map { case (name, b) => (name, b) })(
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.STRING, org.apache.spark.sql.Encoders.BINARY))
      .repartition(2)
      .mapPartitions(_.flatMap { case (name, bytes) =>
        if (name == "robots")
          Sitemap.robotsSitemaps(new String(bytes, "UTF-8")).zipWithIndex.map {
            case (u, i) => (name, i.toLong, "robots", u, "", "", "", false)
          }
        else {
          val r = Sitemap.parse(bytes)
          val rows = r.kind match {
            case "urlset" | "txt" => r.entries.zipWithIndex.map { case (e, i) =>
              (name, i.toLong, r.kind, e.loc, e.lastmod, e.changefreq,
               e.priority.map(p => f"$p%.1f").getOrElse(""), r.truncated)
            }
            case "index" => r.children.zipWithIndex.map { case (u, i) =>
              (name, i.toLong, "index", u, "", "", "", r.truncated)
            }
            case other => Vector((name, -1L, other, "", "", "", "", r.truncated))
          }
          rows
        }
      })
      .toDF("test_case", "seq", "kind", "loc", "lastmod", "changefreq", "priority", "truncated")
      .orderBy("test_case", "seq")
  }

  def fixtureOracle: String = {
    val values = expectedRows.map { case (c, q, k, l, lm, cf, p, t) =>
      s"  ('$c', $q, '$k', '${l.replace("'", "''")}', '$lm', '$cf', '$p', $t)"
    }
    "SELECT test_case, CAST(seq AS BIGINT) AS seq, kind, loc, lastmod, changefreq, priority, truncated " +
      s"FROM (VALUES\n${values.mkString(",\n")}\n) AS t(test_case, seq, kind, loc, lastmod, changefreq, priority, truncated) " +
      "ORDER BY test_case, seq"
  }

  /** Frontier composition, oracle-gating the production operator
    * [[Frontier.fromSitemaps]]: parse all urlset/txt blobs → normalize →
    * robots-gate by host (the planted rules disallow `/private/` on
    * shop.example.com) → anti-join the already-crawled set → distinct,
    * sorted. The `robots` blob is the side table, not a sitemap. */
  def frontierDf(s: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    import s.implicits._
    val blobsDf = s.createDataset(
        blobs.filter(_._1 != "robots").map { case (n, b) => (s"https://fixture.example.com/$n", b) })(
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.STRING, org.apache.spark.sql.Encoders.BINARY))
      .repartition(2)
      .toDF("sitemap_url", "body")
    val robotsTxt = new String(blobs.toMap.apply("robots"), "UTF-8")
    val robots = s.createDataset(Seq(("shop.example.com", robotsTxt))).toDF("host", "robots_txt")
    val seen = s.createDataset(Seq("https://txt.example.com/a")).toDF("url")
    Frontier.fromSitemaps(s, blobsDf, robots, seen)
      .select("url")
      .orderBy("url")
  }

  /** Same composition, seen-set subtracted via [[Frontier.unseenByBloom]]
    * (Bloom prefilter + exact verify join). Bloom filters have NO false
    * negatives, so the output is BIT-IDENTICAL to the plain anti-join —
    * this query therefore shares `frontierOracle` verbatim: the driver
    * hash-compares the probabilistic scale path against the exact one. */
  def frontierBloomDf(s: SparkSession): DataFrame = {
    import s.implicits._
    val blobsDf = s.createDataset(
        blobs.filter(_._1 != "robots").map { case (n, b) => (s"https://fixture.example.com/$n", b) })(
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.STRING, org.apache.spark.sql.Encoders.BINARY))
      .repartition(2)
      .toDF("sitemap_url", "body")
    val robotsTxt = new String(blobs.toMap.apply("robots"), "UTF-8")
    val robots = s.createDataset(Seq(("shop.example.com", robotsTxt))).toDF("host", "robots_txt")
    val seen = s.createDataset(Seq("https://txt.example.com/a")).toDF("url")
    Frontier.fromSitemaps(s, blobsDf, robots, seen, bloomExpectedSeen = 1024L)
      .select("url")
      .orderBy("url")
  }

  def frontierOracle: String =
    "SELECT * FROM (VALUES " +
      "('http://shop.example.com/bare'), " +
      "('http://txt.example.com/b'), " +
      "('https://gz.example.com/only'), " +
      "('https://ns.example.com/x'), " +
      "('https://shop.example.com/p?id=1&v=2')" +
      ") AS t(url) ORDER BY url"
}
