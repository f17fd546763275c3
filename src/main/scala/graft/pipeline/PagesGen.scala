package graft.pipeline

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}

/** One input-table row — the `input_hint` schema from BASELINE.json:
  * `(url string, warc_ts timestamp, html binary, text string, lang string)`. */
final case class PageRow(url: String, warc_ts: Timestamp, html: Array[Byte], text: String, lang: String)

/**
 * Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md): row `i` is
 * a pure function of `(Seed, i)` — independent of partitioning, so any
 * parallelism level sees byte-identical input. Hosts follow a Zipf-like
 * distribution with one deliberate mega-host (~20% of rows) to exercise the
 * salt-based skew splitting the north rule demands. HTML is assembled from
 * the vendored scrapex fixture templates plus parameterized variants
 * (boilerplate permutations, metadata ablations, entity mutations).
 *
 * Generated via `spark.range(n)` → typed map: the generator itself is
 * embarrassingly parallel and column-prunable.
 */
object PagesGen {

  val Seed = 42L
  private val BaseTs = 1700000000000L // fixed epoch — no wall clock in row data

  /** Page count per driver sf dir (sfDir only sets scale; content is seed-driven). */
  def pagesFor(sfDir: String): Int =
    if (sfDir.contains("sf0.1")) 20000
    else if (sfDir.contains("sf0.01")) 2000
    else 400

  def generate(spark: SparkSession, n: Int): Dataset[PageRow] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map(i => makePage(i)))
  }

  /** Markup-heavy variant: same article text, ~10× the boilerplate markup
    * (real-web ratio; the default corpus is text-dense). Used by the
    * plan-order experiment in BASELINE.md — extraction strips the
    * boilerplate, so extracted rows stay small while `html` inflates, which
    * is exactly the regime where extract-first shuffles fewer bytes. */
  def generateHeavy(spark: SparkSession, n: Int): Dataset[PageRow] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map(i => makePage(i, heavy = true)))
  }

  /** Deterministic per-host robots.txt for the S2 gate: four variants keyed
    * by a host hash, exercising fail-open, Allow-before-Disallow precedence,
    * specific-agent-overrides-`*`, and `*`/`$` wildcards
    * (`/root/reference/src/fetchers/robots.ts:62-167` semantics). */
  def robotsFor(host: String): String =
    Math.floorMod(graft.ops.TextOps.fnv64(host), 4L).toInt match {
      case 0 => "" // no robots.txt → fail-open allowed
      case 1 => "User-agent: *\nDisallow: /docs/\nDisallow: /posts/\nAllow: /posts/post-1\n"
      case 2 => "User-agent: ScrapexBot\nDisallow: /news/\n\nUser-agent: *\nDisallow: /\n"
      case _ => "User-agent: *\nDisallow: /art*les/\nDisallow: /wiki/post-11$\n"
    }

  /** The broadcast side table for the robots gate: one row per distinct host.
    * At 100 TB this is the (host, robots_txt) table the crawler maintains —
    * tiny relative to the corpus (≤ millions of hosts), hence broadcastable. */
  def robotsTable(spark: SparkSession, pages: Dataset[PageRow]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    pages.toDF().select(ExtractJob.hostCol.as("host")).distinct()
      .as[String].map(h => (h, robotsFor(h))).toDF("host", "robots_txt")
  }

  // --- deterministic per-row PRNG (splitmix64) ---
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private final class Rnd(var state: Long) {
    def nextLong(): Long = { state = mix(state); state }
    def nextInt(bound: Int): Int = (Math.floorMod(nextLong(), bound.toLong)).toInt
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
  }

  private val lexicon: Array[String] =
    ("spark catalyst shuffle partition executor dataset column parquet stream batch window schema " +
     "extraction pipeline content article heading paragraph crawler index token markup anchor " +
     "document classifier density candidate sibling boilerplate normalize entity unicode charset " +
     "throughput latency cluster scale skew salt manifest lineage checkpoint resume metric counter " +
     "quality language corpus shingle signature bucket neighbor vector cosine embed chunk overlap " +
     "border table figure caption quote license archive mirror cache header footer sidebar menu " +
     "research analysis report summary evidence method result dataset1 appendix reference citation").split(" ")

  private val tlds = Array("com", "org", "net", "io", "dev", "info")
  private val cats = Array("blog", "news", "docs", "articles", "posts", "wiki")
  private val langs = Array("en", "en", "en", "de", "fr", "es", "it", "pt")

  /** Zipf-ish host pick: host 0 is the mega-host (~20%), then a long tail. */
  private def pickHost(r: Rnd): String = {
    val u = r.nextDouble()
    val rank =
      if (u < 0.20) 0
      else if (u < 0.32) 1 + r.nextInt(4)
      else if (u < 0.55) 5 + r.nextInt(45)
      else 50 + r.nextInt(950)
    val tld = tlds(rank % tlds.length)
    if (rank == 0) s"www.megahost.$tld" else s"site-$rank.$tld"
  }

  private def sentence(r: Rnd, words: Int): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < words) {
      val w = lexicon(r.nextInt(lexicon.length))
      if (i == 0) sb.append(w.capitalize) else { sb.append(' '); sb.append(w) }
      i += 1
    }
    sb.append('.')
    sb.toString
  }

  private def paragraph(r: Rnd): String = {
    val n = 2 + r.nextInt(4)
    (0 until n).map(_ => sentence(r, 8 + r.nextInt(12))).mkString(" ")
  }

  def makePage(i: Long): PageRow = makePage(i, heavy = false)

  def makePage(i: Long, heavy: Boolean): PageRow = {
    // dedup-realism: every 100th row is an EXACT content dup of its
    // predecessor (same body, different url/host), every other 50th row a
    // NEAR dup (one extra trailing sentence) — ~1% + ~1% of the corpus,
    // exercising exact-hash, minhash/simhash and jaccard dedup paths
    val isDup = i > 0 && i % 50 == 0
    val isNearDup = isDup && i % 100 != 0
    val contentId = if (isDup) i - 1 else i
    val r = new Rnd(mix(Seed ^ (contentId * 0x9e3779b97f4a7c15L)))
    val rUrl = new Rnd(mix(Seed ^ 0x75726cL ^ (i * 0x9e3779b97f4a7c15L)))
    val host = pickHost(rUrl)
    val cat = cats(rUrl.nextInt(cats.length))
    val url = s"https://$host/$cat/post-$i"
    val lang = langs(r.nextInt(langs.length))
    val title = sentence(r, 3 + r.nextInt(4)).dropRight(1)
    val desc = sentence(r, 8 + r.nextInt(6))
    val author = s"${lexicon(r.nextInt(lexicon.length)).capitalize} ${lexicon(r.nextInt(lexicon.length)).capitalize}"
    val date = f"2023-${1 + r.nextInt(12)}%02d-${1 + r.nextInt(28)}%02d"
    val nParas = 3 + r.nextInt(10)
    val paras0 = (0 until nParas).map(_ => paragraph(r))
    val paras =
      if (isNearDup) paras0 :+ s"Editorial update ${i % 97}: minor correction appended to this revision."
      else paras0
    val hasOg = r.nextInt(10) < 8
    val hasJsonLd = r.nextInt(10) < 4
    val hasList = r.nextInt(10) < 5
    val hasCode = r.nextInt(10) < 3
    val hasEntities = r.nextInt(10) < 3
    val extLink = s"https://site-${r.nextInt(900)}.org/ref/${r.nextInt(1000)}"

    val sb = new StringBuilder(4096)
    sb.append("<!DOCTYPE html>\n<html lang=\"").append(lang).append("\">\n<head>\n")
    sb.append("<meta charset=\"utf-8\">\n<title>").append(title).append(" | Site ").append(host).append("</title>\n")
    if (hasOg) {
      sb.append("<meta property=\"og:title\" content=\"").append(title).append("\">\n")
      sb.append("<meta property=\"og:description\" content=\"").append(desc).append("\">\n")
    }
    sb.append("<meta name=\"description\" content=\"").append(desc).append("\">\n")
    sb.append("<meta name=\"author\" content=\"").append(author).append("\">\n")
    sb.append("<meta name=\"keywords\" content=\"").append(lexicon(r.nextInt(20))).append(",").append(lexicon(20 + r.nextInt(20))).append("\">\n")
    sb.append("<link rel=\"canonical\" href=\"").append(url).append("\">\n")
    if (hasJsonLd) {
      sb.append("""<script type="application/ld+json">{"@context":"https://schema.org","@type":"Article","headline":"""")
        .append(title).append("""","author":{"@type":"Person","name":"""").append(author)
        .append(""""},"datePublished":"""").append(date).append("""T09:00:00Z"}</script>""").append('\n')
    }
    sb.append("</head>\n<body>\n")
    sb.append("<header id=\"masthead\"><nav><ul><li><a href=\"/\">Home</a></li><li><a href=\"/about\">About</a></li><li><a href=\"/contact\">Contact</a></li></ul></nav></header>\n")
    sb.append("<div class=\"sidebar\"><div class=\"widget\"><h3>Related Posts</h3><ul><li><a href=\"/p/1\">Older post</a></li></ul></div>")
    sb.append("<div class=\"ad-unit\"><script>document.write('Ad content ").append(r.nextInt(100)).append("');</script></div></div>\n")
    if (heavy) {
      // real-web markup inflation: dozens of nav/widget/tracking blocks the
      // extractor strips — a SEPARATE rnd stream so the article content
      // stays identical to the light variant of the same row
      val rb = new Rnd(mix(Seed ^ 0x626f696cL ^ (i * 0x9e3779b97f4a7c15L)))
      sb.append("<div class=\"mega-nav\" role=\"navigation\">\n")
      (0 until 24).foreach { k =>
        sb.append("<div class=\"widget w").append(k).append("\" data-track=\"")
          .append(java.lang.Long.toHexString(rb.nextLong())).append("\"><h4>")
          .append(sentence(rb, 3)).append("</h4><ul>")
        (0 until 8).foreach { j =>
          sb.append("<li><a class=\"navlink\" data-cat=\"").append(lexicon(rb.nextInt(lexicon.length)))
            .append("\" href=\"/").append(lexicon(rb.nextInt(lexicon.length))).append('/')
            .append(rb.nextInt(10000)).append("\">").append(sentence(rb, 4)).append("</a></li>")
        }
        sb.append("</ul></div>\n")
      }
      sb.append("</div>\n<script type=\"application/json\" class=\"tracker-state\">{")
      (0 until 40).foreach { k =>
        if (k > 0) sb.append(',')
        sb.append('"').append(lexicon(rb.nextInt(lexicon.length))).append(k).append("\":\"")
          .append(java.lang.Long.toHexString(rb.nextLong())).append('"')
      }
      sb.append("}</script>\n")
    }
    sb.append("<main role=\"main\"><article class=\"post\">\n")
    sb.append("<h1 class=\"entry-title\">").append(title).append("</h1>\n")
    sb.append("<div class=\"entry-meta\"><span class=\"author\">By ").append(author)
      .append("</span> <time datetime=\"").append(date).append("\">").append(date).append("</time></div>\n")
    sb.append("<div class=\"entry-content\">\n")
    paras.zipWithIndex.foreach { case (p, idx) =>
      if (idx == 1) sb.append("<h2>").append(sentence(r, 3).dropRight(1)).append("</h2>\n")
      sb.append("<p>").append(if (hasEntities && idx == 0) p.replace(" ", "&nbsp;", 1).replace("a", "&#97;", 1) else p)
      if (idx == 2) sb.append(" See the <a href=\"/wiki/ref-").append(r.nextInt(500)).append("\">reference</a> and <a href=\"")
        .append(extLink).append("\">external guide</a>.")
      sb.append("</p>\n")
    }
    if (hasList) {
      sb.append("<ul>")
      (0 until 2 + r.nextInt(4)).foreach(k => sb.append("<li>Point ").append(k + 1).append(": ").append(sentence(r, 5)).append("</li>"))
      sb.append("</ul>\n")
    }
    if (hasCode) sb.append("<pre><code class=\"language-scala\">val x = ").append(r.nextInt(100)).append("\nprintln(x)</code></pre>\n")
    sb.append("</div>\n<footer class=\"entry-footer\"><div class=\"tags\">Tags: <a href=\"/tag/t1\">T1</a></div></footer>\n")
    sb.append("</article>\n<div id=\"comments\"><h3>").append(r.nextInt(9)).append(" Comments</h3><div class=\"comment\">Great post!</div></div>\n</main>\n")
    sb.append("<footer id=\"colophon\"><p>&copy; 2023 ").append(host).append(". All rights reserved. <a href=\"/privacy\">Privacy</a></p>")
    if (heavy) {
      // footer link farm + comment threads (also stripped by extraction)
      val rf = new Rnd(mix(Seed ^ 0x666f6f74L ^ (i * 0x9e3779b97f4a7c15L)))
      sb.append("<div class=\"footer-links\">")
      (0 until 120).foreach { k =>
        sb.append("<a rel=\"nofollow\" href=\"/t/").append(rf.nextInt(100000)).append("\">")
          .append(lexicon(rf.nextInt(lexicon.length))).append(' ').append(k).append("</a> ")
      }
      sb.append("</div><div class=\"comment-farm\">")
      (0 until 16).foreach { k =>
        sb.append("<div class=\"comment\" id=\"c").append(k).append("\"><span class=\"meta\">user")
          .append(rf.nextInt(5000)).append("</span><p>").append(sentence(rf, 10 + rf.nextInt(10)))
          .append("</p></div>")
      }
      sb.append("</div>")
    }
    sb.append("</footer>\n")
    sb.append("</body>\n</html>\n")

    val html = sb.toString
    val crawlText = paras.mkString(" ") // crawl-provided plain text (untrusted per FIXTURES.md)
    PageRow(url, new Timestamp(BaseTs + i * 1000L), html.getBytes("UTF-8"), crawlText, lang)
  }

  implicit private class StrOps(private val s: String) extends AnyVal {
    /** replace first n occurrences only */
    def replace(from: String, to: String, n: Int): String = {
      var res = s
      var i = 0
      while (i < n) {
        val idx = res.indexOf(from)
        if (idx < 0) return res
        res = res.substring(0, idx) + to + res.substring(idx + from.length)
        i += 1
      }
      res
    }
  }
}
