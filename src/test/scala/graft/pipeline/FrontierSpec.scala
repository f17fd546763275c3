package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Frontier operator over the frozen sitemap fixture corpus: robots
  * gating per host, seen-set anti-join, URL normalization, dedup, and the
  * index-file child worklist. The `sitemap_frontier` driver oracle gates
  * the same composition; this spec additionally pins column-level fields
  * (host, priority) and the childSitemaps output the oracle doesn't carry. */
class FrontierSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("graft-test")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def blobsDf(names: Set[String]) = {
    import org.apache.spark.sql.Encoders
    spark.createDataset(
        SitemapFixture.blobs.filter(b => names(b._1))
          .map { case (n, b) => (s"https://fixture.example.com/$n", b) })(
        Encoders.tuple(Encoders.STRING, Encoders.BINARY))
      .toDF("sitemap_url", "body")
  }

  test("fromSitemaps: normalize + robots gate + seen anti-join + dedup") {
    val s = spark; import s.implicits._
    val robotsTxt = new String(SitemapFixture.blobs.toMap.apply("robots"), "UTF-8")
    val robots = Seq(("shop.example.com", robotsTxt)).toDF("host", "robots_txt")
    val seen = Seq("https://txt.example.com/a").toDF("url")
    val out = Frontier.fromSitemaps(spark,
      blobsDf(Set("urlset", "gz_urlset", "ns_prefixed", "index", "txt")),
      robots, seen)
    val rows = out.orderBy("url").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(3)))
    assert(rows.toSeq == Seq(
      ("http://shop.example.com/bare", "shop.example.com", -1.0),
      ("http://txt.example.com/b", "txt.example.com", -1.0),
      ("https://gz.example.com/only", "gz.example.com", -1.0),
      ("https://ns.example.com/x", "ns.example.com", 1.0),
      ("https://shop.example.com/p?id=1&v=2", "shop.example.com", 0.8)))
    // /private/ disallowed by the planted rules; the seen URL anti-joined
    assert(!rows.exists(_._1.contains("/private/")))
    assert(!rows.exists(_._1 == "https://txt.example.com/a"))
  }

  test("fromSitemaps: hosts without a robots row pass fail-open; duplicate URLs collapse") {
    val s = spark; import s.implicits._
    val robots = Seq.empty[(String, String)].toDF("host", "robots_txt")
    val seen = Seq.empty[String].toDF("url")
    // txt blob + urlset blob share no URLs; feeding the txt blob twice
    // under two sitemap_urls must still yield each URL once
    val twice = blobsDf(Set("txt"))
      .union(blobsDf(Set("txt")).withColumn("sitemap_url",
        org.apache.spark.sql.functions.lit("https://fixture.example.com/txt2")))
    val out = Frontier.fromSitemaps(spark, twice, robots, seen)
    assert(out.count() == 2)
    assert(out.select("url").as[String].collect().sorted.toSeq ==
      Seq("http://txt.example.com/b", "https://txt.example.com/a"))
  }

  test("childSitemaps: index files emit (parent, child) worklist rows") {
    val out = Frontier.childSitemaps(spark, blobsDf(Set("index", "txt")))
      .orderBy("child").collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(
      ("https://fixture.example.com/index", "https://idx.example.com/a.xml"),
      ("https://fixture.example.com/index", "https://idx.example.com/b.xml.gz")))
  }

  test("robots rules match the RAW loc: normalization cannot bypass a Disallow") {
    val s = spark; import s.implicits._
    // normalizeUrl strips the trailing slash; matching the normalized form
    // '/private' against 'Disallow: /private/' would wrongly admit it
    val sm = ("<urlset><url><loc>https://shop.example.com/private/</loc></url>" +
      "<url><loc>https://shop.example.com/open/page</loc></url></urlset>").getBytes("UTF-8")
    val blobs = Seq(("https://shop.example.com/sm.xml", sm)).toDF("sitemap_url", "body")
    val robots = Seq(("shop.example.com", "User-agent: *\nDisallow: /private/"))
      .toDF("host", "robots_txt")
    val seen = Seq.empty[String].toDF("url")
    val urls = Frontier.fromSitemaps(spark, blobs, robots, seen)
      .select("url").as[String].collect().toSet
    assert(urls == Set("https://shop.example.com/open/page"))
  }

  test("interleaveByHost: rounds rotate hosts; a mega-host cannot dominate the head") {
    val s = spark; import s.implicits._
    // 1 mega-host with 50 urls + 5 small hosts with 2 each
    val rows = (1 to 50).map(i => (f"https://mega.example.com/p$i%03d", "mega.example.com")) ++
      (1 to 5).flatMap(h => (1 to 2).map(i =>
        (s"https://h$h.example.com/p$i", s"h$h.example.com")))
    val frontier = rows.toDF("url", "host")
    val out = Frontier.interleaveByHost(frontier)
      .orderBy("host_seq", "host", "url").collect()
      .map(r => (r.getString(1), r.getLong(2)))
    // rounds 1 and 2: all 6 hosts present, so the first 12 fetches visit
    // every host twice with no host twice in a row
    val first12 = out.take(12)
    assert(first12.count(_._1 == "mega.example.com") == 2)
    first12.sliding(2).foreach { case Array((h1, _), (h2, _)) =>
      assert(h1 != h2, s"adjacent fetches hit the same host: $h1")
    }
    // per-host seq is contiguous from 1
    out.groupBy(_._1).foreach { case (h, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq, s"host $h")
    }
    // deterministic across partitioning
    val again = Frontier.interleaveByHost(frontier.repartition(7))
      .orderBy("host_seq", "host", "url").collect().map(r => (r.getString(1), r.getLong(2)))
    assert(again.toSeq == out.toSeq)
  }

  test("repeated URLs across sitemaps collapse deterministically to max lastmod/priority") {
    val s = spark; import s.implicits._
    val sm1 = ("<urlset><url><loc>https://x.example.com/a</loc>" +
      "<lastmod>2024-01-01</lastmod><priority>0.3</priority></url></urlset>").getBytes("UTF-8")
    val sm2 = ("<urlset><url><loc>https://x.example.com/a</loc>" +
      "<lastmod>2024-06-01</lastmod><priority>0.9</priority></url></urlset>").getBytes("UTF-8")
    val blobs = Seq(("https://x.example.com/1.xml", sm1), ("https://x.example.com/2.xml", sm2))
      .toDF("sitemap_url", "body")
    val robots = Seq.empty[(String, String)].toDF("host", "robots_txt")
    val seen = Seq.empty[String].toDF("url")
    val rows = Frontier.fromSitemaps(spark, blobs, robots, seen).collect()
    assert(rows.length == 1)
    assert(rows.head.getString(2) == "2024-06-01" && rows.head.getDouble(3) == 0.9)
  }
}
