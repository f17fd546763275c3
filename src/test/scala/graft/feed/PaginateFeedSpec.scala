package graft.feed

import org.scalatest.funsuite.AnyFunSuite

/** S4 — paginateFeed (feed.ts:171-191): rel="next" chain walk, RFC 5005. */
class PaginateFeedSpec extends AnyFunSuite {

  private def atomPage(n: Int, next: Option[String]): String =
    s"""<?xml version="1.0"?>
       |<feed xmlns="http://www.w3.org/2005/Atom">
       |  <title>Page $n</title>
       |  <link href="https://feeds.example.com/p$n"/>
       |  ${next.map(u => s"""<link rel="next" href="$u"/>""").getOrElse("")}
       |  <entry><title>Entry $n</title><id>https://feeds.example.com/e$n</id></entry>
       |</feed>""".stripMargin

  private val chain = Map(
    "https://feeds.example.com/p1" -> atomPage(1, Some("https://feeds.example.com/p2")),
    "https://feeds.example.com/p2" -> atomPage(2, Some("https://feeds.example.com/p3")),
    "https://feeds.example.com/p3" -> atomPage(3, None))

  test("follows a 3-page rel=next chain to the end") {
    val pages = FeedOps.paginateFeed("https://feeds.example.com/p1", chain.get)
    assert(pages.map(_.title) == Vector("Page 1", "Page 2", "Page 3"))
    assert(pages(0).next.contains("https://feeds.example.com/p2"))
    assert(pages(2).next.isEmpty)
  }

  test("maxPages bounds the walk (reference default 10)") {
    val pages = FeedOps.paginateFeed("https://feeds.example.com/p1", chain.get, maxPages = 2)
    assert(pages.map(_.title) == Vector("Page 1", "Page 2"))
  }

  test("a rel=next cycle terminates at maxPages instead of looping forever") {
    val cyclic = Map(
      "https://feeds.example.com/a" -> atomPage(1, Some("https://feeds.example.com/b")),
      "https://feeds.example.com/b" -> atomPage(2, Some("https://feeds.example.com/a")))
    val pages = FeedOps.paginateFeed("https://feeds.example.com/a", cyclic.get)
    assert(pages.length == 10) // reference semantics: bounded by maxPages
    assert(pages.map(_.title).take(4) == Vector("Page 1", "Page 2", "Page 1", "Page 2"))
  }

  test("a fetch miss (404 equivalent) ends the walk after yielded pages") {
    val broken = Map(
      "https://feeds.example.com/p1" -> atomPage(1, Some("https://feeds.example.com/gone")))
    val pages = FeedOps.paginateFeed("https://feeds.example.com/p1", broken.get)
    assert(pages.map(_.title) == Vector("Page 1"))
  }
}
