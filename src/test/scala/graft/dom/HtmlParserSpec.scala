package graft.dom

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

class HtmlParserSpec extends AnyFunSuite {

  def fixture(name: String): String = {
    val in = getClass.getResourceAsStream(s"/scrapex-fixtures/$name")
    require(in != null, s"missing fixture $name")
    val s = Source.fromInputStream(in, "UTF-8").mkString
    in.close(); s
  }

  test("basic structure: implied head/body routing") {
    val doc = HtmlParser.parse("<title>T</title><meta name=\"a\" content=\"b\"><p>Hello</p>")
    assert(doc.selectFirst("title").map(_.text()).contains("T"))
    assert(doc.head.childElements.exists(_.tag == "title"))
    assert(doc.body.childElements.exists(_.tag == "p"))
    assert(doc.selectFirst("p").map(_.text()).contains("Hello"))
  }

  test("attributes: quoted, unquoted, valueless, case folding, first-wins") {
    val doc = HtmlParser.parse("""<div ID=main data-x=1 hidden Class="a b" class="zzz"><span></span></div>""")
    val div = doc.selectFirst("div").get
    assert(div.attr("id").contains("main"))
    assert(div.attr("data-x").contains("1"))
    assert(div.attr("hidden").contains(""))
    assert(div.classList.toSeq == Seq("a", "b"))
  }

  test("entities decode in text and attrs") {
    val doc = HtmlParser.parse("""<p title="Tom &amp; Jerry">a &lt; b &gt; c &amp; d &#65; &#x42; &copy;</p>""")
    val p = doc.selectFirst("p").get
    assert(p.text() == "a < b > c & d A B ©")
    assert(p.attr("title").contains("Tom & Jerry"))
  }

  test("raw text: script content not parsed, style kept") {
    val doc = HtmlParser.parse("""<script>if (a < b) { document.write("<p>x</p>"); }</script><p>real</p>""")
    assert(doc.select("p").length == 1)
    val script = doc.selectFirst("script").get
    assert(script.text().contains("document.write"))
  }

  test("implied end tags: p closed by p and by div; li by li") {
    val doc = HtmlParser.parse("<p>one<p>two<div>three</div><ul><li>a<li>b</ul>")
    val ps = doc.select("p")
    assert(ps.map(_.text()) == Vector("one", "two"))
    val lis = doc.select("li")
    assert(lis.map(_.text()) == Vector("a", "b"))
    assert(lis.forall(_.parent.tag == "ul"))
  }

  test("void elements do not nest") {
    val doc = HtmlParser.parse("<p>a<br>b<img src=\"x.png\">c</p>")
    val p = doc.selectFirst("p").get
    assert(p.text() == "abc")
    assert(doc.selectFirst("img").get.parent.tag == "p")
  }

  test("comments preserved, doctype skipped") {
    val doc = HtmlParser.parse("<!DOCTYPE html><!-- hello --><p>x</p>")
    assert(doc.selectFirst("p").isDefined)
    assert(doc.outerHtml.contains("<!-- hello -->"))
  }

  test("selector engine: compound forms") {
    val doc = HtmlParser.parse(
      """<meta name="og:x" content="1"><link rel="icon" sizes="32x32" href="/i.png">
        |<div class="nav-bar main">n</div><article role="main">A<a href="#f">f</a></article>
        |<button>Add to cart</button>""".stripMargin)
    assert(doc.selectFirst("""meta[name="og:x"]""").flatMap(_.attr("content")).contains("1"))
    assert(doc.selectFirst("""link[rel="icon"][sizes="32x32"]""").isDefined)
    assert(doc.selectFirst("""[class*="nav"]""").map(_.text()).contains("n"))
    assert(doc.selectFirst("""[role="main"]""").map(_.tag).contains("article"))
    assert(doc.selectFirst("""button:contains("Add")""").isDefined)
    assert(doc.selectFirst("""a[href]""").isDefined)
    assert(doc.select("div, button").length == 2)
  }

  test("closest and ancestors") {
    val doc = HtmlParser.parse("""<nav><div><a href="/x">lnk</a></div></nav><main><a href="/y">ok</a></main>""")
    val links = doc.select("a[href]")
    val skip = Selector("nav, header, footer")
    assert(skip.closest(links(0)).isDefined)
    assert(skip.closest(links(1)).isEmpty)
    assert(links(0).ancestors.map(_.tag) == List("div", "nav", "body", "html"))
  }

  test("serialization round trip") {
    val doc = HtmlParser.parse("""<div class="a"><p>x &amp; y</p><img src="i.png"></div>""")
    val html = doc.body.innerHtml
    assert(html == """<div class="a"><p>x &amp; y</p><img src="i.png"></div>""")
  }

  test("title is RCDATA") {
    val doc = HtmlParser.parse("<title>a &lt; b <not-a-tag></title><p>x</p>")
    assert(doc.selectFirst("title").map(_.text()).contains("a < b <not-a-tag>"))
  }

  test("fixtures parse: messy-blog-post structure") {
    val doc = HtmlParser.parse(fixture("messy-blog-post.html"))
    assert(doc.selectFirst("title").isDefined)
    assert(doc.select("""meta[property="og:title"]""").nonEmpty)
    assert(doc.select("article").nonEmpty || doc.select("main").nonEmpty || doc.select("div").nonEmpty)
  }

  test("fixtures parse: article-real-world metadata present") {
    val doc = HtmlParser.parse(fixture("article-real-world.html"))
    assert(doc.select("""script[type="application/ld+json"]""").nonEmpty)
    assert(doc.selectFirst("""link[rel="canonical"]""").isDefined)
  }

  test("deep clone independence") {
    val doc = HtmlParser.parse("<div><p>x</p></div>")
    val clone = doc.deepClone()
    clone.selectFirst("p").get.remove()
    assert(doc.select("p").nonEmpty)
    assert(clone.select("p").isEmpty)
  }

  test("tables: tr/td implied closes") {
    val doc = HtmlParser.parse("<table><tr><td>a<td>b<tr><td>c</table>")
    assert(doc.select("tr").length == 2)
    assert(doc.select("td").map(_.text()) == Vector("a", "b", "c"))
  }
}
