package graft.urlx

import org.scalatest.funsuite.AnyFunSuite

/** Ported from the reference's `test/utils/url.test.ts` and
  * `test/e2e/url-utilities.test.ts` — same inputs, same expected values. */
class UrlOpsSpec extends AnyFunSuite {
  import UrlOps._

  test("isValidUrl: valid http/https") {
    assert(isValidUrl("http://example.com"))
    assert(isValidUrl("http://example.com/path"))
    assert(isValidUrl("http://example.com:8080"))
    assert(isValidUrl("https://example.com"))
    assert(isValidUrl("https://example.com/path?query=1"))
    assert(isValidUrl("http://localhost:3000"))
  }

  test("isValidUrl: invalid") {
    assert(!isValidUrl(""))
    assert(!isValidUrl("not-a-url"))
    assert(!isValidUrl("ftp://example.com"))
    assert(!isValidUrl("file:///path/to/file"))
    assert(!isValidUrl("javascript:alert(1)"))
  }

  test("normalizeUrl: trailing slashes") {
    assert(normalizeUrl("https://example.com/path/") == "https://example.com/path")
    assert(normalizeUrl("https://example.com/") == "https://example.com/")
  }

  test("normalizeUrl: utm params") {
    val n = normalizeUrl("https://example.com/page?utm_source=test&utm_medium=email&name=value")
    assert(n == "https://example.com/page?name=value")
  }

  test("normalizeUrl: common tracking params") {
    val n = normalizeUrl("https://example.com?fbclid=abc&gclid=def&ref=test")
    assert(!n.contains("fbclid"))
    assert(!n.contains("gclid"))
    assert(!n.contains("ref="))
  }

  test("normalizeUrl: invalid input unchanged") {
    assert(normalizeUrl("not-a-url") == "not-a-url")
  }

  test("normalizeUrl: docs examples (lowercase, default port, param order)") {
    assert(normalizeUrl("HTTPS://Example.COM/") == "https://example.com/")
    assert(normalizeUrl("https://example.com:443/page") == "https://example.com/page")
    assert(normalizeUrl("https://example.com?b=2&a=1&utm_source=site") == "https://example.com/?b=2&a=1")
    assert(normalizeUrl("https://example.com?fbclid=123&gclid=456&utm_medium=email") == "https://example.com/")
    assert(normalizeUrl("https://MÜNCHEN.com") == "https://xn--mnchen-3ya.com/")
    assert(normalizeUrl("https://example.com/page#section") == "https://example.com/page#section")
  }

  test("extractDomain") {
    assert(extractDomain("https://www.example.com") == "example.com")
    assert(extractDomain("https://example.com") == "example.com")
    assert(extractDomain("https://blog.example.com") == "blog.example.com")
    assert(extractDomain("https://www.blog.example.com") == "blog.example.com")
    assert(extractDomain("not-a-url") == "")
    assert(extractDomain("https://www.example.com/page") == "example.com")
    assert(extractDomain("https://example.com:8080/api") == "example.com")
    assert(extractDomain("invalid") == "")
  }

  test("resolveUrl: relative forms") {
    val base = "https://example.com/path/page.html"
    assert(resolveUrl("/absolute", base).contains("https://example.com/absolute"))
    assert(resolveUrl("./relative", base).contains("https://example.com/path/relative"))
    assert(resolveUrl("../up", base).contains("https://example.com/up"))
    assert(resolveUrl("https://other.com/page", base).contains("https://other.com/page"))
    assert(resolveUrl(null, base).isEmpty)
    assert(resolveUrl("", base).isEmpty)
    assert(resolveUrl("../other", "https://example.com/page/").contains("https://example.com/other"))
    assert(resolveUrl("/about", "https://example.com/blog/post").contains("https://example.com/about"))
    assert(resolveUrl("https://other.com", "https://example.com").contains("https://other.com/"))
  }

  test("resolveUrl: protocol-relative") {
    val base = "https://example.com/path/page.html"
    assert(resolveUrl("//cdn.example.com/script.js", "https://example.com").contains("https://cdn.example.com/script.js"))
    assert(resolveUrl("//cdn.example.com/script.js", "http://example.com").contains("http://cdn.example.com/script.js"))
    assert(resolveUrl("//other.com/path/to/resource", base).contains("https://other.com/path/to/resource"))
    assert(resolveUrl("//cdn.example.com/script.js?v=1.0", base).contains("https://cdn.example.com/script.js?v=1.0"))
    assert(resolveUrl("//cdn.example.com/api?foo=bar&baz=qux", base).contains("https://cdn.example.com/api?foo=bar&baz=qux"))
    assert(resolveUrl("//cdn.example.com/page#section", base).contains("https://cdn.example.com/page#section"))
    assert(resolveUrl("//cdn.example.com/docs#api-reference", base).contains("https://cdn.example.com/docs#api-reference"))
    assert(resolveUrl("//cdn.example.com:8080/resource", base).contains("https://cdn.example.com:8080/resource"))
    assert(resolveUrl("//localhost:3000/api", base).contains("https://localhost:3000/api"))
    assert(resolveUrl("//cdn.example.com:8080/path?v=1#section", base).contains("https://cdn.example.com:8080/path?v=1#section"))
  }

  test("isExternalUrl") {
    assert(isExternalUrl("https://other.com", "example.com"))
    assert(isExternalUrl("https://sub.other.com", "example.com"))
    assert(!isExternalUrl("https://example.com/page", "example.com"))
    assert(!isExternalUrl("https://www.example.com/page", "example.com"))
    assert(!isExternalUrl("not-a-url", "example.com"))
    assert(!isExternalUrl("/page", "example.com"))
  }

  test("getProtocol / getPath") {
    assert(getProtocol("https://example.com") == "https:")
    assert(getProtocol("http://example.com") == "http:")
    assert(getProtocol("not-a-url") == "")
    assert(getPath("https://example.com/path/to/page") == "/path/to/page")
    assert(getPath("https://example.com") == "/")
    assert(getPath("not-a-url") == "")
    assert(getPath("https://example.com/docs/intro?ref=nav") == "/docs/intro")
  }

  test("matchesUrlPattern") {
    assert(matchesUrlPattern("https://example.com/path", "https://example.com/path"))
    assert(matchesUrlPattern("https://example.com/path/sub", "https://example.com/path"))
    assert(matchesUrlPattern("https://example.com/blog/post-1", "https://example.com/blog/*"))
    assert(matchesUrlPattern("https://example.com/any/path", "https://example.com/*/path"))
    assert(matchesUrlPattern("https://sub.example.com/page", "https://*.example.com/*"))
    assert(!matchesUrlPattern("https://other.com", "https://example.com/*"))
    assert(matchesUrlPattern("https://example.com/docs/a", "https://example.com/docs/*"))
    assert(!matchesUrlPattern("https://example.com/blog", "https://example.com/docs/*"))
  }

  test("WHATWG path percent-encoding: spaces and non-ASCII encode, %XX stays (round 4)") {
    // `new URL("https://e.com/my page.html").href` → %20; UTF-8 bytes for
    // non-ASCII; existing escapes pass through untouched (idempotent)
    assert(graft.urlx.WUrl.parse("https://e.com/my page.html").map(_.href)
      .contains("https://e.com/my%20page.html"))
    assert(graft.urlx.WUrl.parse("https://e.com/wiki/Überläufer").map(_.href)
      .contains("https://e.com/wiki/%C3%9Cberl%C3%A4ufer"))
    assert(graft.urlx.WUrl.parse("https://e.com/a%20b/c").map(_.href)
      .contains("https://e.com/a%20b/c"))
    // relative resolution encodes identically to an absolute parse
    assert(resolveUrl("/my page.html", "https://e.com/x")
      .contains("https://e.com/my%20page.html"))
    assert(resolveUrl("/wiki/Überläufer", "https://e.com/x")
      .contains("https://e.com/wiki/%C3%9Cberl%C3%A4ufer"))
  }

  test("same-special-scheme reference without // resolves RELATIVE (WHATWG, round 4)") {
    // new URL("https:section", "https://example.com/a/b") → .../a/section,
    // NOT a fabricated host "section"
    assert(resolveUrl("https:section", "https://example.com/a/b")
      .contains("https://example.com/a/section"))
    // different scheme stays absolute
    assert(resolveUrl("http://other.com/x", "https://example.com/a/b")
      .contains("http://other.com/x"))
  }

  test("opaque urls: pathname is the opaque body; mailto is external (url.ts:89,111)") {
    assert(getPath("mailto:user@example.com") == "user@example.com")
    assert(isExternalUrl("mailto:a@b.com", "example.com"))
  }
}
