package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** S1 status/content-type gate — mapping asserted per fetch.ts:38-84. */
class FetchGateSpec extends AnyFunSuite {

  test("status code mapping (fetch.ts:40-53)") {
    assert(FetchGate.errorCode(404, "text/html").contains("NOT_FOUND"))
    assert(FetchGate.errorCode(401, "text/html").contains("BLOCKED"))
    assert(FetchGate.errorCode(403, "text/html").contains("BLOCKED"))
    assert(FetchGate.errorCode(429, "text/html").contains("BLOCKED"))
    assert(FetchGate.errorCode(500, "text/html").contains("FETCH_FAILED"))
    assert(FetchGate.errorCode(301, "text/html").contains("FETCH_FAILED")) // redirects not followed = non-ok
    assert(FetchGate.errorCode(200, "text/html").isEmpty)
    assert(FetchGate.errorCode(204, "text/html; charset=utf-8").isEmpty)
  }

  test("default content-type gate: html/xhtml only, case-sensitive contains (fetch.ts:80-83)") {
    assert(FetchGate.errorCode(200, "application/xhtml+xml").isEmpty)
    assert(FetchGate.errorCode(200, "application/pdf").contains("PARSE_ERROR"))
    assert(FetchGate.errorCode(200, "").contains("PARSE_ERROR"))
    assert(FetchGate.errorCode(200, null).contains("PARSE_ERROR"))
    // the reference's default branch uses case-sensitive String.includes
    assert(FetchGate.errorCode(200, "TEXT/HTML").contains("PARSE_ERROR"))
  }

  test("explicit allowlist compares case-insensitively (fetch.ts:59-66)") {
    assert(FetchGate.errorCode(200, "Application/JSON", Seq("application/json")).isEmpty)
    assert(FetchGate.errorCode(200, "text/xml", Seq("application/json")).contains("PARSE_ERROR"))
    assert(FetchGate.errorCode(200, "application/rss+xml; charset=utf-8", Seq("xml")).isEmpty)
  }
}
