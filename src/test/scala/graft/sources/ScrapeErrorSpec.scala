package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Ported from `/root/reference/test/core/errors.test.ts`. */
class ScrapeErrorSpec extends AnyFunSuite {

  test("creates error with message and code (errors.test.ts:6-12)") {
    val e = ScrapeError("Failed to fetch", "FETCH_FAILED")
    assert(e.getMessage == "Failed to fetch")
    assert(e.code == "FETCH_FAILED")
    assert(e.statusCode.isEmpty)
  }

  test("creates error with status code (errors.test.ts:14-17)") {
    val e = ScrapeError("Not found", "NOT_FOUND", Some(404))
    assert(e.statusCode.contains(404))
  }

  test("creates error with cause (errors.test.ts:19-23)") {
    val cause = new RuntimeException("underlying")
    val e = ScrapeError("wrapped", "FETCH_FAILED", None, cause)
    assert(e.getCause eq cause)
  }

  test("from returns same error if already ScrapeError (errors.test.ts:33-37)") {
    val orig = ScrapeError("x", "BLOCKED")
    assert(ScrapeError.from(orig) eq orig)
  }

  test("from wraps standard errors, strings and unknowns (errors.test.ts:39-58)") {
    val wrapped = ScrapeError.from(new IllegalStateException("boom"))
    assert(wrapped.getMessage == "boom")
    assert(wrapped.code == "FETCH_FAILED")
    assert(wrapped.getCause.isInstanceOf[IllegalStateException])

    val fromString = ScrapeError.from("plain failure", "PARSE_ERROR")
    assert(fromString.getMessage == "plain failure")
    assert(fromString.code == "PARSE_ERROR")

    assert(ScrapeError.from(42).getMessage == "42")
  }

  test("isRetryable: true for FETCH_FAILED and TIMEOUT only (errors.test.ts:61-80)") {
    assert(ScrapeError("x", "FETCH_FAILED").isRetryable)
    assert(ScrapeError("x", "TIMEOUT").isRetryable)
    Seq("INVALID_URL", "BLOCKED", "NOT_FOUND", "ROBOTS_BLOCKED", "PARSE_ERROR",
      "LLM_ERROR", "VALIDATION_ERROR").foreach { c =>
      assert(!ScrapeError("x", c).isRetryable, c)
    }
  }

  test("serializes to a plain map (errors.test.ts:83-99)") {
    val e = ScrapeError("Blocked by server", "BLOCKED", Some(403))
    assert(e.toMap == Map(
      "name" -> "ScrapeError", "message" -> "Blocked by server",
      "code" -> "BLOCKED", "statusCode" -> "403"))
    assert(!ScrapeError("x", "TIMEOUT").toMap.contains("statusCode"))
  }

  test("unknown codes are rejected at construction") {
    intercept[IllegalArgumentException](ScrapeError("x", "NOT_A_CODE"))
  }

  test("FetchGate codes are all valid ScrapeError codes (fetch.ts:38-84)") {
    Seq(404 -> "NOT_FOUND", 403 -> "BLOCKED", 429 -> "BLOCKED", 500 -> "FETCH_FAILED")
      .foreach { case (status, code) =>
        assert(FetchGate.errorCode(status, "text/html").contains(code))
        assert(ScrapeError.Codes.contains(code))
      }
    assert(FetchGate.errorCode(200, "application/pdf").contains("PARSE_ERROR"))
  }
}
