package graft.sources

/**
 * S1 — the fetch-result gate of `/root/reference/src/fetchers/fetch.ts:38-84`
 * re-expressed for a pre-crawled table: the reference throws a `ScrapeError`
 * with a code per HTTP status / content type; here the same mapping becomes a
 * pure column function so crawled rows can be routed to a `fetch_error`
 * column (rows survive; Spark jobs must be total — SURVEY.md P8/D1).
 *
 *   404            → NOT_FOUND       (fetch.ts:40-42)
 *   401 / 403      → BLOCKED         (fetch.ts:43-45)
 *   429            → BLOCKED         (fetch.ts:46-48)
 *   other non-2xx  → FETCH_FAILED    (fetch.ts:49-53)
 *   2xx + bad type → PARSE_ERROR     (fetch.ts:59-83; default allowlist is
 *                    text/html + application/xhtml, case-sensitive `includes`
 *                    like the reference's default branch; an explicit
 *                    allowlist compares case-insensitively, fetch.ts:60-62)
 *   2xx + ok type  → None
 */
object FetchGate {

  /** `response.ok` — WHATWG fetch: status in [200, 299]. */
  def isOk(statusCode: Int): Boolean = statusCode >= 200 && statusCode <= 299

  def errorCode(statusCode: Int, contentType: String): Option[String] =
    errorCode(statusCode, contentType, allowedContentTypes = Nil)

  def errorCode(statusCode: Int, contentType: String, allowedContentTypes: Seq[String]): Option[String] = {
    if (!isOk(statusCode)) {
      if (statusCode == 404) Some("NOT_FOUND")
      else if (statusCode == 401 || statusCode == 403 || statusCode == 429) Some("BLOCKED")
      else Some("FETCH_FAILED")
    } else {
      val ct = if (contentType == null) "" else contentType
      val allowed =
        if (allowedContentTypes.nonEmpty) {
          val lower = ct.toLowerCase(java.util.Locale.ROOT)
          allowedContentTypes.exists(t => lower.contains(t.toLowerCase(java.util.Locale.ROOT)))
        } else ct.contains("text/html") || ct.contains("application/xhtml")
      if (allowed) None else Some("PARSE_ERROR")
    }
  }
}
