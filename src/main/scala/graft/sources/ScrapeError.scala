package graft.sources

/**
 * Structured scrape failure — `/root/reference/src/core/errors.ts:18-68`.
 * In the Spark jobs failures ride as `status`/`error`/`fetch_error` COLUMNS
 * (rows never throw), but the error model itself is part of the public API
 * surface: codes, retryability, wrapping, serialization.
 */
final class ScrapeError(
    message: String,
    val code: String,
    val statusCode: Option[Int] = None,
    cause: Throwable = null)
    extends RuntimeException(message, cause) {

  /** errors.ts:52-54 — only transport-level failures retry. */
  def isRetryable: Boolean = code == "FETCH_FAILED" || code == "TIMEOUT"

  /** errors.ts:59-67 — plain-map serialization (stack omitted: JVM stacks
    * are not data). */
  def toMap: Map[String, String] = Map(
    "name" -> "ScrapeError",
    "message" -> getMessage,
    "code" -> code) ++ statusCode.map(sc => "statusCode" -> sc.toString)
}

object ScrapeError {

  val Codes: Set[String] = Set(
    "FETCH_FAILED", "TIMEOUT", "INVALID_URL", "BLOCKED", "NOT_FOUND",
    "ROBOTS_BLOCKED", "PARSE_ERROR", "LLM_ERROR", "VALIDATION_ERROR")

  def apply(message: String, code: String, statusCode: Option[Int] = None,
      cause: Throwable = null): ScrapeError = {
    require(Codes.contains(code), s"unknown ScrapeError code: $code")
    new ScrapeError(message, code, statusCode, cause)
  }

  /** errors.ts:37-47 — wrap any failure, preserving existing ScrapeErrors. */
  def from(error: Any, code: String = "FETCH_FAILED"): ScrapeError = error match {
    case se: ScrapeError => se
    case t: Throwable    => new ScrapeError(Option(t.getMessage).getOrElse(t.toString), code, None, t)
    case other           => new ScrapeError(String.valueOf(other), code)
  }
}
