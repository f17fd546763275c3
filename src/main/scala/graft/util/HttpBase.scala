package graft.util

import graft.sources.ScrapeError

/**
 * Shared HTTP-provider infrastructure — the deterministic half of the
 * reference's provider layer (`/root/reference/src/common/http-base.ts`):
 * SSRF URL validation, header assembly, error normalization, and the
 * resilience wrapping. The network call itself is behind [[HttpTransport]]
 * (injected; this zero-egress build ships NO socket implementation — tests
 * inject canned responses, a deployment injects its HTTP client of choice).
 */
object HttpBase {

  /** The single side-effecting seam: POST a JSON body, return the response
    * body text. Implementations must be Serializable (ride in closures). */
  trait HttpTransport extends Serializable {
    def post(url: String, headers: Map[String, String], body: String): String
  }

  /** Canned transport for offline use: a pure function of the request —
    * deterministic across executors and runs. */
  final class CannedTransport(f: (String, String) => String) extends HttpTransport {
    var lastUrl: String = _
    var lastHeaders: Map[String, String] = _
    var lastBody: String = _
    def post(url: String, headers: Map[String, String], body: String): String = {
      lastUrl = url; lastHeaders = headers; lastBody = body
      f(url, body)
    }
  }

  // ---- SSRF protection (http-base.ts:84-137, pure — no DNS lookup here;
  // the reference's validateUrlWithDns resolve step is transport-side) ----

  private val PrivateIpPatterns: Seq[scala.util.matching.Regex] = Seq(
    "^10\\.".r,
    "^172\\.(1[6-9]|2\\d|3[01])\\.".r,
    "^192\\.168\\.".r,
    "^127\\.".r,
    "^0\\.".r,
    "^169\\.254\\.".r,
    "^100\\.(6[4-9]|[7-9]\\d|1[01]\\d|12[0-7])\\.".r,
    "^::1$".r,
    "(?i)^(fc|fd)[0-9a-f]{2}:".r,
    "(?i)^fe80:".r,
    "(?i)^fec0:".r,
    "(?i)^::ffff:(10\\.|172\\.(1[6-9]|2\\d|3[01])\\.|192\\.168\\.|127\\.|0\\.)".r,
    "(?i)^localhost$".r
  )

  /** Canonicalize the non-dotted-quad IPv4 host forms WHATWG `new URL`
    * normalizes but java.net.URI passes through raw: pure decimal
    * (2130706433), hex (0x7f000001), octal (0177.0.0.1), and short dotted
    * forms (127.1) all become the dotted quad — WITHOUT this, those
    * loopback spellings bypass every private-range regex and defeat the
    * SSRF block. Pure parsing, no DNS. Non-numeric hosts pass through. */
  private[util] def canonicalizeIpv4(host: String): String = {
    def parsePart(p: String): Option[Long] =
      try {
        if (p.isEmpty) None
        else if ((p.startsWith("0x") || p.startsWith("0X")) && p.length > 2)
          Some(java.lang.Long.parseLong(p.substring(2), 16))
        else if (p.startsWith("0") && p.length > 1 && p.forall(c => c >= '0' && c <= '7'))
          Some(java.lang.Long.parseLong(p, 8))
        else if (p.forall(_.isDigit)) Some(java.lang.Long.parseLong(p))
        else None
      } catch { case _: NumberFormatException => None }
    val parts = host.split("\\.", -1)
    if (parts.length > 4) return host
    val nums = parts.map(parsePart)
    if (nums.exists(_.isEmpty)) return host
    val vs = nums.map(_.get)
    // WHATWG IPv4 parser: last part covers the remaining bytes
    val n = vs.length
    if (vs.init.exists(_ > 255) || vs.last >= (1L << (8 * (5 - n)))) return host
    val ip = vs.init.zipWithIndex.map { case (v, i) => v << (8 * (3 - i)) }.sum + vs.last
    s"${(ip >> 24) & 0xff}.${(ip >> 16) & 0xff}.${(ip >> 8) & 0xff}.${ip & 0xff}"
  }

  def isPrivateHost(hostname: String): Boolean = {
    // java.net.URI.getHost keeps the RFC 2732 brackets on IPv6 literals
    // ("[::1]"); the patterns above are written against the bare address, so
    // strip them or every IPv6 private-range check silently never matches.
    val bare =
      if (hostname.startsWith("[") && hostname.endsWith("]"))
        hostname.substring(1, hostname.length - 1)
      else canonicalizeIpv4(hostname)
    PrivateIpPatterns.exists(_.findFirstIn(bare).isDefined)
  }

  /** Validate a provider URL (http-base.ts:113-137): parseable, HTTPS unless
    * waived, not a private/internal address unless waived. */
  def validateUrl(url: String, requireHttps: Boolean = true, allowPrivate: Boolean = false): java.net.URI = {
    val parsed =
      try {
        val u = new java.net.URI(url)
        if (u.getScheme == null || u.getHost == null) throw new IllegalArgumentException("no scheme/host")
        u
      } catch {
        case _: Exception => throw ScrapeError(s"Invalid URL: $url", "INVALID_URL")
      }
    // schemes are case-insensitive (RFC 3986 §3.1; WHATWG URL lowercases
    // `protocol`, java.net.URI preserves case)
    if (requireHttps && parsed.getScheme.toLowerCase(java.util.Locale.ROOT) != "https")
      throw ScrapeError(s"HTTPS required. Got: ${parsed.getScheme}:", "VALIDATION_ERROR")
    if (!allowPrivate && isPrivateHost(parsed.getHost))
      throw ScrapeError(s"Private/internal addresses not allowed: ${parsed.getHost}", "VALIDATION_ERROR")
    parsed
  }

  /** Base config shared by the embedding and LLM HTTP providers
    * (http-base.ts:60-78 + the resilience knobs). */
  final case class HttpConfig(
      baseUrl: String,
      model: String,
      headers: Map[String, String] = Map.empty,
      requireHttps: Boolean = true,
      allowPrivate: Boolean = false,
      retry: Option[Resilience.RetryConfig] = None,
      errorMapper: Option[String => String] = None)

  /** Construction-time normalization exactly as BaseHttpProvider does:
    * strip one trailing slash, merge the JSON content-type default, validate
    * the URL eagerly (http-base.ts:249-267). */
  def normalize(config: HttpConfig): HttpConfig = {
    val base = config.baseUrl.replaceFirst("/$", "")
    validateUrl(base, config.requireHttps, config.allowPrivate)
    config.copy(
      baseUrl = base,
      headers = Map("Content-Type" -> "application/json") ++ config.headers)
  }

  /** One provider call: validate → (optional retry) → transport.post. */
  def post(
      config: HttpConfig,
      transport: HttpTransport,
      body: String): String = {
    validateUrl(config.baseUrl, config.requireHttps, config.allowPrivate)
    config.retry match {
      case Some(rc) => Resilience.withRetry(rc)(transport.post(config.baseUrl, config.headers, body))._1
      case None     => transport.post(config.baseUrl, config.headers, body)
    }
  }
}
