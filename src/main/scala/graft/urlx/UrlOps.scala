package graft.urlx

/**
 * URL operations re-expressing the reference's URL layer
 * (`/root/reference/src/utils/url.ts:28-132`) with JS `new URL` (WHATWG)
 * semantics via [[WUrl]]. Pure functions — safe to call per row inside
 * `mapPartitions` and to register as Spark UDFs for the SQL surface.
 */
object UrlOps {

  /** Tracking params stripped by normalizeUrl (url.ts:4-23). */
  val TrackingParams: Set[String] = Set(
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "utm_id", "ref", "fbclid", "gclid", "gclsrc", "dclid", "msclkid",
    "mc_cid", "mc_eid", "_ga", "_gl", "source", "referrer"
  )

  /** url.ts:28 — parseable URL with http/https scheme. */
  def isValidUrl(url: String): Boolean =
    url != null && WUrl.parse(url).exists(u => u.scheme == "http" || u.scheme == "https")

  /** url.ts:40 — strip tracking params + trailing slash (except root);
    * returns input unchanged on parse failure. */
  def normalizeUrl(url: String): String =
    WUrl.parse(url) match {
      case None => url
      case Some(u) =>
        val cleaned = u.deleteParams(TrackingParams)
        var s = cleaned.href
        if (s.endsWith("/") && cleaned.pathname != "/") s = s.substring(0, s.length - 1)
        s
    }

  /** url.ts:64 — hostname minus leading `www.`; "" on failure. */
  def extractDomain(url: String): String =
    WUrl.parse(url) match {
      case Some(u) if u.opaque.isEmpty => u.hostname.replaceFirst("^www\\.", "")
      case _ => ""
    }

  /** url.ts:76 — resolve vs base; None for null/empty input; raw input on failure.
    * NB WHATWG `new URL(url, base)` throws on an unparseable base even when
    * `url` is absolute, so base-parse failure yields the raw input. */
  def resolveUrl(url: String, baseUrl: String): Option[String] = {
    if (url == null || url.isEmpty) return None
    WUrl.parse(baseUrl) match {
      case None => Some(url)
      case Some(base) => WUrl.resolve(url, base).map(_.href).orElse(Some(url))
    }
  }

  /** url.ts:89 — domain(url) != baseDomain; false on parse failure. An
    * opaque url (mailto:, javascript:) parses fine in `new URL` with
    * hostname "" — "" != baseDomain ⇒ external, NOT parse-failure false. */
  def isExternalUrl(url: String, baseDomain: String): Boolean =
    WUrl.parse(url) match {
      case Some(u) => u.hostname.replaceFirst("^www\\.", "") != baseDomain
      case _ => false
    }

  /** url.ts:102 — "https:" style protocol; "" on failure. */
  def getProtocol(url: String): String =
    WUrl.parse(url).map(_.protocol).getOrElse("")

  /** url.ts:111 — pathname; "" on failure. `new URL("mailto:a@b").pathname`
    * is the opaque body, which `WUrl.pathname` already returns. */
  def getPath(url: String): String =
    WUrl.parse(url).map(_.pathname).getOrElse("")

  /** url.ts:124 — prefix match, or '*' wildcard → `^escaped.*` regex. */
  def matchesUrlPattern(url: String, pattern: String): Boolean = {
    if (!pattern.contains("*")) url == pattern || url.startsWith(pattern)
    else {
      val escaped = pattern.replaceAll("[.+?^${}()|\\[\\]\\\\]", "\\\\$0").replace("*", ".*")
      java.util.regex.Pattern.compile("^" + escaped).matcher(url).find()
    }
  }
}
