package graft.urlx

import java.net.IDN
import java.nio.charset.StandardCharsets

/**
 * Minimal WHATWG-URL-compatible parser/serializer covering the behaviors the
 * extraction pipeline depends on (reference semantics: JS `new URL`, used by
 * `/root/reference/src/utils/url.ts`):
 *
 *  - scheme + host lowercasing, IDN punycode (`https://MÜNCHEN.com` →
 *    `https://xn--mnchen-3ya.com/`)
 *  - default-port elision (http:80, https:443, ws:80, wss:443, ftp:21)
 *  - dot-segment resolution on parse and on relative resolution
 *  - empty path of a special-scheme URL serializes as "/"
 *  - protocol-relative (`//host/p`), absolute-path (`/p`), relative (`p`,
 *    `./p`, `../p`), query-only and fragment-only references
 *  - `searchParams` with application/x-www-form-urlencoded parse/serialize
 *    (space ↔ '+'), preserving parameter order
 *
 * Non-special schemes (javascript:, mailto:, file: …) parse as opaque — they
 * are "valid URLs" to `new URL` but are filtered by `UrlOps.isValidUrl`.
 *
 * This is a from-scratch implementation (no external deps; `java.net.URI` has
 * RFC-2396 semantics that diverge from WHATWG on the cases above).
 */
final case class WUrl(
    scheme: String,
    host: String,
    port: Option[Int],
    path: String,
    query: Option[String],
    fragment: Option[String],
    opaque: Option[String] = None
) {

  def isSpecial: Boolean = WUrl.specialSchemes.contains(scheme)

  /** `URL.protocol` — scheme + ':' */
  def protocol: String = scheme + ":"

  /** `URL.hostname` */
  def hostname: String = host

  /** `URL.pathname` — "/" for empty special-scheme path */
  def pathname: String =
    opaque match {
      case Some(o) => o
      case None    => if (path.isEmpty && isSpecial) "/" else path
    }

  /** `URL.host` — hostname[:port] */
  def hostPort: String = host + port.map(p => ":" + p).getOrElse("")

  /** `URL.href` — full serialization */
  def href: String = opaque match {
    case Some(o) =>
      scheme + ":" + o + query.map("?" + _).getOrElse("") + fragment.map("#" + _).getOrElse("")
    case None =>
      val p = if (path.isEmpty) "/" else path
      scheme + "://" + hostPort + p +
        query.map("?" + _).getOrElse("") + fragment.map("#" + _).getOrElse("")
  }

  /** Parsed search params, in order, form-urlencoded-decoded. */
  def searchParams: Vector[(String, String)] = query match {
    case None | Some("") => Vector.empty
    case Some(q) =>
      q.split("&", -1).toVector.filter(_.nonEmpty).map { pair =>
        val i = pair.indexOf('=')
        if (i < 0) (WUrl.formDecode(pair), "")
        else (WUrl.formDecode(pair.substring(0, i)), WUrl.formDecode(pair.substring(i + 1)))
      }
  }

  /** Remove all params with the given names and re-serialize the query the way
    * `URLSearchParams` mutation does (always re-encode, '?' dropped if empty). */
  def deleteParams(names: Set[String]): WUrl = {
    if (opaque.isDefined) return this
    val kept = searchParams.filterNot { case (k, _) => names.contains(k) }
    if (kept.isEmpty) copy(query = None)
    // URLSearchParams always serializes 'k=v' (a valueless 'k' comes back as 'k=')
    else copy(query = Some(kept.map { case (k, v) =>
      WUrl.formEncode(k) + "=" + WUrl.formEncode(v)
    }.mkString("&")))
  }
}

object WUrl {
  val specialSchemes: Map[String, Int] = Map(
    "http" -> 80, "https" -> 443, "ws" -> 80, "wss" -> 443, "ftp" -> 21
  )

  private val schemeRe = "^([A-Za-z][A-Za-z0-9+.\\-]*):(.*)$".r

  /** Parse an absolute URL; None on failure (mirrors `new URL(u)` throwing). */
  def parse(input: String): Option[WUrl] = {
    val s = input.trim
    s match {
      case schemeRe(rawScheme, rest) =>
        val scheme = rawScheme.toLowerCase
        if (specialSchemes.contains(scheme)) parseSpecial(scheme, rest)
        else {
          // opaque: everything up to ? / # is the opaque path
          val (body, frag) = splitFragment(rest)
          val (op, q) = splitQuery(body)
          Some(WUrl(scheme, "", None, "", q, frag, opaque = Some(op)))
        }
      case _ => None
    }
  }

  private def parseSpecial(scheme: String, rest0: String): Option[WUrl] = {
    // WHATWG: special schemes tolerate any number of slashes before authority
    // (manual skip — replaceFirst would compile a Pattern per call)
    val rest = {
      var k = 0
      while (k < rest0.length && (rest0.charAt(k) == '/' || rest0.charAt(k) == '\\')) k += 1
      if (k == 0) rest0 else rest0.substring(k)
    }
    val (beforeFrag, frag) = splitFragment(rest)
    val (beforeQuery, query) = splitQuery(beforeFrag)
    val slash = beforeQuery.indexOf('/')
    val (auth, rawPath) =
      if (slash < 0) (beforeQuery, "") else (beforeQuery.substring(0, slash), beforeQuery.substring(slash))
    // userinfo
    val at = auth.lastIndexOf('@')
    val hostPort = if (at >= 0) auth.substring(at + 1) else auth
    // host[:port]
    val colon = hostPort.lastIndexOf(':')
    val (rawHost, rawPort) =
      if (colon >= 0 && hostPort.indexOf(']') < colon) (hostPort.substring(0, colon), Some(hostPort.substring(colon + 1)))
      else (hostPort, None)
    if (rawHost.isEmpty) return None
    if (rawHost.exists(c => c == ' ' || c == '<' || c == '>' || c == '#' || c == '%' || c == '/')) return None
    val host =
      try {
        val lower = rawHost.toLowerCase
        if (lower.forall(c => c < 128)) lower else IDN.toASCII(lower)
      } catch { case _: Exception => return None }
    if (!host.exists(_.isLetterOrDigit) && !host.startsWith("[")) return None
    val port: Option[Int] = rawPort match {
      case None => None
      case Some("") => None
      case Some(p) =>
        if (!p.forall(_.isDigit)) return None
        val v = try p.toInt catch { case _: Exception => return None }
        if (v > 65535) return None
        if (specialSchemes.get(scheme).contains(v)) None else Some(v)
    }
    val path = pathPercentEncode(removeDotSegments(rawPath))
    Some(WUrl(scheme, host, port, path, query, frag))
  }

  /** WHATWG path percent-encoding: C0 controls, DEL, non-ASCII (as UTF-8
    * bytes), space, `"`, `#`, `<`, `>`, `?`, `` ` ``, `{`, `}` — the set
    * `new URL()` applies to path segments, so resolved hrefs like
    * `/my page.html` or `/wiki/Überläufer` serialize byte-identically to
    * the reference (`%20`, `%C3%9C…`). `%` itself is NOT in the set:
    * already-encoded input passes through untouched (idempotent re-parse).
    * Query/fragment keep raw bytes — their serialization is owned by the
    * URLSearchParams re-serialization in UrlOps (byte-fidelity note in
    * README), which would double-encode if the parser encoded them too. */
  private val pathEncodeExtra: Set[Char] = Set(' ', '"', '#', '<', '>', '?', '`', '{', '}')

  private def pathPercentEncode(s: String): String = {
    var needs = false
    var i = 0
    while (!needs && i < s.length) {
      val c = s.charAt(i)
      if (c < 0x20 || c > 0x7e || pathEncodeExtra(c)) needs = true
      i += 1
    }
    if (!needs) return s
    val hex = "0123456789ABCDEF"
    val sb = new java.lang.StringBuilder(s.length + 8)
    i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp >= 0x20 && cp <= 0x7e && !pathEncodeExtra(cp.toChar)) sb.append(cp.toChar)
      else {
        new String(Character.toChars(cp))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          .foreach(b => sb.append('%').append(hex((b >> 4) & 0xf)).append(hex(b & 0xf)))
      }
      i += Character.charCount(cp)
    }
    sb.toString
  }

  private def splitFragment(s: String): (String, Option[String]) = {
    val i = s.indexOf('#')
    if (i < 0) (s, None) else (s.substring(0, i), Some(s.substring(i + 1)))
  }
  private def splitQuery(s: String): (String, Option[String]) = {
    val i = s.indexOf('?')
    if (i < 0) (s, None) else (s.substring(0, i), Some(s.substring(i + 1)))
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  def removeDotSegments(path: String): String = {
    if (path.isEmpty) return path
    val out = new scala.collection.mutable.ArrayBuffer[String]
    // split keeping leading '/'
    val segs = path.split("/", -1)
    val absolute = path.startsWith("/")
    var trailingSlash = false
    for ((seg, i) <- segs.zipWithIndex) {
      seg match {
        case "" =>
          if (i == segs.length - 1) trailingSlash = true
        case "." =>
          if (i == segs.length - 1) trailingSlash = true
        case ".." =>
          if (out.nonEmpty) out.remove(out.length - 1)
          if (i == segs.length - 1) trailingSlash = true
        case s =>
          out += s
          trailingSlash = false
      }
    }
    val body = out.mkString("/")
    val prefix = if (absolute) "/" else ""
    val suffix = if (trailingSlash && out.nonEmpty) "/" else if (trailingSlash && out.isEmpty) "" else ""
    val r = prefix + body + suffix
    if (absolute && r.isEmpty) "/" else r
  }

  /** `new URL(ref, base)` — resolve a (possibly relative) reference. */
  def resolve(ref: String, base: WUrl): Option[WUrl] = {
    val r = ref.trim
    if (r.isEmpty) return Some(base.copy(fragment = None))
    // absolute? WHATWG "special relative or authority" state: a reference
    // with the SAME special scheme as the base but no authority slashes
    // ("https:section") is parsed RELATIVE to the base — new URL resolves
    // it to base-dir/section, not to host "section"
    r match {
      case schemeRe(rawScheme, rest)
          if rawScheme.toLowerCase == base.scheme && base.isSpecial && !rest.startsWith("/") =>
        return resolve(rest, base)
      case schemeRe(_, _) => return parse(r)
      case _ =>
    }
    if (base.opaque.isDefined) return None
    if (r.startsWith("//")) return parse(base.scheme + ":" + r)
    if (r.startsWith("#")) return Some(base.copy(fragment = Some(r.substring(1))))
    if (r.startsWith("?")) {
      val (q, frag) = splitFragment(r.substring(1))
      return Some(base.copy(query = Some(q), fragment = frag))
    }
    val (beforeFrag, frag) = splitFragment(r)
    val (rawPath, query) = splitQuery(beforeFrag)
    val merged =
      if (rawPath.isEmpty) base.path
      else if (rawPath.startsWith("/")) rawPath
      else {
        val bp = if (base.path.isEmpty) "/" else base.path
        bp.substring(0, bp.lastIndexOf('/') + 1) + rawPath
      }
    val q = if (rawPath.isEmpty && query.isEmpty) base.query else query
    // same WHATWG path encoding as parseSpecial — relative refs must
    // serialize identically to absolute parses of the resolved url
    Some(base.copy(path = pathPercentEncode(removeDotSegments(merged)), query = q, fragment = frag))
  }

  /** application/x-www-form-urlencoded decode ('+' → ' ', %XX → byte). */
  def formDecode(s: String): String = {
    val bytes = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '+') { bytes.write(' '); i += 1 }
      else if (c == '%' && i + 2 < s.length && isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        bytes.write(Integer.parseInt(s.substring(i + 1, i + 3), 16)); i += 3
      } else {
        val cb = c.toString.getBytes(StandardCharsets.UTF_8)
        bytes.write(cb, 0, cb.length); i += 1
      }
    }
    new String(bytes.toByteArray, StandardCharsets.UTF_8)
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** application/x-www-form-urlencoded encode (' ' → '+'). */
  def formEncode(s: String): String = {
    val sb = new StringBuilder
    for (b <- s.getBytes(StandardCharsets.UTF_8)) {
      val c = (b & 0xff).toChar
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
          c == '*' || c == '-' || c == '.' || c == '_') sb.append(c)
      else if (c == ' ') sb.append('+')
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }
}
