package graft.sources

/**
 * S2 — robots.txt parse + match, re-expressing
 * `/root/reference/src/fetchers/robots.ts:26-167` as a PURE function: no
 * fetching (the input table is pre-crawled). At scale the intended shape is a
 * small `(host, robots_txt)` side table broadcast-joined by host, then
 * `pages.filter(Robots.isAllowed(robots_txt, path, userAgent))` — a narrow,
 * codegen-friendly predicate. Fail-open semantics preserved (no rules or
 * parse trouble → allowed).
 */
object Robots {

  final case class Rules(disallow: Vector[String], allow: Vector[String])

  /** robots.ts:62-110 — group selection: specific agent overrides `*`. */
  def parseRobotsTxt(content: String, userAgent: String): Rules = {
    var disallow = Vector.empty[String]
    var allow = Vector.empty[String]
    val botName = userAgent.split("[\\s/]")(0).toLowerCase(java.util.Locale.ROOT)

    var currentAgent = ""
    var isMatchingAgent = false
    var hasFoundSpecificAgent = false

    content.split("\n", -1).foreach { rawLine =>
      val line = rawLine.trim
      if (line.nonEmpty && !line.startsWith("#")) {
        val colonIndex = line.indexOf(':')
        if (colonIndex != -1) {
          val directive = line.substring(0, colonIndex).trim.toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(colonIndex + 1).trim
          if (directive == "user-agent") {
            currentAgent = value.toLowerCase(java.util.Locale.ROOT)
            isMatchingAgent =
              currentAgent == "*" || currentAgent == botName || botName.contains(currentAgent)
            if (currentAgent != "*" && isMatchingAgent) {
              hasFoundSpecificAgent = true
              disallow = Vector.empty
              allow = Vector.empty
            }
          } else if (isMatchingAgent && (!hasFoundSpecificAgent || currentAgent != "*")) {
            if (directive == "disallow" && value.nonEmpty) disallow :+= value
            else if (directive == "allow" && value.nonEmpty) allow :+= value
          }
        }
      }
    }
    Rules(disallow, allow)
  }

  /** robots.ts:115-139 — Allow-before-Disallow precedence, default allowed. */
  def isPathAllowed(rules: Rules, path: String): Boolean = {
    if (rules.disallow.isEmpty && rules.allow.isEmpty) return true
    if (rules.allow.exists(matchesPattern(path, _))) return true
    if (rules.disallow.exists(matchesPattern(path, _))) return false
    true
  }

  /** robots.ts:144-167 — `*` and `$` wildcard handling. */
  def matchesPattern(path: String, pattern: String): Boolean = {
    if (pattern.isEmpty) return false
    if (pattern.endsWith("*")) return path.startsWith(pattern.dropRight(1))
    if (pattern.endsWith("$")) return path == pattern.dropRight(1)
    if (pattern.contains("*")) {
      // same regex construction as robots.ts:161 (only * and ? rewritten —
      // '.' passing through unescaped is a reference quirk kept on
      // purpose), but contained: a malformed pattern ("/foo[*bar") throws
      // in both engines, and the reference's thrown RegExp error reaches
      // its fail-open catch — here the per-rule equivalent is "matches
      // nothing", so neither allow nor disallow fires and the row stays
      // allowed instead of killing the Spark task
      return try {
        val regex = ("^" + pattern.replace("*", ".*").replace("?", "\\?") + ".*").r
        regex.findFirstIn(path).isDefined
      } catch { case _: Exception => false }
    }
    path.startsWith(pattern)
  }

  /** End-to-end check against a robots.txt body for a url path+query —
    * fail-open on a null/empty body (no robots.txt = allowed). */
  def isAllowed(robotsTxt: String, url: String, userAgent: String = "ScrapexBot/1.0"): Boolean = {
    if (robotsTxt == null || robotsTxt.isEmpty) return true
    graft.urlx.WUrl.parse(url) match {
      case None => true
      case Some(u) =>
        val path = u.pathname + u.query.map("?" + _).getOrElse("")
        isPathAllowed(parseRobotsTxt(robotsTxt, userAgent), path)
    }
  }
}
