package graft.text

/** robots.txt parsing + rule matching — RFC 9309, the politeness gate a
  * crawl frontier passes through before scheduling fetches. Implemented
  * from the published spec:
  *
  *   - `key: value` lines, `#` comments, case-insensitive keys; adjacent
  *     `User-agent` lines share the following rule block (§2.1); a
  *     `User-agent` line after rules starts a new group.
  *   - Group selection (§2.2.1): case-insensitive exact product-token
  *     match; all matching groups MERGE; absent an exact match the `*`
  *     groups apply; no group at all → everything allowed.
  *   - Path patterns (§2.2.2-2.2.3): `*` matches any run of octets, a
  *     TRAILING `$` anchors at end-of-target (a non-trailing `$` is a
  *     literal — documented subset choice, matching the major-crawler
  *     behavior); the match target is path + `?` + query when a query is
  *     present (patterns against query strings are common politeness
  *     rules). Matching is octet-wise case-sensitive.
  *   - Precedence (§2.2.2): the longest (most-specific) matching pattern
  *     wins; on a length tie the LEAST RESTRICTIVE rule — allow — wins.
  *     An empty rule value matches nothing (the classic `Disallow:`
  *     allow-all form). No matching rule → allowed.
  *
  * Pure string functions: at crawl scale the per-host rule table is tiny
  * and broadcast-joins against the frontier.
  */
object Robots {

  /** One rule, pattern as written (may be empty = matches nothing). */
  final case class Rule(allow: Boolean, pattern: String)

  /** One §2.1 group: the agents above a shared rule block. */
  final case class Group(agents: Vector[String], rules: Vector[Rule])

  def parse(body: String): Vector[Group] = {
    val groups = Vector.newBuilder[Group]
    var agents = Vector.empty[String]
    var rules = Vector.empty[Rule]
    var inRules = false
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents, rules)
      agents = Vector.empty; rules = Vector.empty; inRules = false
    }
    for (raw <- body.linesIterator) {
      val line = raw.indexOf('#') match {
        case -1 => raw.trim
        case i  => raw.substring(0, i).trim
      }
      val ci = line.indexOf(':')
      if (ci > 0) {
        // Locale.ROOT: under a tr-TR default locale "DISALLOW" folds to
        // "dısallow" (dotless ı) and every uppercase rule silently drops —
        // the crawler would fetch disallowed URLs on such a JVM
        val key = line.substring(0, ci).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(ci + 1).trim
        key match {
          case "user-agent" =>
            if (inRules) flush()
            agents :+= value.toLowerCase(java.util.Locale.ROOT)
          case "allow" if agents.nonEmpty =>
            inRules = true; rules :+= Rule(allow = true, value)
          case "disallow" if agents.nonEmpty =>
            inRules = true; rules :+= Rule(allow = false, value)
          case _ => () // sitemap:, crawl-delay:, unknown keys — ignored (§2.2.4)
        }
      }
    }
    flush()
    groups.result()
  }

  /** `Sitemap:` directive values — a group-independent extension every
    * major crawler honors (RFC 9309 §2.2.4 files these under "other
    * records"; the value is an absolute sitemap URL).
    */
  def sitemapsOf(body: String): Vector[String] =
    body.linesIterator.flatMap { raw =>
      val line = raw.indexOf('#') match {
        case -1 => raw.trim
        case i  => raw.substring(0, i).trim
      }
      val ci = line.indexOf(':')
      if (ci > 0 && line.substring(0, ci).trim.equalsIgnoreCase("sitemap"))
        Some(line.substring(ci + 1).trim).filter(_.nonEmpty)
      else None
    }.toVector

  /** The merged rule list governing `agent` (§2.2.1). */
  def rulesFor(groups: Vector[Group], agent: String): Vector[Rule] = {
    val a = agent.toLowerCase(java.util.Locale.ROOT)
    val exact = groups.filter(_.agents.contains(a))
    val chosen = if (exact.nonEmpty) exact else groups.filter(_.agents.contains("*"))
    chosen.flatMap(_.rules)
  }

  /** §2.2.3 pattern match against a path[?query] target. */
  def matches(pattern: String, target: String): Boolean = {
    if (pattern.isEmpty) return false // empty rule value matches nothing
    val anchored = pattern.length > 1 && pattern.endsWith("$")
    val p = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    val segs = p.split("\\*", -1)
    // first segment anchors at the start
    if (!target.startsWith(segs.head)) return false
    var pos = segs.head.length
    var i = 1
    while (i < segs.length) {
      val s = segs(i)
      if (s.isEmpty) { if (i == segs.length - 1) pos = target.length }
      else {
        val at =
          if (i == segs.length - 1 && anchored) {
            val tail = target.length - s.length
            if (tail >= pos && target.regionMatches(tail, s, 0, s.length)) tail else -1
          } else target.indexOf(s, pos)
        if (at < 0) return false
        pos = at + s.length
      }
      i += 1
    }
    !anchored || pos == target.length
  }

  /** §2.2.2 longest-match precedence; tie → allow; no match → allowed. */
  def allowed(rules: Vector[Rule], target: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    for (r <- rules if matches(r.pattern, target)) {
      val len = r.pattern.length
      if (len > bestLen || (len == bestLen && r.allow)) {
        bestLen = len; bestAllow = r.allow
      }
    }
    bestAllow
  }

  /** Convenience: is `url`'s path[?query] fetchable for `agent` under this
    * robots.txt body? The target is extracted with [[UrlResolve.parse]].
    */
  def urlAllowed(body: String, agent: String, url: String): Boolean = {
    val u = UrlResolve.parse(url)
    val target = (if (u.path.isEmpty) "/" else u.path) +
      u.query.fold("")("?" + _)
    allowed(rulesFor(parse(body), agent), target)
  }
}
