package graft.text

/** RFC 3986 reference resolution + crawl-frontier normalization — the step
  * between [[PageMeta]]'s raw hrefs and a crawl frontier: every outlink is
  * relative to the page that carried it, and a frontier dedups on the
  * RESOLVED, NORMALIZED form. Implemented from the published spec (RFC
  * 3986 §5.2, the algorithm the reference's crawl tooling relies on via
  * its HTTP stack):
  *
  *   - [[parse]]: the §B regex split into (scheme, authority, path,
  *     query, fragment), each optional.
  *   - [[resolve]]: the §5.2.2 transform — STRICT form: a reference with
  *     its own scheme is absolute even when the scheme equals the base's
  *     (so `http:g` resolves to `http:g`, not merged; Python's urljoin
  *     applies the §5.2.2 backward-compat option there — the one
  *     documented divergence from the fixture twin, which therefore never
  *     plants same-scheme-relative refs).
  *   - §5.2.3 merge and §5.2.4 remove_dot_segments verbatim.
  *   - [[normalizeHttp]]: the frontier canonical form for http(s) URLs —
  *     lowercase scheme + host (§6.2.2.1), drop the default port (80/443,
  *     §6.2.3), empty path → "/", strip the fragment (a fragment never
  *     reaches the server); returns None for any other scheme (mailto:,
  *     javascript:, data: — not crawlable).
  *
  * Pure string functions — the distributed form is a projection, so the
  * frontier build stays shuffle-free until its terminal dedup.
  */
object UrlResolve {

  /** One parsed URI reference; None = component ABSENT (distinct from
    * empty, which RFC 3986 preserves — `?` keeps an empty query).
    */
  final case class Uri(
      scheme: Option[String],
      authority: Option[String],
      path: String,
      query: Option[String],
      fragment: Option[String]) {

    /** §5.3 component recomposition. */
    def recompose: String = {
      val sb = new java.lang.StringBuilder
      scheme.foreach(s => sb.append(s).append(':'))
      authority.foreach(a => sb.append("//").append(a))
      sb.append(path)
      query.foreach(q => sb.append('?').append(q))
      fragment.foreach(f => sb.append('#').append(f))
      sb.toString
    }
  }

  // RFC 3986 appendix B: ^(([^:/?#]+):)?(//([^/?#]*))?([^?#]*)(\?([^#]*))?(#(.*))?
  private val UriRe =
    """^(([^:/?#]+):)?(//([^/?#]*))?([^?#]*)(\?([^#]*))?(#(.*))?""".r

  def parse(s: String): Uri = {
    val m = UriRe.findFirstMatchIn(s).get // the regex matches every string
    Uri(
      scheme = Option(m.group(2)),
      authority = Option(m.group(4)),
      path = Option(m.group(5)).getOrElse(""),
      query = Option(m.group(7)),
      fragment = Option(m.group(9)))
  }

  /** §5.2.4 remove_dot_segments. */
  private[text] def removeDotSegments(path: String): String = {
    val out = new java.lang.StringBuilder
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = in.substring(2)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../") || in == "/..") {
        in = if (in == "/..") "/" else in.substring(3)
        val i = out.lastIndexOf("/")
        out.setLength(if (i < 0) 0 else i)
      } else if (in == "." || in == "..") in = ""
      else {
        // move the first segment (through the NEXT "/", not any leading one)
        val from = if (in.startsWith("/")) 1 else 0
        val i = in.indexOf('/', from)
        val cut = if (i < 0) in.length else i
        out.append(in, 0, cut)
        in = in.substring(cut)
      }
    }
    out.toString
  }

  /** §5.2.3 merge. */
  private def merge(base: Uri, refPath: String): String =
    if (base.authority.isDefined && base.path.isEmpty) "/" + refPath
    else {
      val i = base.path.lastIndexOf('/')
      if (i < 0) refPath else base.path.substring(0, i + 1) + refPath
    }

  /** §5.2.2 transform references (strict). */
  def resolve(base: Uri, ref: Uri): Uri =
    if (ref.scheme.isDefined)
      ref.copy(path = removeDotSegments(ref.path))
    else if (ref.authority.isDefined)
      ref.copy(scheme = base.scheme, path = removeDotSegments(ref.path))
    else if (ref.path.isEmpty)
      Uri(base.scheme, base.authority, base.path,
        if (ref.query.isDefined) ref.query else base.query, ref.fragment)
    else {
      val p =
        if (ref.path.startsWith("/")) removeDotSegments(ref.path)
        else removeDotSegments(merge(base, ref.path))
      Uri(base.scheme, base.authority, p, ref.query, ref.fragment)
    }

  def resolve(base: String, ref: String): String =
    resolve(parse(base), parse(ref)).recompose

  /** authority = [userinfo@]host[:port] split, IPv6-aware (a ':' before the
    * closing ']' of an address literal is not a port separator). Userinfo
    * keeps its trailing '@'; port comes back WITHOUT the ':'. The ONE
    * definition for normalizeHttp / surt / hostOf — an edge-case fix here
    * cannot diverge the three.
    */
  private def splitAuthority(auth: String): (String, String, String) = {
    val at = auth.lastIndexOf('@')
    val (userinfo, hostport) =
      if (at < 0) ("", auth) else (auth.substring(0, at + 1), auth.substring(at + 1))
    val ci = hostport.lastIndexOf(':')
    if (ci < 0 || hostport.lastIndexOf(']') > ci) (userinfo, hostport, "")
    else (userinfo, hostport.substring(0, ci), hostport.substring(ci + 1))
  }

  /** Frontier canonical form; None = not a crawlable http(s) URL. */
  def normalizeHttp(url: String): Option[String] = {
    val u = parse(url)
    u.scheme.map(_.toLowerCase(java.util.Locale.ROOT)) match {
      case Some(sch @ ("http" | "https")) =>
        u.authority.map { auth =>
          // host case-folds, the default port drops, userinfo is kept as-is
          val (userinfo, host, port) = splitAuthority(auth)
          val defPort = if (sch == "http") "80" else "443"
          val keepPort = port.nonEmpty && port != defPort
          Uri(
            scheme = Some(sch),
            authority = Some(
              userinfo + host.toLowerCase(java.util.Locale.ROOT) + (if (keepPort) ":" + port else "")),
            path = if (u.path.isEmpty) "/" else u.path,
            query = u.query,
            fragment = None).recompose
        }
      case _ => None
    }
  }

  /** The canonical ORIGIN (scheme://host[:non-default-port]) of an http(s)
    * URL — the scope a robots.txt governs (RFC 9309 §2.3); None for
    * non-http(s).
    */
  def originOf(url: String): Option[String] =
    normalizeHttp(url).map { n =>
      n.substring(0, n.indexOf('/', n.indexOf("//") + 2))
    }

  /** Sort-friendly URI Reordering Transform (SURT) — the Common-Crawl /
    * OpenWayback CDX index key: the host's labels reverse, so all captures
    * of a site (and its subdomains) sort ADJACENT and a range scan over the
    * sorted index answers per-site lookups without a full pass. Subset
    * implemented (the full canonicalizer also sorts query params and strips
    * session ids — documented out of scope): canonical http(s) form first
    * ([[normalizeHttp]]: lowercase host, default port dropped, fragment
    * stripped), then the scheme and userinfo drop, host labels reverse
    * comma-joined with any explicit port kept after the last label, and
    * `)` introduces the path?query verbatim —
    * `https://sub.example.org:8080/p?q=1` → `org,example,sub:8080)/p?q=1`.
    * None for non-http(s) references (not indexable captures).
    */
  def surt(url: String): Option[String] = normalizeHttp(url).map { n =>
    val u = parse(n)
    val (_, host, port) = splitAuthority(u.authority.getOrElse(""))
    host.split('.').reverse.mkString(",") +
      (if (port.nonEmpty) ":" + port else "") + ")" +
      u.path + u.query.fold("")("?" + _)
  }

  /** The lowercased host of a normalized http(s) URL ("" when absent). */
  def hostOf(url: String): String = {
    val u = parse(url)
    u.authority.fold("") { auth =>
      val (_, host, _) = splitAuthority(auth)
      host.toLowerCase(java.util.Locale.ROOT)
    }
  }
}
