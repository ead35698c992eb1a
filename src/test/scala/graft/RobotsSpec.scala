package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.Robots
import graft.text.Robots.{Group, Rule}

/** [[graft.text.Robots]] against RFC 9309's own examples (§2.2.1 group
  * selection, §2.2.2 precedence, §5.2 example file) plus the de-facto
  * pattern-matching table every major crawler documents for `*`/`$`.
  */
class RobotsSpec extends AnyFunSuite {

  test("parsing: groups, shared agent lines, comments, unknown keys") {
    val g = Robots.parse(
      """# robots for example
        |User-Agent: FooBot
        |Disallow: /a
        |Crawl-delay: 10
        |
        |User-Agent: barbot
        |User-Agent: BazBot   # shared block
        |Allow: /b
        |Disallow:
        |Sitemap: https://example.org/map.xml
        |""".stripMargin)
    assert(g == Vector(
      Group(Vector("foobot"), Vector(Rule(false, "/a"))),
      Group(Vector("barbot", "bazbot"),
        Vector(Rule(true, "/b"), Rule(false, "")))))
  }

  test("group selection: exact match beats *, merge, default allow") {
    val body =
      """User-Agent: *
        |Disallow: /
        |
        |User-Agent: foobot
        |Allow: /
        |
        |User-Agent: FOOBOT
        |Disallow: /private/
        |""".stripMargin
    val groups = Robots.parse(body)
    // exact groups MERGE (both foobot groups), * ignored for foobot
    assert(Robots.rulesFor(groups, "FooBot") ==
      Vector(Rule(true, "/"), Rule(false, "/private/")))
    assert(Robots.rulesFor(groups, "otherbot") == Vector(Rule(false, "/")))
    // no groups at all → allowed
    assert(Robots.urlAllowed("", "anybot", "https://x/a"))
  }

  test("RFC 9309 §5.2 example file") {
    val body =
      """User-Agent: *
        |Disallow: *.gif$
        |Disallow: /example/
        |Allow: /publications/
        |
        |User-Agent: foobot
        |Disallow:/
        |Allow:/example/page.html
        |Allow:/example/allowed.gif
        |
        |User-Agent: barbot
        |User-Agent: bazbot
        |Disallow: /example/page.html
        |""".stripMargin
    def ok(agent: String, path: String) =
      Robots.urlAllowed(body, agent, s"https://example.org$path")
    // the * group
    assert(!ok("quxbot", "/pic.gif") && !ok("quxbot", "/example/x"))
    assert(ok("quxbot", "/publications/x") && ok("quxbot", "/other"))
    // foobot: everything closed except the two carve-outs
    assert(ok("foobot", "/example/page.html") && ok("foobot", "/example/allowed.gif"))
    assert(!ok("foobot", "/example/other.html") && !ok("foobot", "/"))
    // the shared barbot/bazbot block
    assert(!ok("barbot", "/example/page.html") && ok("bazbot", "/example/else"))
  }

  test("pattern matching: prefix, *, trailing $, query target, case") {
    import Robots.matches
    for (t <- Seq("/fish", "/fish.html", "/fishheads", "/fish/salmon.html",
        "/fish.php?id=anything"))
      assert(matches("/fish", t), t)
    for (t <- Seq("/Fish.asp", "/catfish", "/?id=fish"))
      assert(!matches("/fish", t), t)
    for (t <- Seq("/fish/", "/fish/?id=x", "/fish/salmon.htm"))
      assert(matches("/fish/", t), t)
    assert(!matches("/fish/", "/fish.html"))
    for (t <- Seq("/index.php", "/folder/filename.php",
        "/folder/filename.php?parameters", "/folder/any.php.file.html"))
      assert(matches("/*.php", t), t)
    assert(!matches("/*.php", "/") && !matches("/*.php", "/windows.PHP"))
    for (t <- Seq("/filename.php", "/folder/filename.php"))
      assert(matches("/*.php$", t), t)
    for (t <- Seq("/filename.php?parameters", "/filename.php/", "/filename.php5"))
      assert(!matches("/*.php$", t), t)
    assert(matches("/fish*.php", "/fishheads/catfish.php?parameters"))
    // empty pattern matches nothing; bare "$" is a literal-ish degenerate
    assert(!matches("", "/anything"))
    // adjacent wildcards and a * before the anchor
    assert(matches("/a**b", "/axxb") && matches("/a*$", "/abc"))
  }

  test("precedence: longest match wins, tie goes to allow") {
    def verdict(rules: Vector[Rule], t: String) = Robots.allowed(rules, t)
    assert(verdict(Vector(Rule(true, "/p"), Rule(false, "/")), "/page"))
    assert(verdict(Vector(Rule(true, "/folder"), Rule(false, "/folder")), "/folder/page"))
    assert(!verdict(Vector(Rule(true, "/page"), Rule(false, "/*.htm")), "/page.htm"))
    assert(verdict(Vector(Rule(true, "/$"), Rule(false, "/")), "/"))
    assert(!verdict(Vector(Rule(true, "/$"), Rule(false, "/")), "/page.htm"))
    // no matching rule → allowed
    assert(verdict(Vector(Rule(false, "/x")), "/y"))
  }

  test("urlAllowed targets path?query and defaults an empty path to /") {
    val body = "User-agent: *\nDisallow: /*?q=\n"
    assert(!Robots.urlAllowed(body, "bot", "https://h/page?q=2"))
    assert(Robots.urlAllowed(body, "bot", "https://h/page"))
    val rootOnly = "User-agent: *\nDisallow: /$\n"
    assert(!Robots.urlAllowed(rootOnly, "bot", "https://h"))
    assert(Robots.urlAllowed(rootOnly, "bot", "https://h/x"))
  }

  test("sitemap announcements extract group-independently and never leak into rules") {
    val body =
      """Sitemap: https://h/a.xml  # top-level, before any group
        |User-agent: bot
        |Disallow: /x
        |SITEMAP: https://h/b.xml
        |Sitemap:
        |User-agent: *
        |Disallow: /
        |""".stripMargin
    // both directives found (case-insensitive key), empty value dropped,
    // document order kept
    assert(Robots.sitemapsOf(body) ==
      Vector("https://h/a.xml", "https://h/b.xml"))
    // the in-group Sitemap line did not terminate or pollute bot's rules
    assert(!Robots.urlAllowed(body, "bot", "https://h/x"))
    assert(Robots.urlAllowed(body, "bot", "https://h/y"))
  }

  test("case folding is locale-independent: uppercase rules hold under tr-TR") {
    // under a Turkish default locale "DISALLOW".toLowerCase yields dotless
    // 'dısallow' — pre-fix every uppercase Disallow rule silently dropped
    // and the crawler fetched disallowed URLs; host folding diverged too
    val prev = java.util.Locale.getDefault
    java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
    try {
      val body = "USER-AGENT: *\nDISALLOW: /private\n"
      assert(!Robots.urlAllowed(body, "GraftBot", "https://h/private/x"))
      assert(Robots.urlAllowed(body, "GraftBot", "https://h/public"))
      assert(graft.text.UrlResolve.hostOf("https://IStanbul.example/p") ==
        "istanbul.example")
    } finally java.util.Locale.setDefault(prev)
  }
}
