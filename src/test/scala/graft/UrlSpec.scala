package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.UrlResolve

/** [[graft.text.UrlResolve]] against RFC 3986's OWN published test
  * vectors (§5.4.1 normal + §5.4.2 abnormal, base `http://a/b/c/d;p?q`)
  * plus the frontier normalization rules. The crawl-fixture differential
  * (q_warc_frontier vs urllib.parse.urljoin) lives in WarcSpec.
  */
class UrlSpec extends AnyFunSuite {

  private val base = "http://a/b/c/d;p?q"

  private val normal = Seq(
    "g:h" -> "g:h",
    "g" -> "http://a/b/c/g",
    "./g" -> "http://a/b/c/g",
    "g/" -> "http://a/b/c/g/",
    "/g" -> "http://a/g",
    "//g" -> "http://g",
    "?y" -> "http://a/b/c/d;p?y",
    "g?y" -> "http://a/b/c/g?y",
    "#s" -> "http://a/b/c/d;p?q#s",
    "g#s" -> "http://a/b/c/g#s",
    "g?y#s" -> "http://a/b/c/g?y#s",
    ";x" -> "http://a/b/c/;x",
    "g;x" -> "http://a/b/c/g;x",
    "g;x?y#s" -> "http://a/b/c/g;x?y#s",
    "" -> "http://a/b/c/d;p?q",
    "." -> "http://a/b/c/",
    "./" -> "http://a/b/c/",
    ".." -> "http://a/b/",
    "../" -> "http://a/b/",
    "../g" -> "http://a/b/g",
    "../.." -> "http://a/",
    "../../" -> "http://a/",
    "../../g" -> "http://a/g")

  private val abnormal = Seq(
    "../../../g" -> "http://a/g",
    "../../../../g" -> "http://a/g",
    "/./g" -> "http://a/g",
    "/../g" -> "http://a/g",
    "g." -> "http://a/b/c/g.",
    ".g" -> "http://a/b/c/.g",
    "g.." -> "http://a/b/c/g..",
    "..g" -> "http://a/b/c/..g",
    "./../g" -> "http://a/b/g",
    "./g/." -> "http://a/b/c/g/",
    "g/./h" -> "http://a/b/c/g/h",
    "g/../h" -> "http://a/b/c/h",
    "g;x=1/./y" -> "http://a/b/c/g;x=1/y",
    "g;x=1/../y" -> "http://a/b/c/y",
    "g?y/./x" -> "http://a/b/c/g?y/./x",
    "g?y/../x" -> "http://a/b/c/g?y/../x",
    "g#s/./x" -> "http://a/b/c/g#s/./x",
    "g#s/../x" -> "http://a/b/c/g#s/../x",
    // STRICT parser behavior (the spec's "for strict parsers" line);
    // Python's urljoin takes the backward-compat branch here — the one
    // documented twin divergence, so the crawl fixture never plants
    // same-scheme-relative refs
    "http:g" -> "http:g")

  test("RFC 3986 §5.4.1 normal examples") {
    for ((ref, want) <- normal)
      assert(UrlResolve.resolve(base, ref) == want, s"ref='$ref'")
  }

  test("RFC 3986 §5.4.2 abnormal examples (strict)") {
    for ((ref, want) <- abnormal)
      assert(UrlResolve.resolve(base, ref) == want, s"ref='$ref'")
  }

  test("resolution against a base with an empty path merges at root") {
    assert(UrlResolve.resolve("http://h", "g") == "http://h/g")
    assert(UrlResolve.resolve("http://h?q", "g?y") == "http://h/g?y")
  }

  test("frontier normalization: case, default port, empty path, fragment") {
    assert(UrlResolve.normalizeHttp("HTTP://ExAmPle.ORG/Path?Q=1#frag")
      .contains("http://example.org/Path?Q=1")) // path/query case PRESERVED
    assert(UrlResolve.normalizeHttp("https://h:443/x").contains("https://h/x"))
    assert(UrlResolve.normalizeHttp("http://h:80/x").contains("http://h/x"))
    assert(UrlResolve.normalizeHttp("http://h:8080/x").contains("http://h:8080/x"))
    assert(UrlResolve.normalizeHttp("https://h:80/x").contains("https://h:80/x"))
    assert(UrlResolve.normalizeHttp("http://h").contains("http://h/"))
    assert(UrlResolve.normalizeHttp("http://u:p@H/x").contains("http://u:p@h/x"))
    assert(UrlResolve.normalizeHttp("http://[2001:DB8::1]:80/x")
      .contains("http://[2001:db8::1]/x"))
    assert(UrlResolve.normalizeHttp("http://[2001:DB8::1]:8080/x")
      .contains("http://[2001:db8::1]:8080/x"))
  }

  test("frontier normalization rejects non-http schemes") {
    for (u <- Seq("mailto:x@y", "javascript:void(0)", "data:text/plain,x",
        "ftp://h/x", "/relative/not/resolved"))
      assert(UrlResolve.normalizeHttp(u).isEmpty, u)
  }

  test("hostOf") {
    assert(UrlResolve.hostOf("http://User@ExAmple.org:8080/p") == "example.org")
    assert(UrlResolve.hostOf("http://[2001:DB8::1]:443/p") == "[2001:db8::1]")
    assert(UrlResolve.hostOf("mailto:x@y") == "")
  }
}
