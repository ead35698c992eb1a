package graft

import graft.text.Sitemaps
import org.scalatest.funsuite.AnyFunSuite

/** Sitemap parser: both document kinds, namespace handling, and the
  * loud-rejection contract for captures outside the supported subset.
  */
class SitemapsSpec extends AnyFunSuite {

  private val ns = "http://www.sitemaps.org/schemas/sitemap/0.9"

  test("urlset parses entries with optional lastmod, namespaced or not") {
    val withNs = Sitemaps.parse(
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<urlset xmlns="$ns">
         |<url><loc>https://h/a</loc><lastmod>2026-01-02</lastmod></url>
         |<url><loc> https://h/b </loc></url>
         |<url><lastmod>2026-01-03</lastmod></url>
         |</urlset>""".stripMargin, "t")
    assert(withNs == Sitemaps.UrlSet(Vector(
      Sitemaps.Entry("https://h/a", "2026-01-02"),
      Sitemaps.Entry("https://h/b", "")))) // loc whitespace trimmed; loc-less url dropped
    val bare = Sitemaps.parse(
      "<urlset><url><loc>https://h/c</loc></url></urlset>", "t")
    assert(bare == Sitemaps.UrlSet(Vector(Sitemaps.Entry("https://h/c", ""))))
  }

  test("sitemapindex parses child locations") {
    val got = Sitemaps.parse(
      s"""<sitemapindex xmlns="$ns">
         |<sitemap><loc>https://h/a.xml</loc><lastmod>2026-01-01</lastmod></sitemap>
         |<sitemap><loc>https://h/b.xml</loc></sitemap>
         |<sitemap></sitemap>
         |</sitemapindex>""".stripMargin, "t")
    assert(got == Sitemaps.Index(Vector("https://h/a.xml", "https://h/b.xml")))
  }

  test("malformed XML and unexpected roots throw with the supplied context") {
    val bad = intercept[IllegalArgumentException](
      Sitemaps.parse("<urlset><url></urlset>", "ctx-A"))
    assert(bad.getMessage.startsWith("ctx-A:"))
    val wrongRoot = intercept[IllegalArgumentException](
      Sitemaps.parse("<rss><channel/></rss>", "ctx-B"))
    assert(wrongRoot.getMessage.contains("<rss>"))
    assert(wrongRoot.getMessage.startsWith("ctx-B:"))
    val empty = intercept[IllegalArgumentException](
      Sitemaps.parse("", "ctx-C"))
    assert(empty.getMessage.startsWith("ctx-C:"))
  }

  test("XXE: a DOCTYPE with an internal-subset SYSTEM entity is rejected, never resolved") {
    // crawled sitemaps are hostile input: load-external-dtd=false and
    // secure processing do NOT stop an internal-subset SYSTEM entity from
    // reading local files / SSRFing into extracted loc URLs — the parser
    // must refuse the DOCTYPE outright
    val xxe =
      """<?xml version="1.0"?><!DOCTYPE u [<!ENTITY x SYSTEM "file:///etc/passwd">]>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<url><loc>http://e/&x;</loc></url></urlset>""".stripMargin
    val e = intercept[IllegalArgumentException](Sitemaps.parse(xxe, "ctx-X"))
    assert(e.getMessage.startsWith("ctx-X:"))
    // a plain DOCTYPE (no entities) is rejected too — real sitemaps never carry one
    val doct = "<!DOCTYPE urlset><urlset><url><loc>http://e/a</loc></url></urlset>"
    intercept[IllegalArgumentException](Sitemaps.parse(doct, "ctx-Y"))
  }
}
