package graft

import java.nio.charset.StandardCharsets.{ISO_8859_1, US_ASCII}

import graft.sources.Warc
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** WARC source: the committed fixtures differentially vs the independent
  * expected tables `tools/gen_warc_fixture.py` computes from the bytes it
  * assembles, plus the loud-rejection contract for captures outside the
  * supported subset (framing, HTTP, charset).
  */
class WarcSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // ---- differential vs the generator's expected tables ----------------------

  test("record inventory matches the generator's expected table (both layouts)") {
    val got = graft.ops.Queries.warcRecords(spark, "").collect().map(_.toSeq).toVector
    val exp = spark.read
      .parquet("src/test/resources/expected/warc_records.parquet")
      .select("name", "rec_idx", "warc_type", "uri", "status", "content_type",
        "body_len", "body_sha")
      .orderBy("name", "rec_idx").collect().map(_.toSeq).toVector
    assert(exp.size == 20)
    assert(got == exp)
    // both physical layouts are present and read identically
    assert(got.count(_.head == "sample_00.warc") == 14)
    assert(got.count(_.head == "sample_01.warc.gz") == 6)
  }

  test("gzip member scanner: exact byte ranges, random-access slices, tamper detection") {
    val path = "src/test/resources/media/warc/sample_01.warc.gz"
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val members = graft.sources.Warc.memberRecords(bytes).toVector
    assert(members.size == 6)
    // ranges tile the file exactly: contiguous from 0 to EOF
    assert(members.head.offset == 0)
    members.sliding(2).foreach { case Vector(a, b) =>
      assert(a.offset + a.length == b.offset)
    }
    assert(members.last.offset + members.last.length == bytes.length)
    // the CDX random-access contract: every (offset, length) slice is a
    // self-contained gzip file decompressing to the SAME single record
    members.foreach { m =>
      val slice = java.util.Arrays.copyOfRange(
        bytes, m.offset.toInt, (m.offset + m.length).toInt)
      val alone = graft.sources.Warc.records(slice).toVector
      assert(alone.size == 1)
      assert(alone.head.recordId == m.record.recordId)
      assert(java.util.Arrays.equals(alone.head.body, m.record.body))
    }
    // flip one payload byte inside the third member: CRC32 must catch it
    val corrupt = bytes.clone()
    val mid = (members(2).offset + members(2).length / 2).toInt
    corrupt(mid) = (corrupt(mid) ^ 0x41).toByte
    val e = intercept[IllegalArgumentException] {
      graft.sources.Warc.memberRecords(corrupt).toVector
    }
    assert(e.getMessage.contains("member 2"))
    // plain (non-gzip) input is rejected with member context
    val plain = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/test/resources/media/warc/sample_00.warc"))
    assert(intercept[IllegalArgumentException] {
      graft.sources.Warc.memberRecords(plain).toVector
    }.getMessage.contains("not a gzip member"))
  }

  test("surt: label reversal, port/query retention, non-http rejection") {
    import graft.text.UrlResolve.surt
    assert(surt("https://sub.Example.org:8080/p?q=1").contains("org,example,sub:8080)/p?q=1"))
    assert(surt("http://example.org").contains("org,example)/"))
    assert(surt("https://example.org:443/x").contains("org,example)/x"))
    assert(surt("mailto:x@example.org").isEmpty)
    // host-adjacency: all captures of a site share a comma-terminated prefix
    assert(surt("https://a.example.org/1").get.startsWith("org,example,"))
  }

  test("composed crawl→spans chain matches the generator's expected spans") {
    val got = graft.ops.Queries.warcExtract(spark, "").collect().map(_.toSeq).toVector
    val exp = spark.read
      .parquet("src/test/resources/expected/warc_extract.parquet")
      .select("name", "uri", "offset", "kind", "text", "media_ref")
      .orderBy("name", "uri", "offset").collect().map(_.toSeq).toVector
    assert(exp.size == 20)
    assert(got == exp)
    // the latin-1 page's accents survived the charset decode
    assert(got.exists(_.exists(v => v == "café détail with accents à la carte")))
    // the meta-declared (http-equiv prescan) page decoded as latin-1 too
    assert(got.exists(_.exists(v => v == "précis of the meta declared page über all")))
    // the 404 page and the JSON response were filtered, not extracted
    assert(!got.exists(_.exists(v => v.toString.contains("not found"))))
  }

  test("crawl-frontier links match the generator's expected table") {
    val got = graft.ops.Queries.warcLinks(spark, "").collect().map(_.toSeq).toVector
    val exp = spark.read
      .parquet("src/test/resources/expected/warc_links.parquet")
      .select("name", "uri", "link_idx", "href", "anchor", "rel")
      .orderBy("name", "uri", "link_idx").collect().map(_.toSeq).toVector
    assert(exp.size == 39)
    assert(got == exp)
    // the planted nofollow is carried through
    assert(got.exists(r => r(3) == "/p/2" && r(5) == "nofollow"))
    // the shouty tab-separated variant is carried verbatim too (the
    // FRONTIER must exclude it: rel is a case-insensitive token set)
    assert(got.exists(r => r(3) == "/hidden2" && r(5) == "External\tNOFOLLOW"))
  }

  test("crawl frontier matches the urllib-computed expected table") {
    val got = graft.ops.Queries.warcFrontier(spark, "").collect().map(_.toSeq).toVector
    val exp = spark.read
      .parquet("src/test/resources/expected/warc_frontier.parquet")
      .select("url", "host", "n_refs")
      .orderBy("url").collect().map(_.toSeq).toVector
    assert(exp.size == 31)
    assert(got == exp)
    // both nofollow plantings are excluded — including the shouty
    // tab-separated one (token set, ASCII-case-insensitive)
    assert(!got.exists(_.exists(_.toString.contains("/hidden"))))
    // the cross-page duplicate deduped with its reference count
    assert(got.exists(r => r(0) == "https://example.org/p/1" && r(2) == 2L))
    // canonicalization collapsed case + default port
    assert(got.exists(_.head == "https://other.example/Case"))
    // nofollow and non-http links never reached the frontier
    assert(!got.exists(_.head.toString.contains("hidden")))
    assert(!got.exists(_.head.toString.contains("mailto")))
  }

  test("robots politeness verdicts match the generator's RFC 9309 twin") {
    val got = graft.ops.Queries.warcRobots(spark, "").collect().map(_.toSeq).toVector
    val exp = spark.read
      .parquet("src/test/resources/expected/warc_robots.parquet")
      .select("url", "host", "n_refs", "allowed")
      .orderBy("url").collect().map(_.toSeq).toVector
    assert(exp.size == 31)
    assert(got == exp)
    def verdict(url: String) = got.find(_.head == url).map(_(3)).get
    // the Allow carve-out beats the /p/ Disallow by length
    assert(verdict("https://example.org/p/1") == true)
    assert(verdict("https://example.org/p/3") == false)
    // query-wildcard and $-anchored rules
    assert(verdict("https://example.org/dir/page?q=2") == false)
    assert(verdict("https://example.org/terms") == false)
    // robots scope is the ORIGIN: the :8080 origin has no robots.txt
    assert(verdict("http://example.org:8080/alt") == true)
    // hosts without a captured robots.txt default to allowed
    assert(verdict("https://cdn.example/lib") == true)
  }

  test("fetch schedule equals the window form and caps each host at the budget") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val got = graft.ops.Queries.warcSchedule(spark, "").collect().map(_.toSeq).toVector
    // differential: the identical selection through the funnel-free TopM and
    // through the window rank it replaces, over the committed robots table
    val w = Window.partitionBy("host").orderBy(col("n_refs").desc, col("url"))
    val exp = spark.read
      .parquet("src/test/resources/expected/warc_robots.parquet")
      .where(col("allowed"))
      .withColumn("wave", row_number().over(w))
      .where(col("wave") <= graft.ops.Queries.ScheduleBudget)
      .select("host", "url", "n_refs", "wave")
      .orderBy("host", "wave").collect().map(_.toSeq).toVector
    assert(got == exp)
    // example.org has 16 allowed frontier URLs; the budget admits exactly 2,
    // most-referenced first — the two n_refs=2 URLs ("/" from pages A+G,
    // "/p/1" from pages A+F), tie broken by URL
    assert(got.count(_.head == "example.org") == graft.ops.Queries.ScheduleBudget)
    assert(got.exists(r => r(1) == "https://example.org/" && r(3) == 1))
    assert(got.exists(r => r(1) == "https://example.org/p/1" && r(3) == 2))
    // a host with fewer URLs than the budget contributes all of them
    assert(got.count(_.head == "static.example") == 1)
    // nothing disallowed was scheduled
    assert(!got.exists(_(1).toString.contains("/terms")))
  }

  test("mirror detection groups byte-identical captures across hosts") {
    val got = graft.ops.Queries.warcMirrors(spark, "").collect().map(_.toSeq).toVector
    // exactly one duplicate group: page A and its planted cross-host mirror
    assert(got.size == 2)
    assert(got.forall(_(3) == 2L))
    assert(got.map(_(1)).toSet ==
      Set("https://example.org/a", "https://mirror.example/a"))
    // canonical = minimum URL, identical for every member of the group
    assert(got.forall(_(2) == "https://example.org/a"))
    // both members carry the same digest
    assert(got.map(_(0)).distinct.size == 1)
  }

  test("sitemap seeds match the generator's ElementTree twin") {
    val got = graft.ops.Queries.warcSitemap(spark, "").collect().map(_.toSeq).toVector
    val exp = spark.read
      .parquet("src/test/resources/expected/warc_sitemap.parquet")
      .select("url", "host", "lastmod", "sitemap_url")
      .orderBy("sitemap_url", "url").collect().map(_.toSeq).toVector
    assert(exp.size == 4)
    assert(got == exp)
    // the index expanded to BOTH announced urlsets
    assert(got.map(_(3)).distinct.size == 2)
    // the uppercase loc canonicalized
    assert(got.exists(_.head == "https://example.org/news?id=4"))
    // the origin guard dropped the cross-host injection AND the
    // http-scheme entry on the https origin
    assert(!got.exists(_.head.toString.contains("evil")))
    assert(!got.exists(_.head.toString.startsWith("http://")))
    // lastmod is empty when the sitemap carries none
    assert(got.exists(r => r(0) == "https://example.org/archive" && r(2) == ""))
  }

  test("redirect map and chain resolution match the generator's twin") {
    val gotMap = graft.ops.Queries.warcRedirects(spark, "").collect().map(_.toSeq).toVector
    val expMap = spark.read
      .parquet("src/test/resources/expected/warc_redirects.parquet")
      .select("from_url", "to_url", "status")
      .orderBy("from_url").collect().map(_.toSeq).toVector
    assert(expMap.size == 5)
    assert(gotMap == expMap)
    // the relative Location resolved against the redirecting URI
    assert(gotMap.exists(r => r(0) == "https://example.org/old" &&
      r(1) == "https://example.org/a" && r(2) == 301))

    val got = graft.ops.Queries.warcRedirectChains(spark, "").collect().map(_.toSeq).toVector
    val exp = spark.read
      .parquet("src/test/resources/expected/warc_redirect_chains.parquet")
      .select("url", "final_url", "hops", "unresolved")
      .orderBy("url").collect().map(_.toSeq).toVector
    assert(got == exp)
    // the two-hop 308->301 chain lands on the live page
    assert(got.exists(r => r(0) == "https://example.org/older" &&
      r(1) == "https://example.org/a" && r(2) == 2 && r(3) == false))
    // the planted 302 loop is refused, not followed forever
    assert(got.count(_(3) == true) == 2)
    assert(got.filter(_(3) == true).forall(r => r(1) == "" && r(2) == 0))
  }

  test("integer PageRank matches the generator's Python twin") {
    val got = graft.ops.Queries.warcLinkRank(spark, "").collect().map(_.toSeq).toVector
    val exp = spark.read
      .parquet("src/test/resources/expected/warc_rank.parquet")
      .select("host", "rank")
      .orderBy("host").collect().map(_.toSeq).toVector
    assert(exp.size == 4)
    assert(got == exp)
    val rank = got.map(r => r(0).toString -> r(1).asInstanceOf[Long]).toMap
    // cdn.example is referenced by BOTH crawled hosts — highest authority
    assert(rank("cdn.example") == got.map(_(1).asInstanceOf[Long]).max)
    // the dangling sink and the hub sit below it but above the floor
    assert(rank("static.example") > graft.ops.Queries.RankBase * 15L / 100L)
    // total mass never exceeds the seed (floor division + dangling leakage)
    assert(got.map(_(1).asInstanceOf[Long]).sum <=
      graft.ops.Queries.RankBase * got.size)
  }

  // ---- framing rejections ----------------------------------------------------

  private def rec(headers: String, payload: Array[Byte], sep: String = "\r\n\r\n"): Array[Byte] =
    headers.getBytes(US_ASCII) ++ payload ++ sep.getBytes(US_ASCII)

  private def mk(version: String, payload: String,
      extra: String = "", wtype: String = "metadata",
      lenOverride: Option[Int] = None, sep: String = "\r\n\r\n"): Array[Byte] = {
    val p = payload.getBytes(US_ASCII)
    val len = lenOverride.getOrElse(p.length)
    rec(s"$version\r\nWARC-Type: $wtype\r\n${extra}Content-Length: $len\r\n\r\n", p, sep)
  }

  test("unsupported version, missing Content-Length, bad separator, truncated payload all throw") {
    val e1 = intercept[IllegalArgumentException](
      Warc.records(mk("WARC/0.18", "x")).toVector)
    assert(e1.getMessage.contains("version"))
    val noLen = "WARC/1.0\r\nWARC-Type: metadata\r\n\r\n".getBytes(US_ASCII)
    val e2 = intercept[IllegalArgumentException](Warc.records(noLen).toVector)
    assert(e2.getMessage.contains("Content-Length"))
    val e3 = intercept[IllegalArgumentException](
      Warc.records(mk("WARC/1.0", "x", sep = "\n\n\r\n")).toVector)
    assert(e3.getMessage.contains("CRLF"))
    // Content-Length says 10, only 1 byte present → EOF inside payload/separator
    intercept[Exception](Warc.records(mk("WARC/1.0", "x", lenOverride = Some(10))).toVector)
  }

  test("LF-only header lines and malformed header lines throw with record context") {
    val lfOnly = "WARC/1.0\nWARC-Type: metadata\nContent-Length: 0\n\n\r\n\r\n".getBytes(US_ASCII)
    val e1 = intercept[IllegalArgumentException](Warc.records(lfOnly).toVector)
    assert(e1.getMessage.contains("CRLF-terminated"))
    val bad = "WARC/1.0\r\nNoColonHere\r\nContent-Length: 0\r\n\r\n\r\n\r\n".getBytes(US_ASCII)
    val e2 = intercept[IllegalArgumentException](Warc.records(bad).toVector)
    assert(e2.getMessage.contains("malformed header"))
    assert(e2.getMessage.contains("record 0"))
  }

  // ---- HTTP unwrap -----------------------------------------------------------

  private def httpRec(http: String): Array[Byte] =
    mk("WARC/1.0", http, extra = "Content-Type: application/http;msgtype=response\r\n",
      wtype = "response")

  test("chunked transfer encoding and a bad status line are rejected loudly") {
    val chunked = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n0\r\n\r\n"
    val e1 = intercept[IllegalArgumentException](Warc.records(httpRec(chunked)).toVector)
    assert(e1.getMessage.contains("chunked"))
    val e2 = intercept[IllegalArgumentException](
      Warc.records(httpRec("ICY 200 OK\r\n\r\nbody")).toVector)
    assert(e2.getMessage.contains("status line"))
  }

  test("non-HTTP records keep their raw payload; HTTP responses unwrap the body") {
    val recs = Warc.records(mk("WARC/1.1", "raw bytes") ++
      httpRec("HTTP/1.1 404 Not Found\r\nContent-Type: text/plain\r\n\r\nnope")).toVector
    assert(recs.map(_.warcType) == Vector("metadata", "response"))
    assert(new String(recs(0).body, US_ASCII) == "raw bytes" && recs(0).httpStatus == 0)
    assert(new String(recs(1).body, US_ASCII) == "nope")
    assert(recs(1).httpStatus == 404 && recs(1).httpContentType == "text/plain")
  }

  // ---- charset handling ------------------------------------------------------

  test("charset parameter parses (quoted, defaulted); unsupported charsets throw") {
    def cap(ct: String, body: Array[Byte]): Array[Byte] = {
      val http = s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\nContent-Length: ${body.length}\r\n\r\n"
        .getBytes(US_ASCII) ++ body
      rec("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://x/\r\n" +
        s"Content-Type: application/http;msgtype=response\r\nContent-Length: ${http.length}\r\n\r\n",
        http)
    }
    val html = "<body><p>café page body with words enough</p></body>"
    // quoted latin-1 decodes the accent correctly
    val got = Warc.htmlPages(cap("text/html; charset=\"iso-8859-1\"", html.getBytes(ISO_8859_1)))
      .toVector
    assert(got.size == 1 && got.head._2.contains("café"))
    // no charset parameter → utf-8 default
    val got2 = Warc.htmlPages(cap("text/html",
      html.getBytes(java.nio.charset.StandardCharsets.UTF_8))).toVector
    assert(got2.head._2.contains("café"))
    // unsupported charset throws with the record's uri
    val e = intercept[IllegalArgumentException](
      Warc.htmlPages(cap("text/html; charset=shift_jis", html.getBytes(US_ASCII))).toVector)
    assert(e.getMessage.contains("shift_jis") && e.getMessage.contains("https://x/"))
  }

  test("meta-charset prescan: both declaration forms, 1024-byte window, header precedence") {
    def b(s: String) = s.getBytes(ISO_8859_1)
    // modern form, unquoted
    assert(Warc.metaCharset(b("<html><head><meta charset=ISO-8859-1></head>"))
      == Some("iso-8859-1"))
    // legacy http-equiv form, charset inside the content value
    assert(Warc.metaCharset(b("<head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=UTF-8\"></head>")) == Some("utf-8"))
    // no declaration in the window
    assert(Warc.metaCharset(b("<html><head><title>x</title></head>")) == None)
    // a declaration past the first 1024 bytes is OUTSIDE the prescan window
    val late = b("<html><head>" + ("<!-- pad -->" * 100) + "<meta charset=utf-8>")
    assert(late.length > 1024 && Warc.metaCharset(late) == None)
    // a stray "charset=" outside any meta tag is not a declaration
    assert(Warc.metaCharset(b("<p>set charset=latin-1 in your config</p>")) == None)
    // header parameter WINS over a conflicting meta declaration
    def cap(ct: String, body: Array[Byte]): Array[Byte] = {
      val http = s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\nContent-Length: ${body.length}\r\n\r\n"
        .getBytes(US_ASCII) ++ body
      rec("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://x/\r\n" +
        s"Content-Type: application/http;msgtype=response\r\nContent-Length: ${http.length}\r\n\r\n",
        http)
    }
    val conflicted = "<head><meta charset=us-ascii></head><body><p>café body</p></body>"
    val got = Warc.htmlPages(cap("text/html; charset=iso-8859-1",
      conflicted.getBytes(ISO_8859_1))).toVector
    assert(got.head._2.contains("café")) // decoded latin-1 per header, not ascii per meta
    // ONLY the two declaration forms count: a charset= inside an unrelated
    // meta attribute value must NOT be taken (pre-fix this quarantined or
    // mojibaked a perfectly valid page)
    assert(Warc.metaCharset(
      b("<meta name=\"keywords\" content=\"charset=shift_jis converter tips\">")) == None)
    assert(Warc.metaCharset(
      b("<meta name=\"description\" content=\"how charset=latin-1 works\">")) == None)
    // http-equiv is ASCII-case-insensitive; a non-Content-Type equiv is ignored
    assert(Warc.metaCharset(b("<meta HTTP-EQUIV=\"content-type\" " +
      "content=\"text/html; charset=ISO-8859-1\">")) == Some("iso-8859-1"))
    assert(Warc.metaCharset(b("<meta http-equiv=\"refresh\" " +
      "content=\"0; url=x?charset=utf-16\">")) == None)
  }

  test("a corrupt member BOUNDARY throws from records() — never silent truncation") {
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/test/resources/media/warc/sample_01.warc.gz"))
    val members = graft.sources.Warc.memberRecords(bytes).toVector
    // flip member 3's gzip magic: GZIPInputStream's readTrailer treats a
    // malformed next-member header as clean EOF, so records() used to
    // return members 0-2 and SILENTLY drop 3-5 with no error for any
    // guard to quarantine
    val corrupt = bytes.clone()
    corrupt(members(3).offset.toInt) = 0x00
    val it = graft.sources.Warc.records(corrupt)
    var good = 0
    val e = intercept[IllegalArgumentException] {
      while (it.hasNext) { it.next(); good += 1 }
    }
    // the good prefix still parses (the record iterator's one-ahead advance
    // costs the record just before the tear at most), then a LOUD throw
    assert(good >= 2 && good <= 3, s"good=$good")
    assert(e.getMessage.contains("member 3") &&
      e.getMessage.contains("not a gzip member header"))
    // a truncated FNAME field throws with member context, not a raw AIOOBE
    val fname = Array[Byte](0x1f.toByte, 0x8b.toByte, 8, 8,
      0, 0, 0, 0, 0, 0, 'n'.toByte, 'a'.toByte) // FLG=FNAME, no NUL before EOF
    assert(intercept[IllegalArgumentException] {
      graft.sources.Warc.records(fname).toVector
    }.getMessage.contains("truncated gzip header fields"))
    assert(intercept[IllegalArgumentException] {
      graft.sources.Warc.memberRecords(fname).toVector
    }.getMessage.contains("truncated gzip header fields"))
  }
}
