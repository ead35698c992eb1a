package graft.sources

import graft.model.Span
import graft.pipeline.DocsGen.Rng

/** Deterministic synthetic crawl — WARC files for [[graft.jobs.WarcIngestJob]]
  * and the crawl-chain scale bench, with NO external data (the brief's
  * synthesize-at-small-scale rule, the DocsGen pattern applied one container
  * level up).
  *
  * Each file is the Common Crawl physical layout the reader supports: one
  * gzip MEMBER per record — a `warcinfo`, then per page a `request` record
  * and a `response` record. Page payloads are full chrome-wrapped HTML
  * articles (header/nav, hinted sidebar, `<article>` with heading +
  * sentence paragraphs + a planted figure every 4th page, comments,
  * footer) so the ingest job exercises the REAL extraction heuristics, not
  * a toy page. Four planted page classes keep the non-happy paths honest:
  * `application/json` responses and 404s (filtered, [[isJson]]/[[is404]]),
  * lexically BROKEN html that fails both parse modes and must be
  * quarantined per page ([[isBroken]]), and SLOPPY real-web html with
  * unclosed `<p>` tags that only the lenient parser accepts — with
  * identical extraction ([[isSloppy]]).
  *
  * Everything derives from splitmix64 streams seeded by (seed, global page
  * index): files are identical at any parallelism and safe under task
  * retry, and [[expectedSpans]] computes the extraction expectation from
  * the construction — not by running the extractor — so job tests are
  * differential against an independent derivation.
  */
object WarcGen {

  private val words = Vector(
    "crawl", "segment", "anchor", "render", "script", "domain", "header",
    "market", "signal", "packet", "binary", "stream", "bundle", "portal",
    "record", "branch", "august", "window", "样本", "página")

  /** Sentence pieces of page (global) `pageId` — the article's paragraphs. */
  def pieces(pageId: Long, seed: Long): Vector[String] = {
    val rng = new Rng(seed ^ (pageId * 0x9E3779B97F4A7C15L) ^ 0x57A7C0DEL)
    val n = 2 + rng.nextInt(5)
    Vector.tabulate(n) { _ =>
      val len = 4 + rng.nextInt(9)
      (0 until len).map(_ => words(rng.nextInt(words.length))).mkString(" ")
    }
  }

  def uriOf(pageId: Long): String = s"https://crawl.example/$pageId"

  /** Static chrome hrefs every article page carries (header/sidebar/footer). */
  val ChromeHrefs: Vector[String] =
    Vector("/", "/map", "/s/1", "/s/2", "/legal")

  /** Deterministic per-page RELATED hrefs (footer chrome): two forward
    * same-host article links — targets past the crawl edge are exactly what
    * a real frontier contains, uncrawled URLs — plus a partner-host link on
    * a fixed cadence, so the job's published frontier has cross-host rows.
    */
  def relatedHrefs(pageId: Long, seed: Long): Vector[String] = {
    val rng = new Rng(seed ^ (pageId * 0x9E3779B97F4A7C15L) ^ 0x11ABCDEFL)
    val base = Vector.tabulate(2)(_ => s"/${pageId + 1 + rng.nextInt(97)}")
    if (pageId % 7 == 2)
      base :+ s"https://partner-${pageId % 5}.example/ref/$pageId"
    else base
  }

  /** The job's per-page outlink expectation — every chrome + related href
    * resolved/canonicalized like the ingest path does (same-host hrefs are
    * root-relative, so resolution is plain prefixing; the construction
    * stays an independent derivation, not a call into UrlResolve).
    */
  def expectedOutlinks(pageId: Long, seed: Long): Vector[String] =
    (ChromeHrefs ++ relatedHrefs(pageId, seed)).map { h =>
      if (h.startsWith("https://")) h else s"https://crawl.example$h"
    }

  /** Planted-figure rule (same cadence as the catalog's article wrap). */
  def hasFigure(pageId: Long): Boolean = pageId % 4 == 0

  /** The chrome-wrapped article page (utf-8). */
  // no default seed: `ps` is seed-derived too, and a caller mixing
  // pieces(p, s) with a defaulted 42 here would emit footer links that
  // silently disagree with expectedOutlinks(p, s)
  def pageHtml(pageId: Long, ps: Vector[String], seed: Long): String = {
    val sb = new java.lang.StringBuilder(1400)
    sb.append("<!DOCTYPE html>\n<html><head><title>Page ").append(pageId)
      .append("</title><style>article{margin:0}</style>")
      .append("<script>var x = 1 < 2;</script></head>\n<body>\n")
      .append("<header><nav><ul><li><a href=\"/\">Home</a></li>")
      .append("<li><a href=\"/map\">Sitemap</a></li></ul></nav></header>\n")
      .append("<aside class=\"sidebar\"><ul>")
      .append("<li><a href=\"/s/1\">a sidebar teaser with a pile of extra words in it</a></li>")
      .append("<li><a href=\"/s/2\">another teaser that is also mostly link text</a></li>")
      .append("</ul></aside>\n<article><h1>Page ").append(pageId).append(" headline</h1>")
    val sloppy = isSloppy(pageId)
    var i = 0
    while (i < ps.length) {
      // sloppy pages never close their paragraphs (real-web style; the
      // lenient parser's implied end tags recover the identical tree)
      sb.append("<p>").append(graft.text.HtmlEntities.escape(ps(i)))
      if (!sloppy) sb.append("</p>")
      if (i == 0 && hasFigure(pageId))
        sb.append("<img src=\"media://page_").append(pageId)
          .append("/img\" alt=\"figure ").append(pageId).append("\">")
      i += 1
    }
    sb.append("</article>\n<div class=\"comments\"><p>short comment thread body ")
      .append("with opinions and replies</p></div>\n")
      .append("<footer><p>footer <a href=\"/legal\">legal</a></p>")
    // related-link block: footer CHROME (invisible to extraction, visible
    // to the link pass) — the per-page outlinks the frontier is built from
    relatedHrefs(pageId, seed).foreach { h =>
      sb.append("<a href=\"").append(h).append("\">related</a>")
    }
    sb.append("</footer>\n</body></html>")
    sb.toString
  }

  /** The spans [[graft.text.MainContent]] must extract from
    * [[pageHtml]] — derived from the construction, not the extractor.
    */
  def expectedSpans(pageId: Long, seed: Long): Vector[Span] = {
    val ps = pieces(pageId, seed)
    val out = Vector.newBuilder[Span]
    out += Span("heading", s"Page $pageId headline", "", 0)
    var off = 1
    var i = 0
    while (i < ps.length) {
      out += Span("text", ps(i), "", off); off += 1
      if (i == 0 && hasFigure(pageId)) {
        out += Span("image", s"figure $pageId", s"media://page_$pageId/img", off)
        off += 1
      }
      i += 1
    }
    out.result()
  }

  /** Page classes planted besides the extractable article. */
  def isJson(pageId: Long): Boolean = pageId % 13 == 5
  def is404(pageId: Long): Boolean = !isJson(pageId) && pageId % 17 == 9

  /** BROKEN pages: 200 text/html whose body fails even the lenient parse
    * (an unterminated comment — a lexical error) — the ingest job must
    * QUARANTINE these per page, not die per file.
    */
  def isBroken(pageId: Long): Boolean =
    !isJson(pageId) && !is404(pageId) && pageId % 31 == 8

  /** SLOPPY pages: the same article written real-web style — `<p>` tags
    * never closed — so the strict parser rejects them but lenient implied
    * end tags recover the IDENTICAL tree (and [[expectedSpans]] is
    * unchanged). Excludes figure pages: an unclosed `<p>` would swallow
    * the inline `<img>` into the paragraph.
    */
  def isSloppy(pageId: Long): Boolean =
    !isJson(pageId) && !is404(pageId) && !isBroken(pageId) &&
      !hasFigure(pageId) && pageId % 7 == 3

  /** Global page ids of one file. */
  def pageIds(fileIdx: Int, pagesPerFile: Int): Range = {
    val base = fileIdx * pagesPerFile
    base until base + pagesPerFile
  }

  /** 200 text/html page ids of one file (broken ones included). */
  def htmlPageIds(fileIdx: Int, pagesPerFile: Int): Seq[Long] =
    pageIds(fileIdx, pagesPerFile).map(_.toLong).filterNot(p => isJson(p) || is404(p))

  /** Page ids that actually EXTRACT (html minus the quarantined broken). */
  def extractablePageIds(fileIdx: Int, pagesPerFile: Int): Seq[Long] =
    htmlPageIds(fileIdx, pagesPerFile).filterNot(isBroken)

  private def crlf(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  private def httpResponse(status: Int, reason: String, ctype: String,
      body: Array[Byte]): Array[Byte] =
    crlf(s"HTTP/1.1 $status $reason\r\nContent-Type: $ctype\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n") ++ body

  private def warcRecord(wtype: String, recId: String, uri: String,
      payload: Array[Byte], ctype: String): Array[Byte] = {
    val h = new StringBuilder(256)
    h ++= s"WARC/1.0\r\nWARC-Type: $wtype\r\nWARC-Record-ID: <urn:uuid:$recId>\r\n"
    h ++= "WARC-Date: 2026-08-17T00:00:00Z\r\n"
    if (uri.nonEmpty) h ++= s"WARC-Target-URI: $uri\r\n"
    h ++= s"Content-Type: $ctype\r\nContent-Length: ${payload.length}\r\n\r\n"
    crlf(h.result()) ++ payload ++ crlf("\r\n\r\n")
  }

  private def gzipMember(rec: Array[Byte]): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream(rec.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(buf, 1 << 14)
    gz.write(rec); gz.close() // Java writes MTIME=0: byte-deterministic
    buf.toByteArray
  }

  /** One complete crawl file (gzip member per record). */
  def fileBytes(fileIdx: Int, pagesPerFile: Int, seed: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(pagesPerFile * 700)
    out.write(gzipMember(warcRecord("warcinfo", s"info-$fileIdx", "",
      crlf(s"software: graft-warcgen\r\nfile: $fileIdx\r\n"),
      "application/warc-fields")))
    pageIds(fileIdx, pagesPerFile).foreach { p0 =>
      val p = p0.toLong
      val uri = uriOf(p)
      out.write(gzipMember(warcRecord("request", s"req-$p", uri,
        crlf(s"GET /$p HTTP/1.1\r\nHost: crawl.example\r\n\r\n"),
        "application/http;msgtype=request")))
      val http =
        if (isJson(p))
          httpResponse(200, "OK", "application/json",
            crlf(s"""{"page":$p}"""))
        else if (is404(p))
          httpResponse(404, "Not Found", "text/html; charset=utf-8",
            "<html><body><main><p>gone</p></main></body></html>"
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        else if (isBroken(p))
          // lexically broken (unterminated comment): fails BOTH parse modes
          httpResponse(200, "OK", "text/html; charset=utf-8",
            s"<html><head><!-- capture $p truncated mid-comment"
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        else
          httpResponse(200, "OK", "text/html; charset=utf-8",
            pageHtml(p, pieces(p, seed), seed)
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.write(gzipMember(warcRecord("response", s"resp-$p", uri, http,
        "application/http;msgtype=response")))
    }
    out.toByteArray
  }
}
