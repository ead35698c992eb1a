package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, DataInputStream, EOFException, InputStream}

/** WARC (ISO 28500 / WARC-1.x) record reader — the web-archive container
  * the web-scale extraction tier ingests (Common-Crawl-style captures).
  * The reference pipeline starts from already-collected page media; a
  * from-the-crawl pipeline starts one step earlier, at the WARC member,
  * which is what this source provides for the composed chain
  * WARC → HTTP → charset decode → [[graft.text.HtmlDom]] →
  * [[graft.text.MainContent]] spans.
  *
  * Supported subset (spec-derived; everything outside throws with record
  * context — the repo's reject-loudly contract):
  *  - `WARC/1.0` / `WARC/1.1` records: ASCII header block terminated by a
  *    blank line, `Content-Length`-delimited payload, exactly one CRLF CRLF
  *    after the payload;
  *  - whole files either PLAIN or GZIP — including the Common Crawl
  *    convention of one gzip MEMBER per record (members are concatenated
  *    by a STRICT walker that validates every header and CRC32/ISIZE
  *    trailer; record boundaries come from the WARC headers, not member
  *    boundaries, so both layouts read identically — a corrupt member
  *    boundary throws rather than reading as the silent EOF Java's
  *    GZIPInputStream reports there);
  *  - `response` records with `Content-Type: application/http…`: the HTTP
  *    status line and headers are parsed; the record's `body` is the HTTP
  *    message body. `Transfer-Encoding: chunked` is rejected loudly (the
  *    capture should have been de-chunked at write time);
  *  - [[htmlPages]] decodes `text/html` bodies by the HTTP charset
  *    parameter (`utf-8` default, `iso-8859-1`/`latin-1`, `us-ascii`);
  *    any other charset throws.
  *
  * Reading is STREAMING: records parse one at a time off the (possibly
  * gzip) input stream, so peak memory per task is one record, not one
  * file — the property that matters when the member is a 1 GiB crawl
  * segment. (The Spark entry point still arrives via a `binaryFile` scan
  * at fixture scale; at crawl scale the same iterator would sit behind a
  * custom FileFormat reading the stream directly.)
  */
object Warc {

  /** Hard per-record payload ceiling (256 MiB). WARC itself has no limit,
    * but a reader that trusts Content-Length allocates whatever a hostile
    * header asks for; real crawl records are single pages, orders of
    * magnitude below this. Oversized records throw the reader's typed IAE.
    */
  val MaxPayloadBytes: Long = 256L * 1024 * 1024

  /** One parsed record. For `response` records carrying HTTP, `httpStatus`
    * / `httpContentType` come from the embedded message and `body` is the
    * HTTP body; for every other record type they are `0` / `""` and `body`
    * is the raw WARC payload.
    */
  final case class WarcRecord(
      recIdx: Int,
      warcType: String,
      recordId: String,
      targetUri: String,
      date: String,
      httpStatus: Int,
      httpContentType: String,
      httpLocation: String,
      body: Array[Byte])

  private def isGzip(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b

  /** Parse all records of one WARC file (plain or gzip). Gzip input goes
    * through [[StrictMembersInputStream]], NOT `GZIPInputStream`: the JDK
    * stream's member-concatenation treats a malformed next-member header
    * as clean EOF (`readTrailer` swallows the exception), so one flipped
    * byte at a member boundary would SILENTLY drop every record after it —
    * data loss no guard can see. The strict walker throws with member
    * context instead, which the ingest job's torn-file guard quarantines.
    */
  def records(bytes: Array[Byte]): Iterator[WarcRecord] = {
    val in: InputStream =
      if (isGzip(bytes)) new StrictMembersInputStream(bytes)
      else new ByteArrayInputStream(bytes)
    recordIterator(new DataInputStream(new BufferedInputStream(in, 1 << 16)))
  }

  /** Parse one member's fixed + optional header fields (RFC 1952), with
    * every scan BOUNDS-CHECKED so a truncated FNAME/FEXTRA throws with
    * member context, never a raw ArrayIndexOutOfBoundsException. Returns
    * the deflate-data start offset.
    */
  private def memberDataStart(bytes: Array[Byte], pos: Int, ctx: => String): Int = {
    def u8(i: Int): Int = {
      if (i >= bytes.length)
        throw new IllegalArgumentException(s"$ctx: truncated gzip header fields")
      bytes(i) & 0xff
    }
    def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    if (pos + 10 > bytes.length || u8(pos) != 0x1f || u8(pos + 1) != 0x8b)
      throw new IllegalArgumentException(s"$ctx: not a gzip member header")
    if (u8(pos + 2) != 8)
      throw new IllegalArgumentException(
        s"$ctx: compression method ${u8(pos + 2)} is not deflate")
    val flg = u8(pos + 3)
    var p = pos + 10
    if ((flg & 4) != 0) p += 2 + u16(p) // FEXTRA
    if ((flg & 8) != 0) { while (u8(p) != 0) p += 1; p += 1 } // FNAME
    if ((flg & 16) != 0) { while (u8(p) != 0) p += 1; p += 1 } // FCOMMENT
    if ((flg & 2) != 0) p += 2 // FHCRC
    p
  }

  /** Streaming decompression of a multi-member gzip file with STRICT
    * member framing: each member's header is parsed (bounds-checked), its
    * CRC32 + ISIZE trailer validated, and the next member must start
    * immediately after — anything malformed throws with member context.
    * Decompresses one buffer at a time (no whole-payload materialization),
    * so a single-member multi-record file still streams.
    */
  private final class StrictMembersInputStream(bytes: Array[Byte])
      extends InputStream {
    private var pos = 0
    private var idx = 0
    private var memberStart = 0
    private var dataStart = 0
    private var inf: java.util.zip.Inflater = null
    private val crc = new java.util.zip.CRC32
    private var isize = 0L
    openNext()

    private def ctx = s"gzip member $idx at offset $memberStart"
    private def u32(i: Int): Long = {
      def u8(j: Int): Long = (bytes(j) & 0xff).toLong
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    }

    private def openNext(): Unit =
      if (pos >= bytes.length) inf = null
      else {
        memberStart = pos
        dataStart = memberDataStart(bytes, pos, ctx)
        inf = new java.util.zip.Inflater(true)
        inf.setInput(bytes, dataStart, bytes.length - dataStart)
        crc.reset(); isize = 0L
      }

    private def finishMember(): Unit = {
      val trailer = dataStart + inf.getBytesRead.toInt
      inf.end(); inf = null
      if (trailer + 8 > bytes.length)
        throw new IllegalArgumentException(s"$ctx: truncated gzip trailer")
      if (crc.getValue != u32(trailer))
        throw new IllegalArgumentException(s"$ctx: CRC32 mismatch")
      if ((isize & 0xffffffffL) != u32(trailer + 4))
        throw new IllegalArgumentException(s"$ctx: ISIZE mismatch")
      pos = trailer + 8
      idx += 1
    }

    override def read(): Int = {
      val one = new Array[Byte](1)
      val n = read(one, 0, 1)
      if (n < 0) -1 else one(0) & 0xff
    }

    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (len == 0) return 0
      while (inf != null) {
        val n =
          try inf.inflate(b, off, len)
          catch {
            case e: java.util.zip.DataFormatException =>
              throw new IllegalArgumentException(
                s"$ctx: corrupt deflate stream: ${e.getMessage}")
          }
        if (n > 0) { crc.update(b, off, n); isize += n; return n }
        if (inf.finished()) { finishMember(); openNext() }
        else if (inf.needsInput())
          throw new IllegalArgumentException(s"$ctx: truncated deflate stream")
      }
      -1
    }
  }

  /** One gzip member of a member-per-record WARC file: the member's exact
    * compressed byte range in the container plus its parsed record. The
    * (offset, length) pair is what a CDX index stores — an HTTP range
    * request for exactly those bytes yields a self-contained gzip member
    * that decompresses to the one record, the random-access contract that
    * makes a 100 TB archive addressable without scanning.
    */
  final case class MemberRecord(offset: Long, length: Long, record: WarcRecord)

  /** Scan a member-per-record gzip WARC file with RFC 1952 framing parsed
    * DIRECTLY (GZIPInputStream transparently concatenates members, erasing
    * the boundaries this exists to report): per member, the 10-byte fixed
    * header plus FEXTRA/FNAME/FCOMMENT/FHCRC optional fields, a raw-deflate
    * body via `Inflater(nowrap)` whose `getBytesRead` pins the compressed
    * length, and the CRC32 + ISIZE trailer — both VALIDATED, so silent
    * corruption surfaces here, not as a garbled record downstream. Each
    * member must hold exactly one WARC record (the Common Crawl layout);
    * anything else — plain input, a non-deflate method, a multi-record
    * member — throws with member context.
    */
  def memberRecords(bytes: Array[Byte]): Iterator[MemberRecord] =
    new Iterator[MemberRecord] {
      private var pos = 0
      private var idx = 0
      override def hasNext: Boolean = pos < bytes.length
      override def next(): MemberRecord = {
        if (!hasNext) throw new NoSuchElementException
        val ctx = s"gzip member $idx at offset $pos"
        def u8(i: Int): Int = bytes(i) & 0xff
        def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
        def u32(i: Int): Long = u16(i).toLong | (u16(i + 2).toLong << 16)
        val p = memberDataStart(bytes, pos, ctx) // bounds-checked header walk
        val inf = new java.util.zip.Inflater(true)
        inf.setInput(bytes, p, bytes.length - p)
        val out = new java.io.ByteArrayOutputStream(1 << 16)
        val buf = new Array[Byte](1 << 16)
        try {
          while (!inf.finished()) {
            val n = inf.inflate(buf)
            if (n == 0 && inf.needsInput())
              throw new IllegalArgumentException(s"$ctx: truncated deflate stream")
            out.write(buf, 0, n)
            // bomb ceiling, checked as the output GROWS: a member holds
            // exactly one record (contract above), so anything past the
            // per-record payload cap plus header slack is hostile — without
            // this a few-MB member inflating to GBs OOMs before the
            // MaxPayloadBytes check inside records() ever runs
            if (out.size() > Warc.MaxPayloadBytes + (1 << 20))
              throw new IllegalArgumentException(
                s"$ctx: member inflates past ${Warc.MaxPayloadBytes + (1 << 20)} bytes (decompression bomb)")
          }
        } catch {
          case e: java.util.zip.DataFormatException =>
            throw new IllegalArgumentException(s"$ctx: corrupt deflate stream: ${e.getMessage}")
        }
        val deflateLen = inf.getBytesRead
        inf.end()
        val trailer = p + deflateLen.toInt
        if (trailer + 8 > bytes.length)
          throw new IllegalArgumentException(s"$ctx: truncated gzip trailer")
        val payload = out.toByteArray
        val crc = new java.util.zip.CRC32
        crc.update(payload)
        if (crc.getValue != u32(trailer))
          throw new IllegalArgumentException(s"$ctx: CRC32 mismatch")
        if ((payload.length.toLong & 0xffffffffL) != u32(trailer + 4))
          throw new IllegalArgumentException(s"$ctx: ISIZE mismatch")
        val len = trailer + 8 - pos
        val recs = records(payload).toList
        if (recs.size != 1)
          throw new IllegalArgumentException(
            s"$ctx: expected exactly one record per member, got ${recs.size}")
        val m = MemberRecord(pos.toLong, len.toLong, recs.head.copy(recIdx = idx))
        pos += len
        idx += 1
        m
      }
    }

  /** One CRLF-terminated header line (ASCII superset via Latin-1); None at
    * clean EOF before any byte of a line.
    */
  private def readLine(in: InputStream, ctx: => String): Option[String] = {
    val sb = new java.lang.StringBuilder(96)
    var c = in.read()
    if (c < 0) return None
    while (c != '\n') {
      if (c < 0) throw new IllegalArgumentException(s"$ctx: EOF inside header line")
      sb.append(c.toChar)
      c = in.read()
    }
    val len = sb.length()
    if (len == 0 || sb.charAt(len - 1) != '\r')
      throw new IllegalArgumentException(s"$ctx: header line not CRLF-terminated")
    sb.setLength(len - 1)
    Some(sb.toString)
  }

  /** Header block: `Name: value` lines to the blank line; names case-fold. */
  private def readHeaders(in: InputStream, ctx: => String): Map[String, String] = {
    val m = Map.newBuilder[String, String]
    var line = readLine(in, ctx).getOrElse(
      throw new IllegalArgumentException(s"$ctx: EOF before header block end"))
    while (line.nonEmpty) {
      val colon = line.indexOf(':')
      if (colon <= 0)
        throw new IllegalArgumentException(s"$ctx: malformed header line '$line'")
      m += (line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
        -> line.substring(colon + 1).trim)
      line = readLine(in, ctx).getOrElse(
        throw new IllegalArgumentException(s"$ctx: EOF before header block end"))
    }
    m.result()
  }

  private def recordIterator(in: DataInputStream): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private var idx = 0
      private var nextRec: WarcRecord = null
      private var done = false

      private def ctx = s"WARC record $idx"

      private def advance(): Unit = {
        val version = readLine(in, ctx)
        version match {
          case None => done = true
          case Some(v) =>
            if (v != "WARC/1.0" && v != "WARC/1.1")
              throw new IllegalArgumentException(s"$ctx: unsupported version line '$v'")
            val h = readHeaders(in, ctx)
            // parse in Long space and validate BEFORE allocating: a negative
            // length would escape as NegativeArraySizeException (not the
            // typed IAE this reader's contract promises) and a huge one
            // would pre-allocate gigabytes off a one-line hostile header
            // before any payload byte is read
            val lenStr = h.getOrElse("content-length",
              throw new IllegalArgumentException(s"$ctx: missing Content-Length"))
            val len =
              try lenStr.toLong
              catch { case _: NumberFormatException =>
                // NFE is an IAE subclass so the CATCH contract holds either
                // way, but its message carries no record context — rethrow
                // with the position a quarantine log needs
                throw new IllegalArgumentException(
                  s"$ctx: unparsable Content-Length '$lenStr'")
              }
            if (len < 0 || len > Warc.MaxPayloadBytes)
              throw new IllegalArgumentException(
                s"$ctx: Content-Length $len outside [0, ${Warc.MaxPayloadBytes}]")
            val payload = new Array[Byte](len.toInt)
            try in.readFully(payload)
            catch { case _: EOFException =>
              throw new IllegalArgumentException(s"$ctx: EOF inside payload") }
            val sep = new Array[Byte](4)
            try in.readFully(sep)
            catch { case _: EOFException =>
              throw new IllegalArgumentException(s"$ctx: EOF in record separator") }
            if (!(sep(0) == '\r' && sep(1) == '\n' && sep(2) == '\r' && sep(3) == '\n'))
              throw new IllegalArgumentException(s"$ctx: missing CRLF CRLF after payload")
            val wtype = h.getOrElse("warc-type",
              throw new IllegalArgumentException(s"$ctx: missing WARC-Type"))
            val uri = h.getOrElse("warc-target-uri", "")
            val (status, httpCt, httpLoc, body) =
              if (wtype == "response" &&
                  h.getOrElse("content-type", "").startsWith("application/http"))
                parseHttpResponse(payload, ctx)
              else (0, "", "", payload)
            nextRec = WarcRecord(idx, wtype, h.getOrElse("warc-record-id", ""),
              uri, h.getOrElse("warc-date", ""), status, httpCt, httpLoc, body)
            idx += 1
        }
      }

      advance()
      override def hasNext: Boolean = !done
      override def next(): WarcRecord = {
        if (done) throw new NoSuchElementException
        val r = nextRec
        advance()
        r
      }
    }

  /** Split an `application/http;msgtype=response` payload into
    * (status, content-type, location, body).
    */
  private def parseHttpResponse(payload: Array[Byte], ctx: String): (Int, String, String, Array[Byte]) = {
    val in = new ByteArrayInputStream(payload)
    val statusLine = readLine(in, ctx).getOrElse(
      throw new IllegalArgumentException(s"$ctx: empty HTTP payload"))
    if (!statusLine.startsWith("HTTP/1."))
      throw new IllegalArgumentException(s"$ctx: bad HTTP status line '$statusLine'")
    val parts = statusLine.split(" ", 3)
    if (parts.length < 2)
      throw new IllegalArgumentException(s"$ctx: bad HTTP status line '$statusLine'")
    val status =
      try parts(1).toInt
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(s"$ctx: bad HTTP status line '$statusLine'")
      }
    val h = readHeaders(in, ctx)
    if (h.getOrElse("transfer-encoding", "").toLowerCase(java.util.Locale.ROOT)
        .contains("chunked"))
      throw new IllegalArgumentException(
        s"$ctx: chunked transfer encoding is not in the supported subset")
    val body = in.readAllBytes()
    (status, h.getOrElse("content-type", ""), h.getOrElse("location", ""), body)
  }

  /** The `charset=` parameter of a Content-Type value (lowercased), or
    * None when the value carries no parameter (then the body prescan and
    * finally the HTML5 utf-8 default decide — see [[htmlPages]]).
    */
  private[sources] def charsetOf(contentType: String): Option[String] = {
    val lower = contentType.toLowerCase(java.util.Locale.ROOT)
    val at = lower.indexOf("charset=")
    if (at < 0) None
    else Some(lower.substring(at + 8).takeWhile(c => c != ';' && c != ' ')
      .stripPrefix("\"").stripSuffix("\""))
  }

  /** `<meta>` tags in the first 1024 bytes, for [[metaCharset]]'s prescan. */
  private val MetaTagRe = "(?is)<meta\\b[^>]*".r

  /** `charset = value` inside a meta tag — covers both declaration forms
    * (`<meta charset=…>` and `http-equiv` with `content="text/html;
    * charset=…"`, where the pattern matches inside the content value).
    */
  private val CharsetAttrRe = "(?i)charset\\s*=\\s*[\"']?\\s*([A-Za-z0-9_][A-Za-z0-9._\\-]*)".r

  /** HTML5 "prescan a byte stream to determine its encoding"
    * (§13.2.3.2), reduced to the subset a crawl extractor needs: look at
    * the first 1024 BYTES only (the spec's window — a capture must
    * declare its encoding early to count), decode them as Latin-1 (every
    * byte maps, and both declaration forms are ASCII), and take the first
    * `charset=` inside a `<meta…>` tag — which covers `<meta charset=…>`
    * and the legacy `<meta http-equiv="Content-Type" content="text/html;
    * charset=…">` in one rule, quoted or unquoted. Returns the lowercased
    * label; None when the window declares nothing. Only consulted when
    * the HTTP header carries no charset parameter (header wins, per the
    * spec's precedence).
    */
  /** One `name="value"` / `name='value'` / `name=bare` attribute. */
  private val MetaAttrRe =
    """(?i)([a-z][a-z0-9\-]*)\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s"'>]+))""".r

  private[graft] def metaCharset(body: Array[Byte]): Option[String] = {
    val window = new String(body, 0, math.min(body.length, 1024),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    MetaTagRe.findAllIn(window).matchData.flatMap { m =>
      // per the prescan, ONLY two declaration forms count: a `charset`
      // ATTRIBUTE, or `charset=` inside the `content` value of an
      // http-equiv=Content-Type tag. A blind substring scan also matched
      // <meta name="keywords" content="charset=shift_jis tips"> and
      // mis-decoded (or quarantined) a perfectly valid page.
      val attrs = MetaAttrRe.findAllMatchIn(m.matched).map { a =>
        val v = Option(a.group(2)).orElse(Option(a.group(3)))
          .orElse(Option(a.group(4))).getOrElse("")
        a.group(1).toLowerCase(java.util.Locale.ROOT) -> v
      }.toMap
      attrs.get("charset").map(_.trim).filter(_.nonEmpty).orElse {
        if (attrs.get("http-equiv").exists(_.equalsIgnoreCase("content-type")))
          attrs.get("content")
            .flatMap(c => CharsetAttrRe.findFirstMatchIn(c).map(_.group(1)))
        else None
      }
    }.map(_.toLowerCase(java.util.Locale.ROOT)).nextOption()
  }

  /** A successfully captured HTML page — the records [[htmlPages]] and the
    * ingest job extract from.
    */
  def isHtml200(r: WarcRecord): Boolean =
    r.warcType == "response" && r.httpStatus == 200 &&
      r.httpContentType.toLowerCase(java.util.Locale.ROOT).startsWith("text/html")

  /** Decode one HTML response body. Charset precedence: HTTP header
    * parameter, else the [[metaCharset]] body prescan, else the HTML5
    * utf-8 default. Unknown charsets throw with record context.
    */
  def decodeHtml(r: WarcRecord): String = {
    val label = charsetOf(r.httpContentType)
      .orElse(metaCharset(r.body)).getOrElse("utf-8")
    val cs = label match {
      case "utf-8" | "utf8" => java.nio.charset.StandardCharsets.UTF_8
      case "iso-8859-1" | "latin-1" | "latin1" => java.nio.charset.StandardCharsets.ISO_8859_1
      case "us-ascii" | "ascii" => java.nio.charset.StandardCharsets.US_ASCII
      case other => throw new IllegalArgumentException(
        s"record ${r.recIdx} (${r.targetUri}): unsupported charset '$other'")
    }
    new String(r.body, cs)
  }

  /** Decoded HTML pages: (targetUri, html) for every 200 `text/html`
    * response. Non-HTML and non-200 responses are filtered, not errors (a
    * crawl always carries both); decode failures throw ([[decodeHtml]]) —
    * the ingest job's per-page quarantine wraps this when tolerance is
    * wanted.
    */
  def htmlPages(bytes: Array[Byte]): Iterator[(String, String)] =
    records(bytes).filter(isHtml200).map(r => (r.targetUri, decodeHtml(r)))
}
