package graft.media

import java.nio.charset.StandardCharsets

/** Scanned-PDF page extraction — the real half of `rasterize_pdf`
  * (`/root/reference/src/churro_ocr/_internal/pdf.py:20-54`) that this
  * sandbox can implement without pdfium: the reference's input corpus is
  * scanned documents, whose PDFs are containers of one raster image per
  * page, so "rasterize" degenerates to extracting each page's embedded
  * image (at its native resolution — no vector/text rendering, which would
  * need a full PDF renderer).
  *
  * Supported subset (documented contract, validated on fixtures built by an
  * independent pure-Python writer, tools/gen_pdf_fixture.py):
  *  - classic cross-reference PDFs with uncompressed object headers,
  *  - page order from the /Kids array of the root /Pages node,
  *  - one /Subtype /Image XObject per page, referenced from the page's
  *    /Resources /XObject dict,
  *  - /Filter /FlateDecode + /DeviceRGB/8-bit (raw RGB rows) or
  *    /DCTDecode (the stream IS a JPEG — handed to [[ImageDecode.decode]]).
  */
object PdfPages {

  final case class PdfPage(pageIndex: Int, image: ImageDecode.Decoded)

  private val ObjRe = """(?s)(\d+)\s+0\s+obj(.*?)endobj""".r
  private val KidsRe = """/Kids\s*\[([^\]]*)\]""".r
  private val RefRe = """(\d+)\s+0\s+R""".r
  private val XObjectRefRe = """/XObject\s*<<([^>]*)>>""".r
  private val IntKeyRe = Map(
    "Width" -> """/Width\s+(\d+)""".r,
    "Height" -> """/Height\s+(\d+)""".r,
    "Length" -> """/Length\s+(\d+)""".r)

  /** Latin-1 view of the bytes: 1:1 byte↔char, so regex offsets are byte
    * offsets and binary stream payloads survive round-trips.
    */
  private def latin1(bytes: Array[Byte]): String =
    new String(bytes, StandardCharsets.ISO_8859_1)

  private final case class PdfObject(num: Int, body: String, bodyOffset: Int)

  private def objects(text: String): Map[Int, PdfObject] =
    ObjRe.findAllMatchIn(text).map { m =>
      m.group(1).toInt -> PdfObject(m.group(1).toInt, m.group(2), m.start(2))
    }.toMap

  private def intKey(body: String, key: String): Option[Int] =
    IntKeyRe(key).findFirstMatchIn(body).map(_.group(1).toInt)

  /** Stream payload of an object: bytes between `stream\n` and `endstream`,
    * sized by /Length.
    */
  private def streamData(bytes: Array[Byte], obj: PdfObject): Array[Byte] = {
    val body = obj.body
    val len = intKey(body, "Length").getOrElse(
      throw new IllegalArgumentException(s"object ${obj.num}: stream without /Length"))
    val marker = body.indexOf("stream")
    require(marker >= 0, s"object ${obj.num}: no stream")
    var start = marker + "stream".length
    if (start < body.length && body.charAt(start) == '\r') start += 1
    if (start < body.length && body.charAt(start) == '\n') start += 1
    val abs = obj.bodyOffset + start
    java.util.Arrays.copyOfRange(bytes, abs, abs + len)
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 4)
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0 && inf.needsInput()) throw new IllegalArgumentException("truncated Flate stream")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  private def decodeImageObject(bytes: Array[Byte], obj: PdfObject): ImageDecode.Decoded = {
    val body = obj.body
    val data = streamData(bytes, obj)
    if (body.contains("/DCTDecode")) {
      ImageDecode.decode(data) // the stream is a JPEG
    } else if (body.contains("/FlateDecode")) {
      require(body.contains("/DeviceRGB"), s"object ${obj.num}: unsupported colorspace")
      val w = intKey(body, "Width").get
      val h = intKey(body, "Height").get
      val raw = inflate(data)
      require(raw.length == w * h * 3,
        s"object ${obj.num}: expected ${w * h * 3} RGB bytes, got ${raw.length}")
      ImageDecode.Decoded(w, h, raw)
    } else throw new IllegalArgumentException(s"object ${obj.num}: unsupported /Filter")
  }

  /** Extract the per-page images in /Kids order — the reference's page
    * fan-out (`pdf.py:36-50`: one image per page, `page_index` sequential).
    */
  def pages(pdfBytes: Array[Byte]): Vector[PdfPage] = {
    val text = latin1(pdfBytes)
    require(text.startsWith("%PDF"), "not a PDF")
    val objs = objects(text)
    val pagesNode = objs.values.find(o => o.body.contains("/Type /Pages") || o.body.contains("/Type/Pages"))
      .getOrElse(throw new IllegalArgumentException("no /Pages node"))
    val kids = KidsRe.findFirstMatchIn(pagesNode.body)
      .map(m => RefRe.findAllMatchIn(m.group(1)).map(_.group(1).toInt).toVector)
      .getOrElse(Vector.empty)
    kids.zipWithIndex.map { case (pageNum, idx) =>
      val page = objs.getOrElse(pageNum,
        throw new IllegalArgumentException(s"missing page object $pageNum"))
      val imgRef = XObjectRefRe.findFirstMatchIn(page.body)
        .flatMap(m => RefRe.findFirstMatchIn(m.group(1)).map(_.group(1).toInt))
        .getOrElse(throw new IllegalArgumentException(s"page $pageNum: no image XObject"))
      PdfPage(idx, decodeImageObject(pdfBytes, objs(imgRef)))
    }
  }
}
