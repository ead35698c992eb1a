package graft.media

import scala.collection.mutable

/** Subset rasterizer for BORN-DIGITAL (vector/text) PDF pages — the third
  * leg of the PDF story next to [[PdfPages]] (embedded-raster scans) and
  * [[PdfText]] (native text extraction). The reference renders ANY page to
  * pixels with pdfium at scale = dpi/72
  * (`/root/reference/src/churro_ocr/_internal/pdf.py:20-54`); pdfium is
  * absent offline, so this covers the deterministic subset honestly and
  * rejects the rest loudly:
  *
  *  - axis-aligned rectangle path fills: `re` + `f`/`F` (nonzero winding;
  *    `f*` even-odd is rejected — it diverges on overlapping subpaths),
  *    `n` no-op paint;
  *  - fill color: `rg` (RGB 0..1) and `g` (gray); stroke-color ops
  *    (RG/G/K) are consumed-ignored since stroking itself is rejected;
  *    CMYK/ICC fill (`k`/`cs`/`sc`/`scn`) is rejected (no profile math
  *    offline);
  *  - graphics state: `q`/`Q` save/restore, `cm` TRANSLATION-ONLY (any
  *    scale/rotation/skew throws);
  *  - text: the same BT/ET operator subset as [[PdfText]] (Td, TD, Tm,
  *    T-star, TL positioning; Tj/'/"/TJ shows; per-font /ToUnicode CMap or
  *    Latin-1/UTF-16BE-BOM string decoding), drawn with the built-in
  *    [[GlyphFont]] 5×7 bitmaps: glyph cell height = GlyphH × iscale where
  *    iscale = max(1, rint(fontSize·s/GlyphH)), lowercase ASCII upcases
  *    into the single-case font, space advances one cell, any other
  *    unmapped character THROWS (silently-blank text is the failure mode
  *    this module exists to avoid);
  *  - curves (c/v/y), line paths (m/l/h), stroking (S/s/B…), clipping
  *    (W/W*), shading (sh), XObjects (Do), inline images (BI) all throw
  *    with a reason.
  *
  * Pixel rules (the differential contract with the pure-Python twin,
  * tools/gen_pdfraster_fixture.py): scale s = dpi/72; canvas
  * W×H = rint(mbW·s)×rint(mbH·s) white RGB; all user→device rounding is
  * rint (half-even, matching Python round()); y flips device-down; a rect
  * covers device columns [rint(x·s), rint((x+w)·s)) and rows
  * [H−rint((y+h)·s), H−rint(y·s)); a glyph run's top-left is
  * (rint(tx·s), H−rint(ty·s)−GlyphH·iscale) and runs advance a
  * pixel-space pen by (GlyphW+1)·iscale per cell.
  */
object PdfRaster {

  final case class RasterPage(pageIndex: Int, image: ImageDecode.Decoded)

  private val MediaBoxRe =
    """/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s*\]""".r

  /** Ops with no effect on the rasterized subset (stroke state/color, text
    * spacing we have no metrics for, marked content). Everything not here,
    * not a supported op, throws.
    */
  private val IgnoredOps: Set[String] = Set(
    "RG", "G", "K", "gs", "w", "J", "j", "M", "d", "ri", "i",
    "Tc", "Tw", "Tz", "Ts", "Tr", "BMC", "BDC", "EMC", "MP", "DP")

  private final case class GState(fill: (Int, Int, Int), tx: Double, ty: Double)

  def rasterize(pdfBytes: Array[Byte], dpi: Int): Vector[RasterPage] = {
    import PdfPages._
    require(dpi > 0, "dpi must be positive")
    require(pdfBytes.length > 8 && latin1(pdfBytes, 0, 5) == "%PDF-", "not a PDF")
    val objs = xrefOffsets(pdfBytes).map { case (num, off) =>
      num -> parseObjectAt(pdfBytes, num, off)
    }
    val pagesNode = objs.values.find(o => o.dict.contains("/Type /Pages") || o.dict.contains("/Type/Pages"))
      .getOrElse(throw new IllegalArgumentException("no /Pages node"))
    val kids = KidsRe.findFirstMatchIn(pagesNode.dict)
      .map(m => RefRe.findAllMatchIn(m.group(1)).map(_.group(1).toInt).toVector)
      .getOrElse(Vector.empty)
    require(kids.nonEmpty, "empty /Kids")
    kids.zipWithIndex.map { case (pageNum, pageIdx) =>
      val page = objs.getOrElse(pageNum,
        throw new IllegalArgumentException(s"missing page object $pageNum"))
      val mb = MediaBoxRe.findFirstMatchIn(page.dict)
        .orElse(MediaBoxRe.findFirstMatchIn(pagesNode.dict))
        .getOrElse(throw new IllegalArgumentException(s"page $pageNum: no /MediaBox"))
      val (x0, y0, mbW, mbH) =
        (mb.group(1).toDouble, mb.group(2).toDouble, mb.group(3).toDouble, mb.group(4).toDouble)
      require(x0 == 0.0 && y0 == 0.0, s"page $pageNum: non-origin MediaBox unsupported")
      val fonts = PdfText.pageFonts(pdfBytes, page, objs, pageNum)
      RasterPage(pageIdx,
        render(contentText(pdfBytes, page, objs), fonts, mbW, mbH, dpi, pageNum))
    }
  }

  // one glyph cell (glyph + spacing column), in pixels, at integer scale
  private def cellW(iscale: Int): Int = (GlyphFont.GlyphW + GlyphFont.Spacing) * iscale

  private def render(content: String, fonts: Map[String, PdfText.CMapFont],
                     mbW: Double, mbH: Double, dpi: Int, pageNum: Int): ImageDecode.Decoded = {
    import PdfText.{TArrClose, TArrOpen, TName, TNum, TOp, TStr, Tok}
    val s = dpi / 72.0
    val w = math.rint(mbW * s).toInt
    val h = math.rint(mbH * s).toInt
    require(w > 0 && h > 0, s"page $pageNum: degenerate canvas ${w}x$h")
    val rgb = Array.fill[Byte](w * h * 3)(0xFF.toByte) // white

    def px(u: Double): Int = math.rint(u * s).toInt

    def fillRect(ux: Double, uy: Double, uw: Double, uh: Double, c: (Int, Int, Int)): Unit = {
      val cx0 = math.max(0, px(ux)); val cx1 = math.min(w, px(ux + uw))
      val ry0 = math.max(0, h - px(uy + uh)); val ry1 = math.min(h, h - px(uy))
      var y = ry0
      while (y < ry1) {
        var x = cx0
        while (x < cx1) {
          val o = (y * w + x) * 3
          rgb(o) = c._1.toByte; rgb(o + 1) = c._2.toByte; rgb(o + 2) = c._3.toByte
          x += 1
        }
        y += 1
      }
    }

    def drawCells(text: String, xPx: Int, topPx: Int, iscale: Int, c: (Int, Int, Int)): Int = {
      // returns the pen advance in pixels; throws on unmapped glyphs
      var penDx = 0
      var ci = 0
      while (ci < text.length) {
        val up = {
          val ch = text.charAt(ci)
          if (ch >= 'a' && ch <= 'z') (ch - 32).toChar else ch
        }
        if (up != ' ') {
          val glyph = GlyphFont.rows.getOrElse(up, throw new IllegalArgumentException(
            s"page $pageNum: character '$up' (U+${up.toInt.toHexString.toUpperCase}) " +
              "is outside the built-in glyph font"))
          var r = 0
          while (r < GlyphFont.GlyphH) {
            val bits = glyph(r)
            var gc = 0
            while (gc < GlyphFont.GlyphW) {
              if ((bits & (1 << (GlyphFont.GlyphW - 1 - gc))) != 0) {
                // iscale×iscale block per font-bit
                var by = 0
                while (by < iscale) {
                  val yy = topPx + r * iscale + by
                  if (yy >= 0 && yy < h) {
                    var bx = 0
                    while (bx < iscale) {
                      val xx = xPx + penDx + gc * iscale + bx
                      if (xx >= 0 && xx < w) {
                        val o = (yy * w + xx) * 3
                        rgb(o) = c._1.toByte; rgb(o + 1) = c._2.toByte; rgb(o + 2) = c._3.toByte
                      }
                      bx += 1
                    }
                  }
                  by += 1
                }
              }
              gc += 1
            }
            r += 1
          }
        }
        penDx += cellW(iscale)
        ci += 1
      }
      penDx
    }

    val toks = PdfText.tokenize(content)
    var st = GState((0, 0, 0), 0.0, 0.0)
    val stack = mutable.Stack.empty[GState]
    val rects = mutable.ArrayBuffer.empty[(Double, Double, Double, Double)]
    var inText = false
    var lineX = 0.0; var lineY = 0.0
    var leading = 0.0
    var fontSize = 0.0
    var penPx = 0 // pixel-space pen offset within the current line position
    var curCMap: Option[PdfText.CMapFont] = None
    val operands = mutable.ArrayBuffer.empty[Tok]
    var arr: mutable.ArrayBuffer[Tok] = null
    var arrDone: Vector[Tok] = null

    def num(t: Tok): Double = t match {
      case TNum(v) => v
      case other => throw new IllegalArgumentException(s"expected number, got $other")
    }
    def colorByte(v: Double): Int = {
      require(v >= 0.0 && v <= 1.0, s"color component $v outside [0,1]")
      math.rint(v * 255).toInt
    }
    def decodeShow(raw: String): String = curCMap match {
      case Some(cm) => cm.decode(raw)
      case None if raw.length >= 2 && raw.charAt(0) == 0xFE.toChar && raw.charAt(1) == 0xFF.toChar =>
        PdfText.decodeBomUtf16(raw)
      case None => raw
    }
    def iscale: Int = {
      require(fontSize > 0, "show before Tf set a font size")
      math.max(1, math.rint(fontSize * s / GlyphFont.GlyphH).toInt)
    }
    def show(text: String): Unit = {
      require(inText, "text-show operator outside BT/ET")
      if (text.nonEmpty) {
        val isc = iscale
        val topPx = h - px(lineY + st.ty) - GlyphFont.GlyphH * isc
        penPx += drawCells(text, px(lineX + st.tx) + penPx, topPx, isc, st.fill)
      }
    }
    def nextLine(): Unit = { lineY -= leading; penPx = 0 }

    toks.foreach {
      case TArrOpen =>
        require(arr == null, "nested array in content stream")
        arr = mutable.ArrayBuffer.empty[Tok]
      case TArrClose =>
        require(arr != null, "unbalanced ]")
        operands += TArrOpen
        arrDone = arr.toVector
        arr = null
      case t if arr != null => arr += t
      case TOp(op) =>
        op match {
          case "q" => stack.push(st)
          case "Q" =>
            require(stack.nonEmpty, "Q with empty graphics-state stack")
            st = stack.pop()
          case "cm" =>
            require(operands.length >= 6, "cm needs 6 operands")
            val Seq(a, b, c, d, e, f) = operands.takeRight(6).map(num).toSeq
            require(a == 1.0 && b == 0.0 && c == 0.0 && d == 1.0,
              s"page $pageNum: non-translation cm unsupported (a=$a b=$b c=$c d=$d)")
            st = st.copy(tx = st.tx + e, ty = st.ty + f)
          case "rg" =>
            require(operands.length >= 3, "rg needs 3 operands")
            val Seq(r, g, b) = operands.takeRight(3).map(num).toSeq
            st = st.copy(fill = (colorByte(r), colorByte(g), colorByte(b)))
          case "g" =>
            val v = colorByte(num(operands.last))
            st = st.copy(fill = (v, v, v))
          case "re" =>
            require(operands.length >= 4, "re needs 4 operands")
            val Seq(x, y, rw, rh) = operands.takeRight(4).map(num).toSeq
            require(rw > 0 && rh > 0, s"page $pageNum: non-positive re ${rw}x$rh")
            rects += ((x + st.tx, y + st.ty, rw, rh))
          case "f" | "F" =>
            rects.foreach { case (x, y, rw, rh) => fillRect(x, y, rw, rh, st.fill) }
            rects.clear()
          case "n" => rects.clear()
          case "BT" => inText = true; lineX = 0.0; lineY = 0.0; penPx = 0
          case "ET" => inText = false
          case "Tf" =>
            require(operands.length >= 2, "Tf needs /Name size")
            operands(operands.length - 2) match {
              case TName(n) => curCMap = fonts.get(n)
              case other => throw new IllegalArgumentException(s"Tf on $other")
            }
            fontSize = num(operands.last)
            require(fontSize > 0, s"page $pageNum: non-positive font size $fontSize")
          case "Td" =>
            require(operands.length >= 2, "Td needs 2 operands")
            lineX += num(operands(operands.length - 2)); lineY += num(operands.last)
            penPx = 0
          case "TD" =>
            require(operands.length >= 2, "TD needs 2 operands")
            val ty = num(operands.last)
            leading = -ty
            lineX += num(operands(operands.length - 2)); lineY += ty
            penPx = 0
          case "Tm" =>
            require(operands.length >= 6, "Tm needs 6 operands")
            val Seq(a, b, c, d, e, f) = operands.takeRight(6).map(num).toSeq
            require(b == 0.0 && c == 0.0 && a == 1.0 && d == 1.0,
              s"scaled/rotated/skewed text matrix unsupported (a=$a b=$b c=$c d=$d)")
            lineX = e; lineY = f
            penPx = 0
          case "T*" => nextLine()
          case "TL" => leading = num(operands.last)
          case "Tj" =>
            operands.last match {
              case TStr(raw) => show(decodeShow(raw))
              case other => throw new IllegalArgumentException(s"Tj on $other")
            }
          case "'" =>
            nextLine()
            operands.last match {
              case TStr(raw) => show(decodeShow(raw))
              case other => throw new IllegalArgumentException(s"' on $other")
            }
          case "\"" =>
            require(operands.length >= 3, "\" needs aw ac string")
            nextLine()
            operands.last match {
              case TStr(raw) => show(decodeShow(raw))
              case other => throw new IllegalArgumentException(s"\" on $other")
            }
          case "TJ" =>
            require(operands.lastOption.contains(TArrOpen) && arrDone != null, "TJ without array")
            val sb = new StringBuilder
            arrDone.foreach {
              case TStr(seg) => sb ++= decodeShow(seg)
              case TNum(v) => if (v <= PdfText.KernSpaceThreshold) sb += ' '
              case other => throw new IllegalArgumentException(s"TJ array element $other")
            }
            arrDone = null
            show(sb.toString)
          case known if IgnoredOps(known) => // stroke/spacing state: no raster effect
          case unknown =>
            // LOUD contract: curves, line paths, stroking, clipping,
            // shading, XObjects, inline images — anything we cannot render
            // bit-exactly is rejected, never approximated
            throw new IllegalArgumentException(
              s"page $pageNum: content-stream operator '$unknown' is outside the raster subset")
        }
        operands.clear()
      case t => operands += t
    }
    require(arr == null, "unterminated [ array")
    require(rects.isEmpty, s"page $pageNum: path constructed but never painted")
    ImageDecode.Decoded(w, h, rgb)
  }
}
