package graft.layout

import graft.layout.PageSegment.Box
import graft.media.GlyphFont

/** Deterministic template OCR for pages typeset in the built-in
  * [[GlyphFont]] — the recognizer that closes the end-to-end loop
  * PDF bytes → rasterize ([[graft.media.PdfRaster]]) → segment
  * ([[PageSegment]]) → TEXT SPANS, with no model in the path. The
  * reference's OCR step is a hosted vision model (an external black box
  * per SURVEY §1); this is its deterministic counterpart for the
  * synthetic born-digital class, which keeps every downstream contract —
  * spans, reading order, byte-equality — testable offline.
  *
  * Recognition is a phase search with an EXACT acceptance test: for each
  * candidate integer glyph scale (from the line height) and each
  * (vertical, horizontal) grid phase, sample one pixel per font bit,
  * map each 5×7 cell pattern through the inverted glyph table (all-blank
  * cell = space), then RE-RENDER the recognized cells and require
  * pixel-exact equality with the line's ink. The re-render check makes
  * false positives impossible — a scrawl or a rectangle fill can match a
  * sparse glyph pattern at some phase, but it cannot reproduce the ink it
  * was sampled from unless the recognition is exactly right. First exact
  * phase in deterministic scan order wins; no phase → unrecognized.
  * The fixture twin (tools/gen_pdfraster_fixture.py) mirrors the same
  * search verbatim over pixel-identical renders.
  */
object GlyphOcr {

  final case class OcrLine(box: Box, iscale: Int, kind: String, text: String)

  /** 35-bit packed pattern (7 rows × 5 bits, top row in the high bits) →
    * glyph: the inverted font table keyed by a primitive Long, so the
    * per-cell lookup in the phase search is one Long map probe instead of
    * an Array→Seq copy + structural hash (the phase search runs up to
    * 42·isc² lookups per candidate scale on a block that defeats the
    * ink-count gate).
    */
  private val inverse: scala.collection.immutable.LongMap[Char] =
    scala.collection.immutable.LongMap.from(
      GlyphFont.rows.iterator.map { case (c, bits) =>
        bits.foldLeft(0L)((k, b) => (k << GlyphFont.GlyphW) | b) -> c
      })

  private val CellW = GlyphFont.GlyphW + GlyphFont.Spacing

  /** Recognize one line box; None when no (scale, phase) re-renders
    * pixel-exactly.
    */
  def recognizeLine(ink: PageSegment.Mask, w: Int, line: Box): Option[(String, Int)] = {
    val h = line.height
    // exact pre-gate: an ACCEPTED phase re-renders the line as disjoint
    // isc×isc blocks (one per lit font bit, all on an isc lattice), so the
    // line's ink count must be a multiple of isc². Counting once up front
    // skips entire scale candidates — without it, a large non-glyph region
    // (an image block hundreds of pixels tall) pays a GlyphH·isc × CellW·isc
    // phase scan at a scale no glyph render can ever match. Result-neutral:
    // the divisibility is a necessary condition of the acceptance test.
    // word-level popcount rows, not per-bit reads: the large non-glyph
    // region this gate exists to skip is exactly where a bit-at-a-time
    // O(area) scan would cost more than the gate saves
    var inkCount = 0
    var cy = line.y0
    while (cy < line.y1) {
      inkCount += ink.popCount(cy * w + line.x0, cy * w + line.x1)
      cy += 1
    }
    // candidate scales: an accepted phase re-renders the line as isc×isc
    // blocks, and the line box is the exact ink bbox, so h is EXACTLY
    // isc·k for the k ∈ [1, GlyphH] bit-rows the text's ink spans. Full-
    // height text has k = GlyphH (isc = h/GlyphH, the smallest candidate,
    // tried first — normal lines pay nothing extra), but an all-short-glyph
    // line ('-----', '...') spans fewer bit-rows, so every divisor of h
    // down to h/GlyphH is a legal scale. Each stays behind the ink-count
    // gate above.
    val lo = math.max(1, (h + GlyphFont.GlyphH - 1) / GlyphFont.GlyphH)
    val cands = (lo to h).filter(d => h % d == 0 && inkCount % (d * d) == 0)
    // phase-search working state, allocated ONCE per line and reused across
    // every (scale, phase): the re-render mask is epoch-stamped (a pixel is
    // lit iff it holds the current phase's epoch), so a failing phase costs
    // no Arrays.fill and no fresh allocation — a non-glyph block that slips
    // past the ink-count gate used to allocate (and zero) a line-sized
    // Boolean mask for each of up to 42·isc² phases per scale
    val lw = line.width
    val rendered = new Array[Int](lw * h)
    val sb = new java.lang.StringBuilder
    var epoch = 0
    cands.foreach { isc =>
      val cellW = CellW * isc
      var q = 0
      while (q < GlyphFont.GlyphH * isc) {
        val gridTop = line.y0 - q
        var p = 0
        while (p < cellW) {
          val gridLeft = line.x0 - p
          if (epoch == Int.MaxValue) { java.util.Arrays.fill(rendered, 0); epoch = 0 }
          epoch += 1
          recognizeAt(ink, w, line, gridLeft, gridTop, isc, rendered, epoch, sb) match {
            case Some(text) => return Some((text, isc))
            case None =>
          }
          p += 1
        }
        q += 1
      }
    }
    None
  }

  /** Try one grid placement: sample, map, re-render, compare. No
    * allocation on the (overwhelmingly common) failing path — `rendered`,
    * `sb`, and the packed-pattern accumulator are caller-owned and reused;
    * a pixel of the epoch-stamped mask is lit iff it equals this phase's
    * `epoch`. Block painting is DEFERRED until a cell's pattern resolves in
    * the inverse table, so a cell that rejects costs only the 35 sample
    * reads, never the isc×isc fills.
    */
  private def recognizeAt(ink: PageSegment.Mask, w: Int, line: Box,
                          gridLeft: Int, gridTop: Int, isc: Int,
                          rendered: Array[Int], epoch: Int,
                          sb: java.lang.StringBuilder): Option[String] = {
    val cellW = CellW * isc
    val nCells = {
      val span = line.x1 - gridLeft
      (span + cellW - 1) / cellW
    }
    val lw = line.width
    sb.setLength(0)
    var c = 0
    while (c < nCells) {
      val cx = gridLeft + c * cellW
      var packed = 0L
      var r = 0
      while (r < GlyphFont.GlyphH) {
        var rowBits = 0
        var g = 0
        while (g < GlyphFont.GlyphW) {
          val x = cx + g * isc
          val y = gridTop + r * isc
          // only ink INSIDE the line box counts: the box is the line's
          // exact ink bbox, and a neighboring block's ink must not leak in
          if (x >= line.x0 && x < line.x1 && y >= line.y0 && y < line.y1 &&
              ink(y * w + x)) {
            // a lit bit whose isc×isc block would extend OUTSIDE the box =
            // bleed = immediate reject (a correct phase never has one)
            if (x + isc > line.x1 || y + isc > line.y1) return None
            rowBits |= 1 << (GlyphFont.GlyphW - 1 - g)
          }
          g += 1
        }
        packed = (packed << GlyphFont.GlyphW) | rowBits
        r += 1
      }
      if (packed == 0L) sb.append(' ')
      else inverse.get(packed) match {
        case Some(ch) =>
          sb.append(ch)
          // the cell resolved — NOW paint its blocks (re-derived from the
          // packed bits; top row sits in the high bits)
          var pr = 0
          var shift = (GlyphFont.GlyphH - 1) * GlyphFont.GlyphW
          while (pr < GlyphFont.GlyphH) {
            val bits = ((packed >>> shift) & ((1 << GlyphFont.GlyphW) - 1)).toInt
            var g = 0
            while (g < GlyphFont.GlyphW) {
              if ((bits & (1 << (GlyphFont.GlyphW - 1 - g))) != 0) {
                val x = cx + g * isc
                val y = gridTop + pr * isc
                var dy = 0
                while (dy < isc) {
                  val base = (y + dy - line.y0) * lw + (x - line.x0)
                  var dx = 0
                  while (dx < isc) { rendered(base + dx) = epoch; dx += 1 }
                  dy += 1
                }
              }
              g += 1
            }
            shift -= GlyphFont.GlyphW
            pr += 1
          }
        case None => return None
      }
      c += 1
    }
    val text = sb.toString.trim
    if (text.isEmpty) return None
    // exact acceptance: the re-render must equal the line's ink, pixel
    // for pixel — false reads are structurally impossible
    var y = line.y0
    while (y < line.y1) {
      var x = line.x0
      while (x < line.x1) {
        if (ink(y * w + x) !=
            (rendered((y - line.y0) * lw + (x - line.x0)) == epoch))
          return None
        x += 1
      }
      y += 1
    }
    Some(text)
  }

  /** Full page: XY-cut blocks in reading order, each block's projection
    * lines recognized independently.
    */
  def recognizePage(img: graft.media.ImageDecode.Decoded): Vector[(Int, Int, OcrLine)] = {
    val ink = PageSegment.inkMask(img)
    PageSegment.xyCut(ink, img.width, Box(0, 0, img.width, img.height))
      .zipWithIndex.flatMap { case (blk, bi) =>
        PageSegment.lineBoxes(ink, img.width, blk).zipWithIndex.map { case (ln, li) =>
          recognizeLine(ink, img.width, ln) match {
            case Some((text, isc)) => (bi, li, OcrLine(ln, isc, "text", text))
            case None => (bi, li, OcrLine(ln, -1, "unrecognized", ""))
          }
        }
      }
  }
}
