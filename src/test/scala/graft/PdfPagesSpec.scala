package graft

import graft.media.{ImageDecode, PdfPages}
import org.scalatest.funsuite.AnyFunSuite

/** Scanned-PDF page extraction vs the independent Python PDF writer's
  * pre-embedding pixel digests (tools/gen_pdf_fixture.py).
  */
class PdfPagesSpec extends AnyFunSuite {

  private def pdf(name: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"src/test/resources/media/$name"))

  /** Same deterministic pattern as the Python generator. */
  private def pattern(w: Int, h: Int, seed: Int): Array[Byte] = {
    val out = new Array[Byte](w * h * 3)
    var i = 0
    for (y <- 0 until h; x <- 0 until w) {
      out(i) = ((x * 5 + y * 11 + seed * 37) % 256).toByte
      out(i + 1) = ((x * 13 + y * 3 + seed * 19) % 256).toByte
      out(i + 2) = ((x * 2 + y * 7 + seed * 41) % 256).toByte
      i += 3
    }
    out
  }

  test("page fan-out in /Kids order with exact Flate RGB pixels") {
    val specs = Map(
      "pdf_00.pdf" -> Seq((24, 16, 0), (16, 24, 1)),
      "pdf_01.pdf" -> Seq((32, 32, 2)),
      "pdf_02.pdf" -> Seq((8, 8, 3), (40, 10, 4), (10, 40, 5)))
    specs.foreach { case (name, pages) =>
      val got = PdfPages.pages(pdf(name))
      assert(got.length == pages.length, name)
      got.zip(pages).zipWithIndex.foreach { case ((p, (w, h, s)), idx) =>
        assert(p.pageIndex == idx)
        assert(p.image.width == w && p.image.height == h, s"$name page $idx dims")
        assert(p.image.rgb.toSeq == pattern(w, h, s).toSeq, s"$name page $idx pixels")
      }
    }
  }

  test("multi-strip page composites top-to-bottom by cm placement") {
    // pdf_03 page 0: three 20-wide strips (heights 6/10/4) drawn BOTTOM-UP
    // in the content stream — the extractor must order by ty, not by
    // stream/dict order; page 1 is a plain single-image page
    val got = PdfPages.pages(pdf("pdf_03.pdf"))
    assert(got.length == 2)
    val p0 = got(0).image
    assert(p0.width == 20 && p0.height == 20)
    val expected = pattern(20, 6, 6) ++ pattern(20, 10, 7) ++ pattern(20, 4, 8)
    assert(p0.rgb.toSeq == expected.toSeq)
    val p1 = got(1).image
    assert(p1.width == 12 && p1.height == 12)
    assert(p1.rgb.toSeq == pattern(12, 12, 9).toSeq)
  }

  /** Minimal classic-xref PDF builder (offset-tracked). */
  private class PdfBuilder {
    private val body = new java.io.ByteArrayOutputStream()
    private val offsets = scala.collection.mutable.SortedMap.empty[Int, Int]
    body.write("%PDF-1.4\n".getBytes("ISO-8859-1"))
    def obj(num: Int, dict: String, stream: Option[Array[Byte]] = None): Unit = {
      offsets(num) = body.size()
      body.write(s"$num 0 obj\n$dict\n".getBytes("ISO-8859-1"))
      stream.foreach { data =>
        body.write("stream\n".getBytes("ISO-8859-1"))
        body.write(data)
        body.write("\nendstream\n".getBytes("ISO-8859-1"))
      }
      body.write("endobj\n".getBytes("ISO-8859-1"))
    }
    def build(): Array[Byte] = {
      val xrefAt = body.size()
      val maxNum = offsets.keys.max
      val sb = new StringBuilder(s"xref\n0 ${maxNum + 1}\n0000000000 65535 f \n")
      (1 to maxNum).foreach(n => sb.append(f"${offsets.getOrElse(n, 0)}%010d 00000 n \n"))
      sb.append(s"trailer\n<< /Size ${maxNum + 1} /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
      body.write(sb.toString.getBytes("ISO-8859-1"))
      body.toByteArray
    }
  }

  test("DCTDecode pages + indirect /Length: the stream is a JPEG handed to ImageIO") {
    val (w, h) = (20, 12)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (x * 12) << 16 | (y * 20) << 8)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val jpeg = bos.toByteArray
    val expected = ImageDecode.decode(jpeg)
    val b = new PdfBuilder
    b.obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    b.obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.obj(3, s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 $w $h] " +
      "/Resources << /XObject << /Im0 4 0 R >> >> >>")
    // /Length as an INDIRECT reference — common in real classic-xref writers
    b.obj(4, s"<< /Type /XObject /Subtype /Image /Width $w /Height $h " +
      s"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /DCTDecode /Length 5 0 R >>",
      stream = Some(jpeg))
    b.obj(5, jpeg.length.toString)
    val got = PdfPages.pages(b.build())
    assert(got.length == 1)
    assert(got.head.image.width == w && got.head.image.height == h)
    assert(got.head.image.rgb.toSeq == expected.rgb.toSeq)
  }

  test("rotated, mis-scaled or non-tiling strip placements are rejected") {
    import java.nio.charset.StandardCharsets.ISO_8859_1
    // pdf_03 is the 2-strip page; its content stream is uncompressed
    // `q w 0 0 h tx ty cm /ImN Do Q` lines — same-length byte surgery keeps
    // /Length valid while corrupting exactly one matrix term
    val raw = new String(pdf("pdf_03.pdf"), ISO_8859_1)
    def mutated(re: String, repl: String): Array[Byte] = {
      val out = raw.replaceFirst(re, repl)
      assert(out != raw, s"surgery pattern $re did not match")
      assert(out.length == raw.length, "surgery must preserve /Length")
      out.getBytes(ISO_8859_1)
    }
    // b != 0: rotated/skewed matrix
    val rot = intercept[IllegalArgumentException](PdfPages.pages(
      mutated("""q (\d+) 0 0 (\d+) 0 (\d+) cm /Im""", "q $1 1 0 $2 0 $3 cm /Im")))
    assert(rot.getMessage.contains("rotated/skewed"))
    // a != strip pixel width: non-1:1 scaling (leading digit bumped, 20→90)
    val scaled = intercept[IllegalArgumentException](PdfPages.pages(
      mutated("""q 2(\d*) 0 0 (\d+) 0 (\d+) cm /Im""", "q 9$1 0 0 $2 0 $3 cm /Im")))
    assert(scaled.getMessage.contains("non-1:1"))
    // bottom strip moved up 5 units: gap/overlap in the tiling
    val gap = intercept[IllegalArgumentException](PdfPages.pages(
      mutated(""" 0 cm /Im""", " 5 cm /Im")))
    assert(gap.getMessage.contains("tile contiguously"))
    // tx misaligned between strips
    val shift = intercept[IllegalArgumentException](PdfPages.pages(
      mutated("""(\d) 0 (\d+) cm /Im""", "$1 7 $2 cm /Im")))
    assert(shift.getMessage.contains("x-aligned"))
  }

  test("unsupported inputs fail loudly, not silently") {
    intercept[IllegalArgumentException](PdfPages.pages("not a pdf".getBytes))
    intercept[IllegalArgumentException](
      PdfPages.pages("%PDF-1.4\n1 0 obj\n<< >>\nendobj\n".getBytes))
    // multi-XObject page WITHOUT content-stream placements: rejected (the
    // strip order would be a guess), never half-returned
    val raw = Array.fill[Byte](4 * 4 * 3)(9)
    val flate = {
      val d = new java.util.zip.Deflater(); d.setInput(raw); d.finish()
      val out = new Array[Byte](256); val n = d.deflate(out); d.end()
      java.util.Arrays.copyOf(out, n)
    }
    val b = new PdfBuilder
    b.obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    b.obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.obj(3, "<< /Type /Page /Parent 2 0 R " +
      "/Resources << /XObject << /Im0 4 0 R /Im1 4 0 R >> >> >>")
    b.obj(4, "<< /Type /XObject /Subtype /Image /Width 4 /Height 4 " +
      s"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /FlateDecode /Length ${flate.length} >>",
      stream = Some(flate))
    val ex = intercept[IllegalArgumentException](PdfPages.pages(b.build()))
    assert(ex.getMessage.contains("no parsable content-stream placements"))
    // overstated /Length (truncated file): loud bounds failure, no zero-pad
    val b2 = new PdfBuilder
    b2.obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    b2.obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b2.obj(3, "<< /Type /Page /Parent 2 0 R /Resources << /XObject << /Im0 4 0 R >> >> >>")
    b2.obj(4, "<< /Type /XObject /Subtype /Image /Width 4 /Height 4 " +
      "/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /FlateDecode /Length 999999 >>",
      stream = Some(flate))
    val ex2 = intercept[IllegalArgumentException](PdfPages.pages(b2.build()))
    assert(ex2.getMessage.contains("overruns"))
  }

  test("hostile Flate image dims and deflate bombs throw before allocating") {
    // tiny content that inflates fine — the DIMENSIONS are the attack
    val raw = Array.fill[Byte](4 * 4 * 3)(9)
    val flate = {
      val d = new java.util.zip.Deflater(); d.setInput(raw); d.finish()
      val out = new Array[Byte](256); val n = d.deflate(out); d.end()
      java.util.Arrays.copyOf(out, n)
    }
    def withDims(w: Int, h: Int): Array[Byte] = {
      val content = s"q 4 0 0 4 0 0 cm /Im0 Do Q".getBytes("ISO-8859-1")
      val b = new PdfBuilder
      b.obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
      b.obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
      b.obj(3, "<< /Type /Page /Parent 2 0 R /Contents 5 0 R " +
        "/Resources << /XObject << /Im0 4 0 R >> >> >>")
      b.obj(4, s"<< /Type /XObject /Subtype /Image /Width $w /Height $h " +
        s"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /FlateDecode /Length ${flate.length} >>",
        stream = Some(flate))
      b.obj(5, s"<< /Length ${content.length} >>", stream = Some(content))
      b.build()
    }
    // 37838^2 * 3 wraps Int to 175,436 — without Long math a small stream
    // could satisfy the byte-count require against fabricated dimensions
    val wrap = intercept[IllegalArgumentException](PdfPages.pages(withDims(37838, 37838)))
    assert(wrap.getMessage.contains("decompression bomb"))
    // dims above MaxPixels: typed bomb rejection BEFORE any inflate
    val big = intercept[IllegalArgumentException](PdfPages.pages(withDims(100000, 100000)))
    assert(big.getMessage.contains("decompression bomb"))
    // a real deflate bomb under honest small dims: inflate output is capped
    // at the expected byte count, not materialized to exhaustion
    val bomb = {
      val zeros = new Array[Byte](8 * 1024 * 1024)
      val d = new java.util.zip.Deflater(9); d.setInput(zeros); d.finish()
      val out = new Array[Byte](1 << 20); val n = d.deflate(out); d.end()
      java.util.Arrays.copyOf(out, n)
    }
    val b3 = new PdfBuilder
    b3.obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    b3.obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    val content3 = "q 4 0 0 4 0 0 cm /Im0 Do Q".getBytes("ISO-8859-1")
    b3.obj(3, "<< /Type /Page /Parent 2 0 R /Contents 5 0 R " +
      "/Resources << /XObject << /Im0 4 0 R >> >> >>")
    b3.obj(4, "<< /Type /XObject /Subtype /Image /Width 4 /Height 4 " +
      s"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /FlateDecode /Length ${bomb.length} >>",
      stream = Some(bomb))
    b3.obj(5, s"<< /Length ${content3.length} >>", stream = Some(content3))
    val exBomb = intercept[IllegalArgumentException](PdfPages.pages(b3.build()))
    assert(exBomb.getMessage.contains("inflates past"))
  }

  test("single-XObject pages validate the cm placement too") {
    // round-4 gap: xmap.size == 1 skipped contentDraws entirely, so a
    // mirrored/scaled single-strip placement composited silently while the
    // same matrix on a multi-strip page was rejected loudly
    val raw = pattern(4, 4, 3)
    val flate = {
      val d = new java.util.zip.Deflater(); d.setInput(raw); d.finish()
      val out = new Array[Byte](256); val n = d.deflate(out); d.end()
      java.util.Arrays.copyOf(out, n)
    }
    def onePage(cm: String): Array[Byte] = {
      val content = s"q $cm cm /Im0 Do Q".getBytes("ISO-8859-1")
      val b = new PdfBuilder
      b.obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
      b.obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
      b.obj(3, "<< /Type /Page /Parent 2 0 R /Contents 5 0 R " +
        "/Resources << /XObject << /Im0 4 0 R >> >> >>")
      b.obj(4, "<< /Type /XObject /Subtype /Image /Width 4 /Height 4 " +
        s"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /FlateDecode /Length ${flate.length} >>",
        stream = Some(flate))
      b.obj(5, s"<< /Length ${content.length} >>", stream = Some(content))
      b.build()
    }
    // 1:1 axis-aligned placement still decodes
    val ok = PdfPages.pages(onePage("4 0 0 4 0 0"))
    assert(ok.head.image.rgb.toSeq == raw.toSeq)
    // rotated single placement: now rejected, not silently composited
    val rot = intercept[IllegalArgumentException](PdfPages.pages(onePage("4 1 0 4 0 0")))
    assert(rot.getMessage.contains("rotated/skewed"))
    // non-1:1 scale
    val scaled = intercept[IllegalArgumentException](PdfPages.pages(onePage("9 0 0 4 0 0")))
    assert(scaled.getMessage.contains("non-1:1"))
    // mirrored
    val mir = intercept[IllegalArgumentException](PdfPages.pages(onePage("-4 0 0 4 4 0")))
    assert(mir.getMessage.contains("mirrored"))
    // dangling XObject ref: contextual error, not a bare NoSuchElement
    val b3 = new PdfBuilder
    b3.obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    b3.obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b3.obj(3, "<< /Type /Page /Parent 2 0 R /Resources << /XObject << /Im0 9 0 R >> >> >>")
    val dangling = intercept[IllegalArgumentException](PdfPages.pages(b3.build()))
    assert(dangling.getMessage.contains("dangling"))
  }
}
