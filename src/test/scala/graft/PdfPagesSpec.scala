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

  test("DCTDecode pages: the stream is a JPEG handed to ImageIO") {
    // build a one-page DCT PDF in-test: encode a JPEG via ImageIO, embed it
    val (w, h) = (20, 12)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (x * 12) << 16 | (y * 20) << 8)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val jpeg = bos.toByteArray
    val expected = ImageDecode.decode(jpeg)
    val body = new java.io.ByteArrayOutputStream()
    def w8(s: String): Unit = body.write(s.getBytes("ISO-8859-1"))
    w8("%PDF-1.4\n")
    w8("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w8("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    w8(s"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 $w $h] " +
      "/Resources << /XObject << /Im0 4 0 R >> >> >>\nendobj\n")
    w8(s"4 0 obj\n<< /Type /XObject /Subtype /Image /Width $w /Height $h " +
      s"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /DCTDecode /Length ${jpeg.length} >>\nstream\n")
    body.write(jpeg)
    w8("\nendstream\nendobj\n")
    w8("trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n")
    val got = PdfPages.pages(body.toByteArray)
    assert(got.length == 1)
    assert(got.head.image.width == w && got.head.image.height == h)
    assert(got.head.image.rgb.toSeq == expected.rgb.toSeq)
  }

  test("unsupported inputs fail loudly, not silently") {
    intercept[IllegalArgumentException](PdfPages.pages("not a pdf".getBytes))
    intercept[IllegalArgumentException](
      PdfPages.pages("%PDF-1.4\n1 0 obj\n<< >>\nendobj\n".getBytes))
  }
}
