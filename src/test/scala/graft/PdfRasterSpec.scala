package graft

import java.nio.charset.StandardCharsets.ISO_8859_1

import com.fasterxml.jackson.databind.ObjectMapper
import graft.media.{ImageDecode, PdfRaster}
import org.scalatest.funsuite.AnyFunSuite

/** Subset PDF rasterization vs the independent pure-Python renderer twin
  * (tools/gen_pdfraster_fixture.py), plus the loud-rejection contract for
  * content outside the raster subset.
  */
class PdfRasterSpec extends AnyFunSuite {

  private def fixture: Array[Byte] =
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/test/resources/media/rasterpdf/raster_00.pdf"))

  private lazy val goldens = {
    val in = getClass.getResourceAsStream("/goldens/pdfraster_goldens.json")
    try new ObjectMapper().readTree(in) finally in.close()
  }

  test("rasterized pages match the Python twin's pixel digests") {
    val dpi = goldens.get("dpi").asInt
    val pages = PdfRaster.rasterize(fixture, dpi)
    val exp = goldens.get("pages")
    assert(pages.length == exp.size())
    pages.zipWithIndex.foreach { case (p, i) =>
      val e = exp.get(i)
      assert(p.pageIndex == e.get("page_index").asInt)
      assert(p.image.width == e.get("width").asInt, s"page $i width")
      assert(p.image.height == e.get("height").asInt, s"page $i height")
      assert(ImageDecode.sha256Hex(p.image.rgb) == e.get("pixel_sha").asText,
        s"page $i pixels diverge from the Python twin")
    }
  }

  private def tinyPdf(content: String): Array[Byte] = {
    val objs = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> ("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 50 40] " +
        "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>"),
      4 -> s"<< /Length ${content.length} >>\nstream\n$content\nendstream",
      5 -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    val out = new StringBuilder("%PDF-1.4\n")
    val offsets = objs.map { case (n, body) =>
      val off = out.length
      out ++= s"$n 0 obj\n$body\nendobj\n"
      n -> off
    }.toMap
    val xrefAt = out.length
    out ++= s"xref\n0 ${objs.length + 1}\n0000000000 65535 f \n"
    (1 to objs.length).foreach(n => out ++= f"${offsets(n)}%010d 00000 n \n")
    out ++= s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n"
    out.toString.getBytes(ISO_8859_1)
  }

  test("out-of-subset content is rejected loudly, never approximated") {
    // happy tiny case renders (white canvas + one black rect + text)
    val ok = PdfRaster.rasterize(tinyPdf("0 0 0 rg 5 5 10 10 re f BT /F1 7 Tf 2 25 Td (OK) Tj ET"), 72)
    assert(ok.length == 1 && ok.head.image.width == 50 && ok.head.image.height == 40)
    // the rect painted black somewhere
    assert(ok.head.image.rgb.exists(_ == 0x00.toByte))
    def rejects(content: String, needle: String): Unit = {
      val ex = intercept[IllegalArgumentException](PdfRaster.rasterize(tinyPdf(content), 72))
      assert(ex.getMessage.contains(needle), s"for [$content] got: ${ex.getMessage}")
    }
    rejects("10 10 m 20 20 l S", "outside the raster subset") // line paths/stroke
    rejects("5 5 10 10 re W n", "outside the raster subset") // clipping
    rejects("5 5 10 10 re f*", "outside the raster subset") // even-odd fill
    rejects("0 0 0.5 0 k 5 5 10 10 re f", "outside the raster subset") // CMYK fill
    rejects("q 2 0 0 2 0 0 cm 5 5 10 10 re f Q", "non-translation cm") // scale
    rejects("BT /F1 7 Tf 2 25 Td (#) Tj ET", "outside the built-in glyph font")
    rejects("Q", "empty graphics-state stack")
    rejects("5 5 10 10 re", "constructed but never painted")
    rejects("1.5 0 0 rg 5 5 10 10 re f", "outside [0,1]") // bad color component
  }

  test("dpi scales the canvas and the same page stays deterministic") {
    val at72 = PdfRaster.rasterize(fixture, 72)
    val at144 = PdfRaster.rasterize(fixture, 144)
    assert(at144.head.image.width == at72.head.image.width * 2)
    assert(at144.head.image.height == at72.head.image.height * 2)
    val again = PdfRaster.rasterize(fixture, 144)
    assert(ImageDecode.sha256Hex(again(1).image.rgb) ==
      ImageDecode.sha256Hex(at144(1).image.rgb))
  }
}
