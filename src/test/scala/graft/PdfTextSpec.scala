package graft

import java.nio.charset.StandardCharsets.ISO_8859_1

import graft.media.PdfText
import org.scalatest.funsuite.AnyFunSuite

/** Born-digital PDF text extraction vs the independent pure-Python
  * interpreter twin's committed expectations (tools/gen_pdftext_fixture.py),
  * plus the loud-rejection contract for inputs outside the subset.
  */
class PdfTextSpec extends AnyFunSuite {

  private def fixture: Array[Byte] =
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/test/resources/media/textpdf/text_00.pdf"))

  test("extracted lines match the committed twin expectations") {
    val got = PdfText.lines(fixture)
    // spot-check the tricky operator classes; the full-table compare is the
    // q_pdf_text oracle
    val texts = got.map(l => (l.pageIndex, l.lineIndex) -> l.text).toMap
    assert(texts((0, 0)) == "Hello, world! same line") // two BT runs, one baseline
    assert(texts((0, 1)) == "Second (line) with \\escapes") // escaped parens + backslash
    assert(texts((0, 2)) == "Octal and tab\there") // \141 octal + \t
    assert(texts((0, 4)) == "Leading two") // T* + ' line advances
    assert(texts((1, 0)) == "nogap") // TJ kern -50: no space
    assert(texts((1, 4)) == "ker ned") // TJ kern -250: space
    assert(texts((1, 1)) == "Hello") // hex string
    assert(texts((1, 3)) == "q2") // " operator (aw ac string)
    assert(texts((1, 5)) == "line continued") // backslash-newline continuation
    // lines are top-down within each page
    got.groupBy(_.pageIndex).values.foreach { page =>
      val ys = page.sortBy(_.lineIndex).map(_.y)
      assert(ys == ys.sorted(Ordering[Double].reverse), s"not top-down: $ys")
    }
    // page 2's content stream is Flate-compressed in the fixture
    assert(got.count(_.pageIndex == 1) == 6)
  }

  test("CMap fixture: 1/2-byte codes, ligatures, astral chars, BOM strings") {
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/test/resources/media/textpdf/text_01.pdf"))
    val texts = PdfText.lines(bytes).map(l => (l.pageIndex, l.lineIndex) -> l.text).toMap
    assert(texts((0, 0)) == "He") // hex string of 1-byte codes
    assert(texts((0, 1)) == "He") // literal string bytes are CODES too
    assert(texts((0, 2)) == "abcd") // incrementing bfrange
    assert(texts((0, 3)) == "ffi") // ligature: one code, three chars
    assert(texts((0, 4)) == "𝄞") // surrogate-pair destination
    assert(texts((0, 5)) == "XYZ") // array bfrange
    assert(texts((0, 6)) == "H e") // TJ kern lands BETWEEN codes
    assert(texts((0, 7)) == "effiH") // mixed 1- and 2-byte codes in one string
    assert(texts((0, 8)) == "plain again") // Tf back to the simple font
    assert(texts((1, 0)) == "Hi") // UTF-16BE BOM hex string (no CMap font)
    assert(texts((1, 1)) == "Yo") // UTF-16BE BOM literal via octal escapes
    assert(texts((1, 2)) == "latin")
  }

  test("CMap failures are loud: unmapped code, byte outside every codespace") {
    def pdfWithFont(content: String, cmap: String): Array[Byte] = {
      val objs = Seq(
        1 -> "<< /Type /Catalog /Pages 2 0 R >>",
        2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3 -> ("<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
          "/Resources << /Font << /F2 5 0 R >> >> >>"),
        4 -> s"<< /Length ${content.length} >>\nstream\n$content\nendstream",
        5 -> "<< /Type /Font /Subtype /Type0 /BaseFont /Synth /ToUnicode 6 0 R >>",
        6 -> s"<< /Length ${cmap.length} >>\nstream\n$cmap\nendstream")
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
    val cmap = "1 begincodespacerange\n<00> <7F>\nendcodespacerange\n" +
      "1 beginbfchar\n<41> <0048>\nendbfchar\n"
    // mapped code decodes
    assert(PdfText.lines(pdfWithFont("BT /F2 12 Tf 72 700 Td <41> Tj ET", cmap))
      .map(_.text) == Vector("H"))
    // in-codespace code with no mapping: loud
    val unmapped = intercept[IllegalArgumentException](
      PdfText.lines(pdfWithFont("BT /F2 12 Tf 72 700 Td <42> Tj ET", cmap)))
    assert(unmapped.getMessage.contains("no bfchar/bfrange mapping"))
    // byte outside every codespace range: loud
    val stray = intercept[IllegalArgumentException](
      PdfText.lines(pdfWithFont("BT /F2 12 Tf 72 700 Td <FF> Tj ET", cmap)))
    assert(stray.getMessage.contains("outside every codespace range"))
  }

  test("a /Contents ARRAY concatenates its streams into one page") {
    // text state set in stream 1 (incl. the open BT block and line
    // position) carries into stream 2 — the spec's concatenation
    // semantics; parts split at token boundaries as the spec requires
    val c1 = "BT /F1 12 Tf 72 700 Td (part one) Tj"
    val c2 = "0 -20 Td (part two) Tj ET"
    val objs = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> "<< /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >>",
      4 -> s"<< /Length ${c1.length} >>\nstream\n$c1\nendstream",
      5 -> s"<< /Length ${c2.length} >>\nstream\n$c2\nendstream")
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
    val lines = PdfText.lines(out.toString.getBytes(ISO_8859_1))
    assert(lines.map(l => (l.lineIndex, l.text)) == Vector((0, "part one"), (1, "part two")))
  }

  test("scaled Tm fixture: displacements multiply through the active scale") {
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/test/resources/media/textpdf/text_02.pdf"))
    val got = PdfText.lines(bytes)
    val texts = got.map(l => (l.pageIndex, l.lineIndex) -> l.text).toMap
    val ys = got.map(l => (l.pageIndex, l.lineIndex) -> l.y).toMap
    // 14x block: "0 -1.5 Td" moves 21 device units, "1.2 TL T*" moves 16.8
    assert(texts((0, 0)) == "Scaled heading" && ys((0, 0)) == 700.0)
    assert(texts((0, 1)) == "second at 14x" && ys((0, 1)) == 679.0)
    assert(texts((0, 2)) == "third via T star" && math.abs(ys((0, 2)) - 662.2) < 1e-9)
    // BT resets the matrix: plain block lands where unscaled Td says
    assert(texts((0, 3)) == "unscaled after reset" && ys((0, 3)) == 600.0)
    // anisotropic 6x/10x: "20 0 Td" keeps the baseline (x moves 120),
    // so both runs join one line; TD/T* descend 20 per 2-unit leading
    assert(texts((0, 4)) == "aniso right")
    assert(texts((0, 5)) == "below" && ys((0, 5)) == 540.0)
    assert(texts((0, 6)) == "again" && ys((0, 6)) == 520.0)
    // leading is stored in TEXT units: the same 2-unit leading moves 20
    // under the 10x matrix and 10 after a 5x Tm replaces it
    assert(texts((1, 0)) == "lead at 10x" && ys((1, 0)) == 680.0)
    assert(texts((1, 1)) == "same lead at 5x" && ys((1, 1)) == 490.0)
    // ' under an 8x matrix with 3-unit leading: 24 device units per line
    assert(texts((1, 3)) == "q one" && ys((1, 3)) == 376.0)
    assert(texts((1, 4)) == "q two" && ys((1, 4)) == 352.0)
  }

  test("rotated text matrices and malformed streams are rejected loudly") {
    val raw = new String(fixture, ISO_8859_1)
    // the uncompressed page-1 stream has no Tm; surgery on it: turn a Td
    // into a rotated Tm-like op is length-fussy, so build tiny PDFs instead
    def tinyPdf(content: String): Array[Byte] = {
      val objs = Seq(
        1 -> "<< /Type /Catalog /Pages 2 0 R >>",
        2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3 -> "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4 -> s"<< /Length ${content.length} >>\nstream\n$content\nendstream")
      val out = new StringBuilder("%PDF-1.4\n")
      val offsets = objs.map { case (n, body) =>
        val off = out.length
        out ++= s"$n 0 obj\n$body\nendobj\n"
        n -> off
      }.toMap
      val xrefAt = out.length
      out ++= s"xref\n0 ${objs.length + 1}\n"
      out ++= "0000000000 65535 f \n"
      (1 to objs.length).foreach(n => out ++= f"${offsets(n)}%010d 00000 n \n")
      out ++= s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n"
      out.toString.getBytes(ISO_8859_1)
    }
    // happy tiny case parses
    assert(PdfText.lines(tinyPdf("BT 10 20 Td (ok) Tj ET")).map(_.text) == Vector("ok"))
    // rotated Tm
    val rot = intercept[IllegalArgumentException](
      PdfText.lines(tinyPdf("BT 0 1 -1 0 72 700 Tm (x) Tj ET")))
    assert(rot.getMessage.contains("rotated/skewed"))
    // mirrored Tm (negative scale): text would read backwards — reject
    val mirrored = intercept[IllegalArgumentException](
      PdfText.lines(tinyPdf("BT -12 0 0 12 72 700 Tm (x) Tj ET")))
    assert(mirrored.getMessage.contains("rotated/skewed/mirrored"))
    // scaled Tm ("S 0 0 S x y Tm" with a size-1 font) is SUPPORTED: the
    // displacements multiply through the scale (full coverage in the
    // scaled-Tm fixture test below; minimal smoke here)
    assert(PdfText.lines(tinyPdf("BT 12 0 0 12 72 700 Tm (x) Tj ET")).map(_.text)
      == Vector("x"))
    // two completed arrays before one TJ: the first would be silently
    // OVERWRITTEN (text lost) — must be loud (mirrors PdfRaster's guard)
    val twoArrays = intercept[IllegalArgumentException](
      PdfText.lines(tinyPdf("BT [(lost)] [(kept)] TJ ET")))
    assert(twoArrays.getMessage.contains("unconsumed content-stream array"))
    // show outside BT
    val outside = intercept[IllegalArgumentException](
      PdfText.lines(tinyPdf("(x) Tj")))
    assert(outside.getMessage.contains("outside BT/ET"))
    // unterminated literal string
    intercept[IllegalArgumentException](PdfText.lines(tinyPdf("BT (never closed Tj ET")))
    // unknown operators are LOUD, not skipped: a Form XObject draw could
    // carry text we cannot see, and inline-image bytes would shred the
    // tokenizer — silent partial extraction is the failure mode to refuse
    val formXObj = intercept[IllegalArgumentException](
      PdfText.lines(tinyPdf("BT 10 20 Td (x) Tj ET q /Fm0 Do Q")))
    assert(formXObj.getMessage.contains("unsupported content-stream operator 'Do'"))
    // show with no operand: descriptive failure, not NoSuchElementException
    val noOperand = intercept[IllegalArgumentException](
      PdfText.lines(tinyPdf("BT Tj ET")))
    assert(noOperand.getMessage.contains("Tj with no operand"))
    // ignored state operators really are ignored (color, path, marked content)
    assert(PdfText.lines(tinyPdf(
      "0.5 g 1 0 0 RG 10 10 100 5 re f BMC BT 10 20 Td (kept) Tj ET EMC")).map(_.text)
      == Vector("kept"))
    // not a PDF at all
    intercept[IllegalArgumentException](PdfText.lines("nope".getBytes(ISO_8859_1)))
    assert(raw.contains("/FlateDecode")) // fixture really exercises inflate
  }
}
