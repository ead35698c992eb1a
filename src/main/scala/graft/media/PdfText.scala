package graft.media

import scala.collection.mutable

/** Native text extraction from BORN-DIGITAL PDFs — the complement to
  * [[PdfPages]] (which covers the scanned-document class). The reference
  * pipeline rasterizes every PDF and OCRs the pixels
  * (`/root/reference/src/churro_ocr/_internal/pdf.py:20-54`); for a text
  * PDF the transcription IS the embedded text, and a Spark-native
  * training-data pipeline extracts it directly instead of paying a
  * render+OCR round trip. Rasterizing vector/text pages still needs a full
  * renderer (pdfium, absent offline) and stays rejected in PdfPages.
  *
  * Supported subset (same classic-xref container contract as PdfPages, plus
  * the text operator set; everything else throws with a reason):
  *  - content streams (plain or /FlateDecode) with BT/ET text blocks;
  *  - positioning: Td, TD (sets leading = −ty), Tm (translation-only — a
  *    rotated/skewed text matrix is rejected loudly), T*, TL;
  *  - showing: Tj, ' (T* + show), " (pops word/char spacing, T* + show),
  *    TJ arrays where a kern ≤ [[KernSpaceThreshold]] thousandths inserts
  *    one space (the standard extraction heuristic — glyph advance widths
  *    need font metrics, out of scope offline);
  *  - strings: literal `(...)` with nesting, all PDF escapes (\n \r \t \b
  *    \f \( \) \\, octal \ddd, backslash-newline continuation) and hex
  *    `<...>`, both decoded as Latin-1 (the fixture subset's
  *    StandardEncoding/WinAnsi intersection);
  *  - graphics/font state operators (q/Q/cm/Tf/Tc/Tw/Tz/Ts/Tr/rg/...) are
  *    consumed and ignored — they do not affect extracted text order.
  *
  * Line model: shows group by rounded baseline y; lines order top-down
  * (y descending — PDF user space is y-up), runs within a line order by
  * x then stream order and join with ONE space. Differentially verified
  * against the independent pure-Python twin (tools/gen_pdftext_fixture.py),
  * which computes expected rows from the same documented rules.
  */
object PdfText {

  /** TJ kern (thousandths of text space) at or below this inserts a space. */
  val KernSpaceThreshold: Double = -180.0


  final case class TextLine(pageIndex: Int, lineIndex: Int, y: Double, text: String)

  // ---- content-stream tokenizer ---------------------------------------------

  private sealed trait Tok
  private final case class TNum(v: Double) extends Tok
  private final case class TStr(s: String) extends Tok
  private final case class TName(n: String) extends Tok
  private final case class TOp(op: String) extends Tok
  private case object TArrOpen extends Tok
  private case object TArrClose extends Tok

  private def isWs(c: Char) = c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0
  private def isDelim(c: Char) = "()<>[]{}/%".indexOf(c) >= 0

  private def decodeLiteral(s: String, from: Int): (String, Int) = {
    val out = new StringBuilder
    var depth = 1
    var i = from
    while (depth > 0) {
      require(i < s.length, "unterminated literal string")
      s.charAt(i) match {
        case '\\' =>
          require(i + 1 < s.length, "dangling escape")
          s.charAt(i + 1) match {
            case 'n' => out += '\n'; i += 2
            case 'r' => out += '\r'; i += 2
            case 't' => out += '\t'; i += 2
            case 'b' => out += '\b'; i += 2
            case 'f' => out += '\f'; i += 2
            case '(' => out += '('; i += 2
            case ')' => out += ')'; i += 2
            case '\\' => out += '\\'; i += 2
            case '\r' => i += 2; if (i < s.length && s.charAt(i) == '\n') i += 1 // line continuation
            case '\n' => i += 2
            case d if d >= '0' && d <= '7' =>
              var v = 0; var n = 0; i += 1
              while (n < 3 && i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '7') {
                v = v * 8 + (s.charAt(i) - '0'); i += 1; n += 1
              }
              out += (v & 0xFF).toChar
            case other => out += other; i += 2 // PDF: backslash before other chars is dropped
          }
        case '(' => depth += 1; out += '('; i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) out += ')'
          i += 1
        case c => out += c; i += 1
      }
    }
    (out.toString, i)
  }

  private def decodeHex(s: String, from: Int): (String, Int) = {
    val end = s.indexOf('>', from)
    require(end >= 0, "unterminated hex string")
    val hex = s.substring(from, end).filterNot(isWs)
    val padded = if (hex.length % 2 == 1) hex + "0" else hex
    val out = new StringBuilder
    var i = 0
    while (i < padded.length) {
      out += Integer.parseInt(padded.substring(i, i + 2), 16).toChar
      i += 2
    }
    (out.toString, end + 1)
  }

  private def tokenize(s: String): Vector[Tok] = {
    val toks = Vector.newBuilder[Tok]
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (isWs(c)) i += 1
      else if (c == '%') { // comment to end of line
        while (i < s.length && s.charAt(i) != '\n' && s.charAt(i) != '\r') i += 1
      } else if (c == '(') {
        val (str, next) = decodeLiteral(s, i + 1); toks += TStr(str); i = next
      } else if (c == '<' && i + 1 < s.length && s.charAt(i + 1) == '<') {
        // inline dict (e.g. BDC property lists): skip to matching >>
        var depth = 1; i += 2
        while (depth > 0) {
          require(i + 1 < s.length, "unterminated inline dict")
          if (s.charAt(i) == '<' && s.charAt(i + 1) == '<') { depth += 1; i += 2 }
          else if (s.charAt(i) == '>' && s.charAt(i + 1) == '>') { depth -= 1; i += 2 }
          else i += 1
        }
      } else if (c == '<') {
        val (str, next) = decodeHex(s, i + 1); toks += TStr(str); i = next
      } else if (c == '[') { toks += TArrOpen; i += 1 }
      else if (c == ']') { toks += TArrClose; i += 1 }
      else if (c == '/') {
        val start = i + 1
        i = start
        while (i < s.length && !isWs(s.charAt(i)) && !isDelim(s.charAt(i))) i += 1
        toks += TName(s.substring(start, i))
      } else if (c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9')) {
        val start = i
        i += 1
        while (i < s.length && (s.charAt(i) == '.' || s.charAt(i) == '+' || s.charAt(i) == '-'
          || (s.charAt(i) >= '0' && s.charAt(i) <= '9'))) i += 1
        val lit = s.substring(start, i)
        toks += TNum(try lit.toDouble catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(s"unparsable numeric token '$lit'")
        })
      } else {
        val start = i
        while (i < s.length && !isWs(s.charAt(i)) && !isDelim(s.charAt(i))) i += 1
        require(i > start, s"unparsable content byte '${s.charAt(i)}' at $i")
        toks += TOp(s.substring(start, i))
      }
    }
    toks.result()
  }

  // ---- text-state interpreter -----------------------------------------------

  /** Operators with NO effect on extracted text, consumed and ignored:
    * font/text state (Tf Tc Tw Tz Ts Tr), graphics state (q Q cm gs w J j
    * M d ri i), color (g G rg RG k K cs CS sc scn SC SCN), path
    * construction/painting (m l c v y h re S s f F f* B B* b b* n W W*),
    * marked content (BMC BDC EMC MP DP), shading/type3 (sh d0 d1).
    * Anything NOT here and not a text operator throws — `Do` (Form
    * XObjects) and `BI` (inline images) in particular, which could carry
    * content a silent skip would lose.
    */
  private val IgnoredOps: Set[String] = Set(
    "Tf", "Tc", "Tw", "Tz", "Ts", "Tr",
    "q", "Q", "cm", "gs", "w", "J", "j", "M", "d", "ri", "i",
    "g", "G", "rg", "RG", "k", "K", "cs", "CS", "sc", "scn", "SC", "SCN",
    "m", "l", "c", "v", "y", "h", "re", "S", "s", "f", "F", "f*", "B", "B*", "b", "b*", "n", "W", "W*",
    "BMC", "BDC", "EMC", "MP", "DP", "sh", "d0", "d1")

  private final case class Show(y: Double, x: Double, seq: Int, text: String)

  /** Interpret one page's content stream; returns all text shows. */
  private def interpret(content: String): Vector[Show] = {
    val toks = tokenize(content)
    val shows = Vector.newBuilder[Show]
    var lineX = 0.0; var lineY = 0.0 // line-start (the PDF line matrix origin)
    var leading = 0.0
    var inText = false
    var seq = 0
    val operands = mutable.ArrayBuffer.empty[Tok]
    var arr: mutable.ArrayBuffer[Tok] = null // open TJ array, if any
    var arrDone: Vector[Tok] = null // most recent completed array

    def num(t: Tok): Double = t match {
      case TNum(v) => v
      case other => throw new IllegalArgumentException(s"expected number, got $other")
    }
    def lastOperand(op: String): Tok = {
      require(operands.nonEmpty, s"$op with no operand")
      operands.last
    }
    def show(text: String): Unit = {
      require(inText, "text-show operator outside BT/ET")
      if (text.nonEmpty) { shows += Show(lineY, lineX, seq, text); seq += 1 }
    }
    def nextLine(): Unit = { lineY -= leading }

    toks.foreach {
      case TArrOpen =>
        require(arr == null, "nested array in content stream")
        arr = mutable.ArrayBuffer.empty[Tok]
      case TArrClose =>
        require(arr != null, "unbalanced ]")
        operands += TArrOpen // marker: completed array sits in `arrDone`
        arrDone = arr.toVector
        arr = null
      case t if arr != null => arr += t
      case TOp(op) =>
        op match {
          case "BT" => inText = true; lineX = 0.0; lineY = 0.0
          case "ET" => inText = false
          case "Td" =>
            require(operands.length >= 2, "Td needs 2 operands")
            lineX += num(operands(operands.length - 2)); lineY += num(operands.last)
          case "TD" =>
            require(operands.length >= 2, "TD needs 2 operands")
            val ty = num(operands.last)
            leading = -ty
            lineX += num(operands(operands.length - 2)); lineY += ty
          case "Tm" =>
            require(operands.length >= 6, "Tm needs 6 operands")
            val Seq(a, b, c, d, e, f) = operands.takeRight(6).map(num).toSeq
            require(b == 0.0 && c == 0.0 && a > 0 && d > 0,
              s"rotated/skewed text matrix unsupported (a=$a b=$b c=$c d=$d)")
            lineX = e; lineY = f
          case "T*" => nextLine()
          case "TL" => leading = num(lastOperand("TL"))
          case "Tj" =>
            lastOperand("Tj") match {
              case TStr(s) => show(s)
              case other => throw new IllegalArgumentException(s"Tj on $other")
            }
          case "'" =>
            nextLine()
            lastOperand("'") match {
              case TStr(s) => show(s)
              case other => throw new IllegalArgumentException(s"' on $other")
            }
          case "\"" =>
            require(operands.length >= 3, "\" needs aw ac string")
            nextLine()
            operands.last match {
              case TStr(s) => show(s)
              case other => throw new IllegalArgumentException(s"\" on $other")
            }
          case "TJ" =>
            require(operands.lastOption.contains(TArrOpen) && arrDone != null, "TJ without array")
            val sb = new StringBuilder
            arrDone.foreach {
              case TStr(s) => sb ++= s
              case TNum(v) => if (v <= KernSpaceThreshold) sb += ' '
              case other => throw new IllegalArgumentException(s"TJ array element $other")
            }
            arrDone = null
            show(sb.toString)
          case known if IgnoredOps(known) => // graphics/font/path state: no effect on text
          case unknown =>
            // LOUD contract: an operator outside the subset may carry text
            // we cannot see (`Do` runs a Form XObject, `BI...EI` embeds
            // binary an operand tokenizer would shred) — never extract
            // silently-partial text
            throw new IllegalArgumentException(
              s"unsupported content-stream operator '$unknown' (outside the text subset)")
        }
        operands.clear()
      case t => operands += t
    }
    require(arr == null, "unterminated [ array")
    shows.result()
  }

  // ---- page assembly --------------------------------------------------------

  /** Extract the text lines of every page, in /Kids order. */
  def lines(pdfBytes: Array[Byte]): Vector[TextLine] = {
    import PdfPages._
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
    kids.zipWithIndex.flatMap { case (pageNum, pageIdx) =>
      val page = objs.getOrElse(pageNum,
        throw new IllegalArgumentException(s"missing page object $pageNum"))
      // /Contents may be one indirect ref or an ARRAY of refs whose decoded
      // streams concatenate into the page's content — shared resolution
      // (incl. residue/generation validation) lives in PdfPages.contentText
      val shows = interpret(contentText(pdfBytes, page, objs))
      // group by rounded baseline (math.rint = half-even, matching the
      // Python twin's round() — math.round's half-up would diverge at
      // exact .05 baselines), top-down; runs join left-to-right, one space
      shows.groupBy(s => math.rint(s.y * 10) / 10.0).toVector
        .sortBy { case (y, _) => -y }
        .zipWithIndex
        .map { case ((y, runs), li) =>
          TextLine(pageIdx, li, y,
            runs.sortBy(r => (r.x, r.seq)).map(_.text).mkString(" "))
        }
    }
  }
}
