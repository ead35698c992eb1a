package graft.layout

import java.util.regex.Pattern
import graft.text.{HtmlEntities, PyStr}
import scala.collection.mutable.ArrayBuffer

/** OTSL table-token → HTML conversion.
  *
  * Port of `convert_mineru2_5_otsl_to_html` and its helpers
  * (`/root/reference/src/churro_ocr/providers/_mineru25.py:62-75,638-794`):
  * `<fcel>/<ecel>` cells, `<lcel>` colspan, `<ucel>` rowspan, `<xcel>` both,
  * `<nl>` row breaks; rows padded to the max width with `<ecel>`.
  */
object Otsl {
  private val NL = "<nl>"
  private val FCEL = "<fcel>"
  private val ECEL = "<ecel>"
  private val LCEL = "<lcel>"
  private val UCEL = "<ucel>"
  private val XCEL = "<xcel>"
  private val Tokens: Set[String] = Set(NL, FCEL, ECEL, LCEL, UCEL, XCEL)
  private val pattern = Pattern.compile(
    "(" + Seq(NL, FCEL, ECEL, LCEL, UCEL, XCEL).map(Pattern.quote).mkString("|") + ")")

  private final case class Cell(text: String, rowSpan: Int, colSpan: Int, startRow: Int, startCol: Int)

  /** Python `re.split` with a capturing group: alternating text/sep pieces. */
  private def splitKeep(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val m = pattern.matcher(s)
    var last = 0
    while (m.find()) {
      out += s.substring(last, m.start())
      out += m.group(1)
      last = m.end()
    }
    out += s.substring(last)
    out.result()
  }

  private def findTokens(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val m = pattern.matcher(s)
    while (m.find()) out += m.group(1)
    out.result()
  }

  private def groupRows(tokens: Vector[String]): Vector[Vector[String]] = {
    val rows = Vector.newBuilder[Vector[String]]
    val cur = new ArrayBuffer[String]
    tokens.foreach { t =>
      if (t == NL) {
        if (cur.nonEmpty) { rows += cur.toVector; cur.clear() }
      } else cur += t
    }
    if (cur.nonEmpty) rows += cur.toVector
    rows.result()
  }

  private def countSpanRight(rows: Vector[Vector[String]], rowIdx: Int, colIdx: Int, spanTokens: Set[String]): Int = {
    var span = 0
    var cursor = colIdx
    while (cursor < rows(rowIdx).length && spanTokens.contains(rows(rowIdx)(cursor))) {
      span += 1; cursor += 1
    }
    span
  }

  private def countSpanDown(rows: Vector[Vector[String]], rowIdx: Int, colIdx: Int, spanTokens: Set[String]): Int = {
    var span = 0
    var cursor = rowIdx
    while (cursor < rows.length && colIdx < rows(cursor).length && spanTokens.contains(rows(cursor)(colIdx))) {
      span += 1; cursor += 1
    }
    span
  }

  /** `_normalize_otsl_parts` (`_mineru25.py:676-690`). */
  private def normalizeParts(rows: Vector[Vector[String]], mixedTexts: Vector[String]): Vector[String] = {
    val parts = Vector.newBuilder[String]
    var textIdx = 0
    rows.foreach { row =>
      row.foreach { token =>
        parts += token
        if (textIdx < mixedTexts.length && mixedTexts(textIdx) == token) {
          textIdx += 1
          if (textIdx < mixedTexts.length && !Tokens.contains(mixedTexts(textIdx))) {
            parts += mixedTexts(textIdx)
            textIdx += 1
          }
        }
      }
      parts += NL
      if (textIdx < mixedTexts.length && mixedTexts(textIdx) == NL) textIdx += 1
    }
    parts.result()
  }

  private def collectCells(rows: Vector[Vector[String]], parts: Vector[String]): Vector[Cell] = {
    val cells = Vector.newBuilder[Cell]
    var rowIdx = 0
    var colIdx = 0
    var index = 0
    while (index < parts.length) {
      val part = parts(index)
      if (part == FCEL || part == ECEL) {
        val (cellText, nextOffset) = {
          val ni = index + 1
          if (ni < parts.length && !Tokens.contains(parts(ni))) (PyStr.strip(parts(ni)), 2)
          else ("", 1)
        }
        var rowSpan = 1
        var colSpan = 1
        val nextRight = {
          val ni = index + nextOffset
          if (ni < parts.length) parts(ni) else ""
        }
        if (nextRight == LCEL || nextRight == XCEL)
          colSpan += countSpanRight(rows, rowIdx, colIdx + 1, Set(LCEL, XCEL))
        val nextDown =
          if (rowIdx + 1 >= rows.length || colIdx >= rows(rowIdx + 1).length) ""
          else rows(rowIdx + 1)(colIdx)
        if (nextDown == UCEL || nextDown == XCEL)
          rowSpan += countSpanDown(rows, rowIdx + 1, colIdx, Set(UCEL, XCEL))
        cells += Cell(cellText, rowSpan, colSpan, rowIdx, colIdx)
      }
      if (Tokens.contains(part) && part != NL) colIdx += 1
      if (part == NL) { rowIdx += 1; colIdx = 0 }
      index += 1
    }
    cells.result()
  }

  private def renderHtml(nRows: Int, maxCols: Int, cells: Vector[Cell]): String = {
    val byPos = cells.map(c => (c.startRow, c.startCol) -> c).toMap
    val sb = new java.lang.StringBuilder("<table>")
    var row = 0
    while (row < nRows) {
      sb.append("<tr>")
      var col = 0
      while (col < maxCols) {
        byPos.get((row, col)).foreach { cell =>
          val attrs = new java.lang.StringBuilder
          if (cell.rowSpan > 1) attrs.append(s""" rowspan="${cell.rowSpan}"""")
          if (cell.colSpan > 1) attrs.append(s""" colspan="${cell.colSpan}"""")
          sb.append("<td").append(attrs).append(">")
            .append(HtmlEntities.escape(cell.text)).append("</td>")
        }
        col += 1
      }
      sb.append("</tr>")
      row += 1
    }
    sb.append("</table>")
    sb.toString
  }

  def toHtml(otslContent: String): String = {
    if (otslContent.startsWith("<table") && otslContent.endsWith("</table>")) return otslContent
    val tokens = findTokens(otslContent)
    val mixedTexts = splitKeep(otslContent).filter(p => p.nonEmpty && PyStr.strip(p).nonEmpty)
    val rows0 = groupRows(tokens)
    if (rows0.isEmpty) return PyStr.strip(otslContent)
    val maxCols = rows0.map(_.length).max
    val rows = rows0.map(r => r ++ Vector.fill(maxCols - r.length)(ECEL))
    val parts = normalizeParts(rows, mixedTexts)
    val cells = collectCells(rows, parts)
    renderHtml(rows.length, maxCols, cells)
  }
}
