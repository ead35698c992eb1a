package graft.text

/** Python-compatible string helpers.
  *
  * The reference pipeline (stanford-oval/Churro) is Python; its text operators
  * rely on Python `str.strip()` / `str.splitlines()` / `str.casefold()`
  * semantics, which differ from `java.lang.String#trim` and `split("\n")`.
  * These helpers reproduce the Python behavior so the ported normalizers stay
  * byte-equal (SURVEY.md §7.4 risk 1).
  */
object PyStr {

  /** Characters `str.isspace()` considers whitespace: Unicode Zs/Zl/Zp plus
    * the bidi WS/B/S controls (\t \n \v \f \r \x1c-\x1f \x85).
    */
  def isSpace(c: Char): Boolean = c match {
    case '\t' | '\n' | '\u000B' | '\f' | '\r' => true
    case '\u001C' | '\u001D' | '\u001E' | '\u001F' => true
    case '\u0085' => true
    case _ => Character.isSpaceChar(c)
  }

  def strip(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && isSpace(s.charAt(i))) i += 1
    while (j > i && isSpace(s.charAt(j - 1))) j -= 1
    if (i == 0 && j == s.length) s else s.substring(i, j)
  }

  def lstrip(s: String): String = {
    var i = 0
    while (i < s.length && isSpace(s.charAt(i))) i += 1
    if (i == 0) s else s.substring(i)
  }

  def rstrip(s: String): String = {
    var j = s.length
    while (j > 0 && isSpace(s.charAt(j - 1))) j -= 1
    if (j == s.length) s else s.substring(0, j)
  }

  /** `str.strip(chars)` — strip any of `chars` from both ends. */
  def strip(s: String, chars: String): String = {
    var i = 0
    var j = s.length
    while (i < j && chars.indexOf(s.charAt(i)) >= 0) i += 1
    while (j > i && chars.indexOf(s.charAt(j - 1)) >= 0) j -= 1
    s.substring(i, j)
  }

  private def isLineBoundary(c: Char): Boolean = c match {
    case '\n' | '\r' | '\u000B' | '\f' => true
    case '\u001C' | '\u001D' | '\u001E' => true
    case '\u0085' | '\u2028' | '\u2029' => true
    case _ => false
  }

  /** `str.splitlines()` — splits on Python's full line-boundary set, treating
    * \r\n as one boundary, with no trailing empty element.
    */
  def splitLines(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var start = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (isLineBoundary(c)) {
        out += s.substring(start, i)
        if (c == '\r' && i + 1 < s.length && s.charAt(i + 1) == '\n') i += 1
        start = i + 1
      }
      i += 1
    }
    if (start < s.length) out += s.substring(start)
    out.result()
  }

  /** Approximate `str.casefold()` (full fold differs only on a handful of
    * codepoints like ß; the scaffolding prompts compared with it are ASCII).
    */
  def casefold(s: String): String = s.toLowerCase(java.util.Locale.ROOT)

  /** Python `str.lower()` ≈ per-string lowercase in the root locale. */
  def lower(s: String): String = s.toLowerCase(java.util.Locale.ROOT)
}
