package graft.text

/** HTML entity escape/unescape.
  *
  * `unescape` mirrors the subset of Python `html.unescape` the reference's
  * markup stripper depends on (`/root/reference/src/churro_ocr/prompts/ocr.py:186`):
  * numeric character references plus the common named entities. `escape`
  * mirrors Python `html.escape(s, quote=True)` exactly
  * (`/root/reference/src/churro_ocr/providers/_mineru25.py:777`).
  */
object HtmlEntities {

  private val named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "shy" -> "­", "copy" -> "©", "reg" -> "®",
    "trade" -> "™", "deg" -> "°", "middot" -> "·", "bull" -> "•",
    "hellip" -> "…", "ndash" -> "–", "mdash" -> "—",
    "lsquo" -> "‘", "rsquo" -> "’", "ldquo" -> "“", "rdquo" -> "”",
    "laquo" -> "«", "raquo" -> "»", "times" -> "×", "divide" -> "÷",
    "plusmn" -> "±", "frac12" -> "½", "frac14" -> "¼", "frac34" -> "¾",
    "sup1" -> "¹", "sup2" -> "²", "sup3" -> "³",
    "sect" -> "§", "para" -> "¶", "dagger" -> "†", "Dagger" -> "‡",
    "pound" -> "£", "euro" -> "€", "cent" -> "¢", "yen" -> "¥",
    "szlig" -> "ß", "eacute" -> "é", "egrave" -> "è", "agrave" -> "à",
    "ccedil" -> "ç", "ouml" -> "ö", "uuml" -> "ü", "auml" -> "ä",
    "ntilde" -> "ñ", "oslash" -> "ø", "aring" -> "å", "aelig" -> "æ",
    "thorn" -> "þ", "eth" -> "ð"
  )

  private val entityRe =
    java.util.regex.Pattern.compile("&(#[0-9]+|#[xX][0-9a-fA-F]+|[a-zA-Z][a-zA-Z0-9]*);")

  def unescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val m = entityRe.matcher(s)
    val sb = new java.lang.StringBuilder
    var last = 0
    while (m.find()) {
      sb.append(s, last, m.start())
      val body = m.group(1)
      val rep: String =
        if (body.startsWith("#x") || body.startsWith("#X"))
          tryCodepoint(Integer.parseInt(body.substring(2), 16), m.group(0))
        else if (body.startsWith("#"))
          tryCodepoint(Integer.parseInt(body.substring(1)), m.group(0))
        else named.getOrElse(body, m.group(0))
      sb.append(rep)
      last = m.end()
    }
    sb.append(s, last, s.length)
    sb.toString
  }

  private def tryCodepoint(cp: Int, orig: String): String =
    if (Character.isValidCodePoint(cp) && cp != 0) new String(Character.toChars(cp)) else orig

  /** Python `html.escape(s)` with quote=True. */
  def escape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case '"' => sb.append("&quot;")
        case '\'' => sb.append("&#x27;")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}
