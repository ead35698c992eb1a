package graft.text

/** Mojibake repair — the ftfy-class encoding fix every web-corpus cleanup
  * runs: text that was UTF-8 on the wire but got decoded as Windows-1252 /
  * Latin-1 somewhere upstream ("café" → "cafÃ©", "—" → "â€”") is detected
  * and re-decoded. Pure per-string function (a zero-shuffle projection in
  * the catalog), implemented from the published encodings only:
  *
  *  - each char maps back to the byte it mis-decoded from: identity for
  *    U+0000–U+00FF (Latin-1), plus the 27 Windows-1252 specials
  *    (U+20AC '€' ← 0x80, U+2014 '—' ← 0x97, …) — cp1252 is the superset
  *    decoding real pipelines hit, since 0x80–0x9F are printable there;
  *  - a char whose byte is a UTF-8 LEAD (0xC2–0xF4) followed by the right
  *    number of CONTINUATION-range bytes (0x80–0xBF) is strictly
  *    re-validated as UTF-8 (overlongs, surrogates, > U+10FFFF all
  *    rejected) and replaced by the decoded code point on success;
  *  - anything else — a lone 'Ã', 'â' before plain ASCII, genuine Latin-1
  *    text — passes through UNCHANGED: the repair never fires on a
  *    sequence that is not byte-exact UTF-8, so clean text is a fixpoint.
  */
object Mojibake {

  /** char → original byte under cp1252-with-Latin-1-fallback; -1 when the
    * char cannot have come from a single mis-decoded byte.
    */
  private val Cp1252Inverse: Map[Char, Int] = Map(
    '€' -> 0x80, '‚' -> 0x82, 'ƒ' -> 0x83, '„' -> 0x84,
    '…' -> 0x85, '†' -> 0x86, '‡' -> 0x87, 'ˆ' -> 0x88,
    '‰' -> 0x89, 'Š' -> 0x8A, '‹' -> 0x8B, 'Œ' -> 0x8C,
    'Ž' -> 0x8E, '‘' -> 0x91, '’' -> 0x92, '“' -> 0x93,
    '”' -> 0x94, '•' -> 0x95, '–' -> 0x96, '—' -> 0x97,
    '˜' -> 0x98, '™' -> 0x99, 'š' -> 0x9A, '›' -> 0x9B,
    'œ' -> 0x9C, 'ž' -> 0x9E, 'Ÿ' -> 0x9F)

  private def byteOf(c: Char): Int =
    if (c < 0x100) c.toInt else Cp1252Inverse.getOrElse(c, -1)

  /** Strict UTF-8 decode of `len` bytes starting at b0; -1 when invalid. */
  private def decodeStrict(b0: Int, bs: Array[Int], len: Int): Int = len match {
    case 2 =>
      val cp = ((b0 & 0x1F) << 6) | (bs(0) & 0x3F)
      if (cp >= 0x80) cp else -1
    case 3 =>
      val cp = ((b0 & 0x0F) << 12) | ((bs(0) & 0x3F) << 6) | (bs(1) & 0x3F)
      if (cp >= 0x800 && (cp < 0xD800 || cp > 0xDFFF)) cp else -1
    case _ =>
      val cp = ((b0 & 0x07) << 18) | ((bs(0) & 0x3F) << 12) |
        ((bs(1) & 0x3F) << 6) | (bs(2) & 0x3F)
      if (cp >= 0x10000 && cp <= 0x10FFFF) cp else -1
  }

  def fix(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    val cont = new Array[Int](3)
    var i = 0
    while (i < n) {
      val b0 = byteOf(s.charAt(i))
      val need =
        if (b0 >= 0xC2 && b0 <= 0xDF) 1
        else if (b0 >= 0xE0 && b0 <= 0xEF) 2
        else if (b0 >= 0xF0 && b0 <= 0xF4) 3
        else 0
      var ok = need > 0 && i + need < n
      var k = 0
      while (ok && k < need) {
        val b = byteOf(s.charAt(i + 1 + k))
        if (b < 0x80 || b > 0xBF) ok = false else cont(k) = b
        k += 1
      }
      val cp = if (ok) decodeStrict(b0, cont, need + 1) else -1
      if (cp >= 0) {
        sb.appendCodePoint(cp)
        i += need + 1
      } else {
        sb.append(s.charAt(i))
        i += 1
      }
    }
    sb.toString
  }
}
