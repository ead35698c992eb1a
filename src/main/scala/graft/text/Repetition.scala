package graft.text

/** Tail-repetition detection.
  *
  * Port of `/root/reference/tooling/evaluation/repetition.py:6-32`:
  * KMP prefix-function over the reversed string; true when some suffix
  * (≥20% of the string) consists of a period repeated ≥2 times.
  */
object Repetition {

  def hasLongRepetition(text: String): Boolean = {
    val length = text.length
    if (length < 2) return false

    val rev = new java.lang.StringBuilder(text).reverse.toString
    val prefix = new Array[Int](length)
    var i = 1
    while (i < length) {
      var j = prefix(i - 1)
      while (j > 0 && rev.charAt(i) != rev.charAt(j)) j = prefix(j - 1)
      if (rev.charAt(i) == rev.charAt(j)) j += 1
      prefix(i) = j
      i += 1
    }

    val maxPrefix = (0.8 * length).toInt
    var prefixSize = 1
    while (prefixSize <= maxPrefix) {
      val remainder = length - prefixSize
      if (remainder >= 2) {
        val border = prefix(remainder - 1)
        val period = remainder - border
        if (border > 0 && remainder % period == 0 && remainder / period >= 2) return true
      }
      prefixSize += 1
    }
    false
  }
}
