package graft.text

/** Levenshtein distance and normalized similarity.
  *
  * Matches the reference's rapidfuzz usage
  * (`/root/reference/tooling/evaluation/evaluate_page.py:63-103`):
  * unit-cost edit distance with optional score cutoff, and NLS =
  * `1 - distance / max(len)` with the both-empty → 1.0 convention.
  */
object Levenshtein {

  /** Unit-cost edit distance; with `maxCost`, may return `maxCost + 1` when
    * the true distance exceeds the cutoff (rapidfuzz `score_cutoff` parity).
    */
  def distance(a: String, b: String, maxCost: Int = Int.MaxValue): Int = {
    if (a == b) return 0
    val (s, t) = if (a.length <= b.length) (a, b) else (b, a)
    val n = s.length
    val m = t.length
    if (n == 0) return math.min(m, if (maxCost == Int.MaxValue) m else maxCost + 1)
    if (m - n > maxCost) return maxCost + 1

    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    var i = 0
    while (i <= n) { prev(i) = i; i += 1 }
    var j = 1
    while (j <= m) {
      cur(0) = j
      val tc = t.charAt(j - 1)
      var rowMin = cur(0)
      i = 1
      while (i <= n) {
        val cost = if (s.charAt(i - 1) == tc) 0 else 1
        var v = prev(i - 1) + cost
        val del = prev(i) + 1
        if (del < v) v = del
        val ins = cur(i - 1) + 1
        if (ins < v) v = ins
        cur(i) = v
        if (v < rowMin) rowMin = v
        i += 1
      }
      if (maxCost != Int.MaxValue && rowMin > maxCost) return maxCost + 1
      val tmp = prev; prev = cur; cur = tmp
      j += 1
    }
    val d = prev(n)
    if (maxCost != Int.MaxValue && d > maxCost) maxCost + 1 else d
  }

  /** Normalized Levenshtein similarity (`evaluate_page.py:97-103`). */
  def nls(predicted: String, gold: String): Double = {
    val denominator = math.max(predicted.length, gold.length)
    if (denominator == 0) 1.0
    else 1.0 - distance(predicted, gold).toDouble / denominator
  }
}
