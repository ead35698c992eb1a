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
  def distance(a0: String, b0: String, maxCost: Int = Int.MaxValue): Int = {
    if (a0 == b0) return 0
    // rapidfuzz-style common affix removal: shared prefixes/suffixes never
    // participate in an optimal edit script, so the DP runs only on the
    // differing core (near-identical evaluation pairs go from O(nm) to
    // O(diff^2))
    var lo = 0
    val minLen = math.min(a0.length, b0.length)
    while (lo < minLen && a0.charAt(lo) == b0.charAt(lo)) lo += 1
    var aHi = a0.length
    var bHi = b0.length
    while (aHi > lo && bHi > lo && a0.charAt(aHi - 1) == b0.charAt(bHi - 1)) { aHi -= 1; bHi -= 1 }
    val a = a0.substring(lo, aHi)
    val b = b0.substring(lo, bHi)
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
