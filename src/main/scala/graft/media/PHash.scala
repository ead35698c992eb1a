package graft.media

/** Perceptual image hash (pHash, DCT class) — the multimodal member of the
  * dedup family: re-encoded, brightness-shifted, or slightly-noised copies
  * of an image land within a small Hamming distance, while different
  * scenes land far apart. Deterministic BY CONSTRUCTION across languages:
  *
  *  1. resize to 32×32 through [[PilResample]] (the Pillow-bit-exact
  *     fixed-point bicubic — the Python twin calls the same algorithm);
  *  2. integer-luma grayscale ((299r+587g+114b)/1000, truncating);
  *  3. 2-D DCT-II with an INTEGER cosine table (round(cos·2^14) — the
  *     rounding absorbs any sub-ulp libm difference between JVM and
  *     CPython), row pass then column pass, all in Long (≤ 2^47, no
  *     overflow);
  *  4. keep the 8×8 low-frequency block; threshold at the LOWER MEDIAN
  *     (32nd smallest) of the 63 non-DC coefficients — a mean threshold
  *     degenerates when a few large-magnitude negative coefficients drag
  *     it (measured: mean-split hashes were ~80% ones and structurally
  *     different scenes landed within Hamming 6);
  *  5. 63-bit hash, MSB-first over coefficients (0,1)…(7,7):
  *     bit = coefficient > median (≈ balanced 31/32 split).
  *
  * Per image this is a pure function (no shuffle); at corpus scale the
  * hash feeds the banded-LSH pair machinery the text family already has.
  */
object PHash {

  private val N = 32
  private val Scale = 1 << 14

  // table(k)(x) = round(cos(π(2x+1)k / 2N) · 2^14) — integers, so both
  // twins agree bit-for-bit regardless of libm
  private val table: Array[Array[Long]] = Array.tabulate(N, N) { (k, x) =>
    Math.round(Math.cos(Math.PI * (2 * x + 1) * k / (2.0 * N)) * Scale)
  }

  /** 63-bit perceptual hash of a decoded RGB image. */
  def of(img: ImageDecode.Decoded): Long = {
    val small = PilResample.resize(img, N, N)
    val g = new Array[Long](N * N)
    var i = 0
    while (i < N * N) {
      val o = i * 3
      g(i) = ImageDecode.lumaInt(small.rgb, o).toLong
      i += 1
    }
    // row pass: r(y)(u) = Σ_x g(y,x)·table(u)(x) — only u < 8 is ever read
    // by the low-frequency column pass, so computing all N frequency
    // columns would spend 4× the multiply-adds of the whole DCT for rows
    // that are thrown away (this is the per-image hot path)
    val r = Array.ofDim[Long](N, 8)
    var y = 0
    while (y < N) {
      var u = 0
      while (u < 8) {
        var acc = 0L
        var x = 0
        while (x < N) { acc += g(y * N + x) * table(u)(x); x += 1 }
        r(y)(u) = acc
        u += 1
      }
      y += 1
    }
    // column pass, low-frequency 8×8 only: f(v)(u) = Σ_y r(y)(u)·table(v)(y)
    val coefs = new Array[Long](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var acc = 0L
        var yy = 0
        while (yy < N) { acc += r(yy)(u) * table(v)(yy); yy += 1 }
        coefs(v * 8 + u) = acc
        u += 1
      }
      v += 1
    }
    val med = coefs.slice(1, 64).sorted.apply(31) // lower median of 63
    var h = 0L
    var k = 1
    while (k < 64) {
      h = (h << 1) | (if (coefs(k) > med) 1L else 0L)
      k += 1
    }
    h
  }

  def hex(h: Long): String = f"$h%016x"

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
