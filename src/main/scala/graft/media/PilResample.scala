package graft.media

/** Pillow-exact BICUBIC resampling for 8-bit RGB.
  *
  * Implements the published Pillow `Resample.c` pipeline bit-for-bit (the
  * algorithm the reference's `Image.resize(..., BICUBIC)` calls in
  * `/root/reference/src/churro_ocr/providers/hf.py:179-240`):
  *
  *  - Keys cubic kernel with a = −0.5, support 2.0, kernel widened by the
  *    scale factor when downscaling (area averaging);
  *  - per-destination-pixel coefficient precompute: center = (xx+0.5)·scale,
  *    window [int(center−support+0.5), int(center+support+0.5)) clamped to
  *    the image, weights normalized to sum 1 in double;
  *  - fixed-point conversion at PRECISION_BITS = 32−8−2 = 22 with
  *    round-half-away ((int)(±0.5 + w·2²²));
  *  - two passes, horizontal then vertical, each accumulating
  *    `1<<(PRECISION_BITS−1) + Σ pixel·k` in 32-bit ints and clamping via
  *    clip8 (≥ 1<<30 → 255, ≤ 0 → 0, else >> 22).
  *
  * Every truncation and rounding matches the C source (`(int)` casts
  * truncate toward zero), so output bytes equal Pillow's — verified
  * differentially against the independent pure-Python twin
  * (tools/gen_resample_fixture.py → resample_goldens.json), since Pillow
  * itself does not ship in this sandbox.
  */
object PilResample {

  private val PrecisionBits = 32 - 8 - 2
  private val Support = 2.0

  /** Keys bicubic, a = −0.5 (Pillow's `bicubic_filter`). */
  private def kernel(x0: Double): Double = {
    val a = -0.5
    val x = if (x0 < 0) -x0 else x0
    if (x < 1.0) ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0
    else if (x < 2.0) (((x - 5.0) * x + 8.0) * x - 4.0) * a
    else 0.0
  }

  /** Pillow `precompute_coeffs` + `normalize_coeffs_8bpc` for a full-image
    * box: per output index the (xmin, xmax) window and ksize int32 weights.
    */
  private def coeffs(inSize: Int, outSize: Int): (Int, Array[Int], Array[Int]) = {
    val scale = inSize.toDouble / outSize
    val filterscale = if (scale < 1.0) 1.0 else scale
    val support = Support * filterscale
    val ksize = math.ceil(support).toInt * 2 + 1
    val bounds = new Array[Int](outSize * 2)
    val kk = new Array[Int](outSize * ksize)
    val prek = new Array[Double](ksize)
    val ss = 1.0 / filterscale
    var xx = 0
    while (xx < outSize) {
      val center = (xx + 0.5) * scale
      var xmin = (center - support + 0.5).toInt
      if (xmin < 0) xmin = 0
      var xmax = (center + support + 0.5).toInt
      if (xmax > inSize) xmax = inSize
      xmax -= xmin
      var ww = 0.0
      var x = 0
      while (x < xmax) {
        val w = kernel((x + xmin - center + 0.5) * ss)
        prek(x) = w
        ww += w
        x += 1
      }
      x = 0
      while (x < xmax) {
        val w = if (ww != 0.0) prek(x) / ww else prek(x)
        kk(xx * ksize + x) =
          if (w < 0) (-0.5 + w * (1 << PrecisionBits)).toInt
          else (0.5 + w * (1 << PrecisionBits)).toInt
        x += 1
      }
      bounds(xx * 2) = xmin
      bounds(xx * 2 + 1) = xmax
      xx += 1
    }
    (ksize, bounds, kk)
  }

  private def clip8(in: Int): Byte =
    if (in >= (1 << PrecisionBits << 8)) 255.toByte
    else if (in <= 0) 0
    else (in >> PrecisionBits).toByte

  /** Bicubic resize, Pillow-exact. Identity sizes return the input as-is
    * (PIL's resize also short-circuits the no-op). */
  def resize(d: ImageDecode.Decoded, outW: Int, outH: Int): ImageDecode.Decoded = {
    if (outW == d.width && outH == d.height) return d
    require(outW > 0 && outH > 0, s"bad target ${outW}x$outH")
    // horizontal pass: (inW × inH) → (outW × inH)
    val horiz = if (outW == d.width) d.rgb else {
      val (ksize, bounds, kk) = coeffs(d.width, outW)
      val out = new Array[Byte](outW * d.height * 3)
      var y = 0
      while (y < d.height) {
        var xx = 0
        while (xx < outW) {
          val xmin = bounds(xx * 2)
          val xmax = bounds(xx * 2 + 1)
          var c = 0
          while (c < 3) {
            var acc = 1 << (PrecisionBits - 1)
            var x = 0
            while (x < xmax) {
              acc += (d.rgb((y * d.width + x + xmin) * 3 + c) & 0xFF) * kk(xx * ksize + x)
              x += 1
            }
            out((y * outW + xx) * 3 + c) = clip8(acc)
            c += 1
          }
          xx += 1
        }
        y += 1
      }
      out
    }
    // vertical pass: (outW × inH) → (outW × outH)
    val rgb = if (outH == d.height) horiz else {
      val (ksize, bounds, kk) = coeffs(d.height, outH)
      val out = new Array[Byte](outW * outH * 3)
      var yy = 0
      while (yy < outH) {
        val ymin = bounds(yy * 2)
        val ymax = bounds(yy * 2 + 1)
        var x = 0
        while (x < outW) {
          var c = 0
          while (c < 3) {
            var acc = 1 << (PrecisionBits - 1)
            var y = 0
            while (y < ymax) {
              acc += (horiz(((y + ymin) * outW + x) * 3 + c) & 0xFF) * kk(yy * ksize + y)
              y += 1
            }
            out((yy * outW + x) * 3 + c) = clip8(acc)
            c += 1
          }
          x += 1
        }
        yy += 1
      }
      out
    }
    ImageDecode.Decoded(outW, outH, rgb)
  }
}
