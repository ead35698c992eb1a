package graft.media

/** Image-preprocessing *dimension* math — the deterministic half of the
  * reference's image preprocessors. The pixel resampling itself is the
  * stubbed multimodal step (no media libs in this container); these size
  * computations drive batch shapes, UDF signatures and transport budgets and
  * are ported exactly:
  *
  *  - `resize_image_to_fit` / `prepare_ocr_image` 2500-cap
  *    (`/root/reference/src/churro_ocr/_internal/image.py:39-53`)
  *  - olmOCR 1288 longest-side (`providers/_ocr_processing.py:146-154`)
  *  - GLM-OCR 28-grid vLLM pixel budget (`:271-292`)
  *  - Chandra pixel-budget + 28-grid aspect-loss greedy shrink (`:300-342`)
  *  - MinerU `_resize_image_by_need` 50:1 pad + min-edge-28 upscale
  *    (`providers/_mineru25.py:606-628`)
  *  - Qianfan 448-tile dynamic tiling + ImageNet float32 normalize
  *    (`providers/hf.py:87-101,157-240`) — tile plan + tensor math here,
  *    real pixel crops/resize in [[ImageDecode]]
  *
  * Python `int()` truncates; `round()` is banker's → `Math.rint`.
  */
object ImagePrep {
  val MaxInlineImageDim = 2500
  val OlmocrTargetLongestDim = 1288
  val GlmGrid = 28
  val GlmTemporalPatch = 2
  val GlmVllmMaxImageItemLength = 6084
  val GlmVllmMaxPixels: Long = GlmGrid.toLong * GlmGrid * GlmTemporalPatch * GlmVllmMaxImageItemLength
  val ChandraMaxSize: (Int, Int) = (3072, 2048)
  val ChandraMinSize: (Int, Int) = (1792, 28)
  val ChandraGrid = 28
  val MineruMinEdge = 28
  val MineruMaxEdgeRatio = 50.0

  /** `resize_image_to_fit` target size (Python int() truncation). */
  def fitDims(width: Int, height: Int, maxWidth: Int, maxHeight: Int): (Int, Int) = {
    if (width <= maxWidth && height <= maxHeight) return (width, height)
    val scale = math.min(maxWidth.toDouble / width, maxHeight.toDouble / height)
    (math.max(1, (width * scale).toInt), math.max(1, (height * scale).toInt))
  }

  def prepareOcrDims(width: Int, height: Int): (Int, Int) =
    fitDims(width, height, MaxInlineImageDim, MaxInlineImageDim)

  def olmocrDims(width: Int, height: Int): (Int, Int) =
    fitDims(width, height, OlmocrTargetLongestDim, OlmocrTargetLongestDim)

  /** GLM-OCR: fit to 2500, then shrink to the 28-grid vLLM pixel budget. */
  def glmDims(width0: Int, height0: Int): (Int, Int) = {
    val (width, height) = prepareOcrDims(width0, height0)
    if (width < GlmGrid || height < GlmGrid) return (width, height)
    val rw = Math.rint(width.toDouble / GlmGrid).toLong * GlmGrid
    val rh = Math.rint(height.toDouble / GlmGrid).toLong * GlmGrid
    if (GlmTemporalPatch * rw * rh <= GlmVllmMaxPixels) return (width, height)
    val scale = math.sqrt(GlmTemporalPatch.toDouble * width * height / GlmVllmMaxPixels)
    val tw = math.max(GlmGrid, math.floor(width / scale / GlmGrid).toInt * GlmGrid)
    val th = math.max(GlmGrid, math.floor(height / scale / GlmGrid).toInt * GlmGrid)
    (tw, th)
  }

  /** Chandra OCR 2: pixel-budget scale, 28-block rounding, then a greedy
    * aspect-ratio-loss shrink while over budget.
    */
  def chandraDims(width: Int, height: Int): (Int, Int) = {
    if (width <= 0 || height <= 0) return (width, height)
    val maxPixels = ChandraMaxSize._1.toLong * ChandraMaxSize._2
    val minPixels = ChandraMinSize._1.toLong * ChandraMinSize._2
    val current = width.toLong * height
    var scale = 1.0
    if (current > maxPixels) scale = math.sqrt(maxPixels.toDouble / current)
    else if (current < minPixels) scale = math.sqrt(minPixels.toDouble / current)

    val aspect = width.toDouble / height
    var wb = math.max(1, Math.rint(width * scale / ChandraGrid).toInt)
    var hb = math.max(1, Math.rint(height * scale / ChandraGrid).toInt)
    var continueLoop = true
    while (continueLoop && wb.toLong * hb * ChandraGrid * ChandraGrid > maxPixels) {
      if (wb == 1 && hb == 1) continueLoop = false
      else if (wb == 1) hb -= 1
      else if (hb == 1) wb -= 1
      else {
        val widthLoss = math.abs((wb - 1).toDouble / hb - aspect)
        val heightLoss = math.abs(wb.toDouble / (hb - 1) - aspect)
        if (widthLoss < heightLoss) wb -= 1 else hb -= 1
      }
    }
    val size = (wb * ChandraGrid, hb * ChandraGrid)
    if (size == ((width, height))) (width, height) else size
  }

  // --- Qianfan 448-tile dynamic tiling (`providers/hf.py:87-101,157-240`) ---

  val QianfanImageSize = 448
  val QianfanMaxTiles = 12
  val QianfanMean: Array[Float] = Array(0.485f, 0.456f, 0.406f)
  val QianfanStd: Array[Float] = Array(0.229f, 0.224f, 0.225f)

  /** `_QIANFAN_TARGET_RATIOS` — the reference sorts a SET by tile count, so
    * ties keep CPython's set-iteration order; the closest-ratio scan is
    * order-sensitive on ties. This list is the captured order from
    * evaluating the reference's own expression (pinned; golden-checked).
    */
  val QianfanTargetRatios: Vector[(Int, Int)] = Vector(
    (1, 1), (1, 2), (2, 1), (3, 1), (1, 3), (2, 2), (4, 1), (1, 4), (5, 1), (1, 5),
    (1, 6), (6, 1), (3, 2), (2, 3), (7, 1), (1, 7), (4, 2), (2, 4), (1, 8), (8, 1),
    (1, 9), (3, 3), (9, 1), (2, 5), (5, 2), (10, 1), (1, 10), (11, 1), (1, 11),
    (12, 1), (3, 4), (4, 3), (1, 12), (6, 2), (2, 6))

  /** `_qianfan_find_closest_aspect_ratio` (`hf.py:157-176`): first strictly
    * closer ratio wins; an equal-distance ratio replaces it only when the
    * source area exceeds half the tiled area.
    */
  def qianfanClosestRatio(aspectRatio: Double, width: Int, height: Int,
                          imageSize: Int = QianfanImageSize): (Int, Int) = {
    var best = (1, 1)
    var bestDiff = Double.PositiveInfinity
    val area = width.toLong * height
    QianfanTargetRatios.foreach { ratio =>
      val tar = ratio._1.toDouble / ratio._2
      val diff = math.abs(aspectRatio - tar)
      if (diff < bestDiff) { bestDiff = diff; best = ratio }
      else if (diff == bestDiff &&
        area > 0.5 * imageSize * imageSize * ratio._1 * ratio._2) best = ratio
    }
    best
  }

  /** One planned Qianfan preprocessing: resize target, tile crop boxes
    * (left, top, right, bottom), thumbnail flag (`hf.py:179-217`).
    */
  final case class QianfanPlan(ratio: (Int, Int), targetW: Int, targetH: Int,
                               boxes: Vector[(Int, Int, Int, Int)], thumbnail: Boolean) {
    def nImages: Int = boxes.length + (if (thumbnail) 1 else 0)
  }

  def qianfanTiles(width: Int, height: Int, imageSize: Int = QianfanImageSize,
                   useThumbnail: Boolean = true): QianfanPlan = {
    val aspect = width.toDouble / math.max(height, 1)
    val t = qianfanClosestRatio(aspect, width, height, imageSize)
    val (tw, th) = (imageSize * t._1, imageSize * t._2)
    val blocks = t._1 * t._2
    val gridW = tw / imageSize
    val boxes = (0 until blocks).map { i =>
      val left = (i % gridW) * imageSize
      val top = (i / gridW) * imageSize
      (left, top, left + imageSize, top + imageSize)
    }.toVector
    QianfanPlan(t, tw, th, boxes, thumbnail = useThumbnail && blocks != 1)
  }

  /** `_qianfan_image_to_tensor` (`hf.py:219-228`): RGB bytes → CHW float32,
    * /255 then ImageNet mean/std — all in float32 like the numpy original.
    */
  def qianfanNormalizeChw(rgb: Array[Byte], w: Int, h: Int): Array[Float] = {
    val wh = w * h
    val out = new Array[Float](3 * wh)
    var c = 0
    while (c < 3) {
      val mean = QianfanMean(c); val std = QianfanStd(c)
      var i = 0
      while (i < wh) {
        out(c * wh + i) = (((rgb(i * 3 + c) & 0xFF) / 255.0f) - mean) / std
        i += 1
      }
      c += 1
    }
    out
  }

  /** MinerU `_resize_image_by_need`: 50:1 aspect cap via white padding, then
    * min-edge-28 upscale (math.ceil).
    */
  def mineruDims(width0: Int, height0: Int,
                 minEdge: Int = MineruMinEdge,
                 maxEdgeRatio: Double = MineruMaxEdgeRatio): (Int, Int) = {
    var (width, height) = (width0, height0)
    val edgeRatio = math.max(width, height).toDouble / math.min(width, height)
    if (edgeRatio > maxEdgeRatio) {
      if (width > height) height = math.ceil(width / maxEdgeRatio).toInt
      else width = math.ceil(height / maxEdgeRatio).toInt
    }
    if (math.min(width, height) < minEdge) {
      val scale = minEdge.toDouble / math.min(width, height)
      width = math.ceil(width * scale).toInt
      height = math.ceil(height * scale).toInt
    }
    (width, height)
  }
}
