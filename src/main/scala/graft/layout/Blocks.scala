package graft.layout

/** Content-block model for layout postprocessing.
  *
  * Mirrors `MinerU25ContentBlock`
  * (`/root/reference/src/churro_ocr/providers/_mineru25.py:148-227`):
  * 25 supported block kinds, a normalized [0,1] bbox (x1,y1,x2,y2 with
  * x1<x2, y1<y2), an optional rotation angle, optional content, and the
  * text-only `mergePrev` continuation flag. Engine-side extras: the source
  * span's `mediaRef`, absorbed-by-table marker, and the table image token map
  * (token → media ref) used by table rendering.
  */
final case class Block(
    kind: String,
    bbox: Array[Double],              // [x1, y1, x2, y2] in [0,1]
    angle: Int = 0,                   // 0 | 90 | 180 | 270
    content: Option[String] = None,
    mergePrev: Boolean = false,
    mediaRef: String = "",
    absorbedByTable: Boolean = false,
    tokenMap: Vector[(String, String)] = Vector.empty
)

object Blocks {
  /** `_SUPPORTED_BLOCK_TYPES` (`_mineru25.py:79-105`). */
  val SupportedTypes: Set[String] = Set(
    "text", "title", "table", "equation", "code", "algorithm", "aside_text",
    "ref_text", "phonetic", "list_item", "table_caption", "image_caption",
    "code_caption", "table_footnote", "image_footnote", "header", "footer",
    "page_number", "page_footnote", "image", "chart", "list", "image_block",
    "equation_block", "unknown")

  /** `MINERU2_5_PARATEXT_TYPES` (`_mineru25.py:27-34`). */
  val ParatextTypes: Set[String] =
    Set("header", "footer", "page_number", "aside_text", "page_footnote", "unknown")

  /** `_IMAGE_ANALYSIS_TYPES` / `_IMAGE_CAPTION_CONTAINER_TYPES` (`:76-77`). */
  val ImageAnalysisTypes: Set[String] = Set("image", "chart")
  val ImageCaptionContainerTypes: Set[String] = Set("image", "chart", "image_block")

  /** `_INTERNAL_BLOCK_THRESHOLD` (`:78`). */
  val InternalBlockThreshold: Double = 0.9
}

/** Axis-aligned bbox math (`_mineru25.py:370-388`). */
object BBoxOps {
  def area(a: Array[Double]): Double =
    math.max(0.0, a(2) - a(0)) * math.max(0.0, a(3) - a(1))

  def intersectionArea(a: Array[Double], b: Array[Double]): Double = {
    val x1 = math.max(a(0), b(0))
    val y1 = math.max(a(1), b(1))
    val x2 = math.min(a(2), b(2))
    val y2 = math.min(a(3), b(3))
    if (x2 <= x1 || y2 <= y1) 0.0 else (x2 - x1) * (y2 - y1)
  }

  /** Fraction of `inner`'s area covered by `outer`; 0 for degenerate inner. */
  def coverRatio(inner: Array[Double], outer: Array[Double]): Double = {
    val innerArea = area(inner)
    if (innerArea == 0.0) 0.0 else intersectionArea(inner, outer) / innerArea
  }

  /** `_convert_bbox` (`_mineru25.py:579-587`): integer 0–1000 coords, swap
    * inverted axes, reject out-of-range/degenerate, scale to [0,1].
    */
  def convert(x1r: Int, y1r: Int, x2r: Int, y2r: Int): Option[Array[Double]] = {
    if (Seq(x1r, y1r, x2r, y2r).exists(c => c < 0 || c > 1000)) return None
    val (x1, x2) = if (x2r < x1r) (x2r, x1r) else (x1r, x2r)
    val (y1, y2) = if (y2r < y1r) (y2r, y1r) else (y1r, y2r)
    if (x1 == x2 || y1 == y2) None
    else Some(Array(x1 / 1000.0, y1 / 1000.0, x2 / 1000.0, y2 / 1000.0))
  }
}
