package graft.detect

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.text.PyStr
import scala.jdk.CollectionConverters._

/** Page-detection coordinate math and wire-protocol parsing.
  *
  * Ports of `/root/reference/src/churro_ocr/providers/_page_detection_helpers.py`:
  * normalized 0–1000 integer boxes with border-aware clamps (`:19-33,91-94`),
  * pixel denormalization (`:156-161`), the pad+resize inverse transform
  * (`:97-124`), code-fence stripping (`:223-232`) and the strict JSON parsers
  * for page boxes, target boxes and edge-review decisions (`:235-445`).
  *
  * Python `round()` is banker's rounding — `Math.rint` everywhere.
  */
object PageDetect {

  val BorderFraction = 0.05
  val ProcessedMaxDim = 2500
  val ScaleWithBorder: Double = 1 + 2 * BorderFraction
  val NormalizedMinCoord: Double = BorderFraction / ScaleWithBorder * 1000
  val NormalizedMaxCoord: Double = (1 + BorderFraction) / ScaleWithBorder * 1000
  val EdgeNames: Vector[String] = Vector("left", "top", "right", "bottom")

  final case class ParseError(message: String) extends RuntimeException(message)

  /** `_clamp_normalized` — border-aware 0–1000 clamp with banker's rounding. */
  def clampNormalized(value: Double): Int = {
    val clamped = math.max(NormalizedMinCoord, math.min(NormalizedMaxCoord, value))
    val rounded = Math.rint(clamped).toInt
    math.max(0, math.min(1000, rounded))
  }

  /** `_PageBox` — normalized integer box. */
  final case class PageBox(pageIndex: Int, ymin: Int, xmin: Int, ymax: Int, xmax: Int) {
    /** `denormalize` — 0–1000 → pixel coords (left, top, right, bottom). */
    def denormalize(width: Int, height: Int): (Int, Int, Int, Int) = {
      def clampTo(v: Double, hi: Int): Int =
        math.max(0, math.min(hi, Math.rint(v).toInt))
      (clampTo(xmin.toDouble * width / 1000, width),
        clampTo(ymin.toDouble * height / 1000, height),
        clampTo(xmax.toDouble * width / 1000, width),
        clampTo(ymax.toDouble * height / 1000, height))
    }
  }

  object PageBox {
    def fromFields(pageIndex: Int, left: Double, top: Double, right: Double, bottom: Double): PageBox =
      PageBox(pageIndex,
        ymin = clampNormalized(top), xmin = clampNormalized(left),
        ymax = clampNormalized(bottom), xmax = clampNormalized(right))
  }

  /** `_bbox_from_polygon` — min/max hull of a point list. */
  def bboxFromPolygon(polygon: Seq[(Double, Double)]): (Double, Double, Double, Double) =
    (polygon.map(_._1).min, polygon.map(_._2).min,
      polygon.map(_._1).max, polygon.map(_._2).max)

  /** `_normalize_polygon` — flat coords → point pairs, dropping a closing dup. */
  def normalizePolygon(coordinates: Seq[Double]): Vector[(Double, Double)] = {
    if (coordinates == null || coordinates.length < 6) return Vector.empty
    val pairs = (0 until coordinates.length - 1 by 2)
      .map(i => (coordinates(i), coordinates(i + 1))).toVector
    if (pairs.length > 1 && pairs.head == pairs.last) pairs.dropRight(1) else pairs
  }

  /** `_normalize_azure_page_polygon` (`_page_detection_helpers.py:628-638`):
    * scale a page-space polygon into image space by the (image/page) size
    * ratio; zero/absent page dims fall back to the image's own dims
    * (scale 1.0). Empty/degenerate polygons stay empty.
    */
  def normalizeAzurePagePolygon(rawPolygon: Seq[Double],
                                pageWidth: Double, pageHeight: Double,
                                imageWidth: Int, imageHeight: Int): Vector[(Double, Double)] = {
    val polygon = normalizePolygon(rawPolygon)
    if (polygon.isEmpty) return Vector.empty
    val pw = if (pageWidth != 0.0) pageWidth else imageWidth.toDouble
    val ph = if (pageHeight != 0.0) pageHeight else imageHeight.toDouble
    val scaleX = if (pw != 0.0) imageWidth / pw else 1.0
    val scaleY = if (ph != 0.0) imageHeight / ph else 1.0
    polygon.map { case (x, y) => (x * scaleX, y * scaleY) }
  }

  /** `_merge_instruction_prompts` (`_page_detection_helpers.py:618-625`):
    * non-empty stripped parts joined with a blank line; none → error.
    */
  def mergeInstructionPrompts(parts: Seq[String]): String = {
    val merged = parts.filter(_ != null).map(graft.text.PyStr.strip).filter(_.nonEmpty)
    require(merged.nonEmpty, "Expected at least one non-empty instruction prompt.")
    merged.mkString("\n\n")
  }

  /** `_PageDetectionTransform` — inverse of the white-border pad + resize. */
  final case class DetectionTransform(
      originalSize: (Int, Int),
      border: (Int, Int),
      paddedSize: (Int, Int),
      processedSize: (Int, Int),
      scaleX: Double,
      scaleY: Double) {

    def mapBoxToOriginal(box: PageBox): (Double, Double, Double, Double) = {
      val (processedWidth, processedHeight) = processedSize
      val (originalWidth, originalHeight) = originalSize
      val (borderWidth, borderHeight) = border
      val (l, t, r, b) = box.denormalize(processedWidth, processedHeight)
      val sx = if (scaleX == 0.0) 1.0 else scaleX
      val sy = if (scaleY == 0.0) 1.0 else scaleY
      def cw(v: Double) = math.max(0.0, math.min(originalWidth.toDouble, v))
      def ch(v: Double) = math.max(0.0, math.min(originalHeight.toDouble, v))
      (cw(l / sx - borderWidth), ch(t / sy - borderHeight),
        cw(r / sx - borderWidth), ch(b / sy - borderHeight))
    }
  }

  /** Pure-dimension halves of `_add_white_border` / `_resize_image_to_fit` /
    * `_prepare_detection_image` (the pixel copy is the stubbed multimodal
    * step; the transform record drives the coordinate mapping above).
    */
  def borderDims(width: Int, height: Int, fraction: Double = BorderFraction): (Int, Int) =
    if (fraction <= 0) (0, 0)
    else (math.max(1, Math.rint(width * fraction).toInt),
      math.max(1, Math.rint(height * fraction).toInt))

  def resizeToFitDims(width: Int, height: Int, maxDim: Int = ProcessedMaxDim): (Int, Int) = {
    val longest = math.max(width, height)
    if (longest <= maxDim) (width, height)
    else {
      val scale = maxDim.toDouble / longest
      (math.max(1, Math.rint(width * scale).toInt), math.max(1, Math.rint(height * scale).toInt))
    }
  }

  def prepareDetectionTransform(width: Int, height: Int): DetectionTransform = {
    val (bw, bh) = borderDims(width, height)
    val padded = (width + 2 * bw, height + 2 * bh)
    val processed = resizeToFitDims(padded._1, padded._2)
    DetectionTransform(
      originalSize = (width, height),
      border = (bw, bh),
      paddedSize = padded,
      processedSize = processed,
      scaleX = if (padded._1 != 0) processed._1.toDouble / padded._1 else 1.0,
      scaleY = if (padded._2 != 0) processed._2.toDouble / padded._2 else 1.0)
  }

  /** `_strip_code_fence`. */
  def stripCodeFence(raw: String): String = {
    var text = PyStr.strip(raw)
    if (text.startsWith("```")) {
      var lines = PyStr.splitLines(text)
      if (lines.length >= 2) {
        lines = lines.tail
        if (lines.nonEmpty && lines.last.startsWith("```")) lines = lines.dropRight(1)
      }
      text = PyStr.strip(lines.mkString("\n"))
    }
    text
  }

  // ---- JSON protocol parsers -------------------------------------------------

  private val mapper = new ObjectMapper()

  private def parseJsonObject(text: String, context: String): JsonNode = {
    val node =
      try mapper.readTree(text)
      catch { case _: Exception => throw ParseError(s"$context returned invalid JSON.") }
    if (node == null || !node.isObject)
      throw ParseError(s"$context response must be a JSON object.")
    node
  }

  private def pyFloat(n: JsonNode, context: String): Double =
    if (n != null && n.isNumber) n.asDouble()
    else if (n != null && n.isTextual)
      try n.asText().trim.toDouble
      catch { case _: Exception => throw ParseError(s"$context: not a number") }
    else throw ParseError(s"$context: not a number")

  private def pyInt(n: JsonNode, context: String): Int =
    if (n != null && n.isIntegralNumber) n.asInt()
    else if (n != null && n.isNumber) n.asDouble().toInt // Python int() truncates
    else if (n != null && n.isTextual)
      try n.asText().trim.toInt
      catch { case _: Exception => throw ParseError(s"$context: not an int") }
    else throw ParseError(s"$context: not an int")

  private def boxFromJson(node: JsonNode): PageBox = {
    if (!node.has("page_index"))
      throw ParseError("Expected 'page_index' key in page-detection response.")
    val required = Seq("left", "top", "right", "bottom")
    val missing = required.filterNot(node.has)
    if (missing.nonEmpty)
      throw ParseError(s"Page-detection response must include keys ${required.sorted}, missing ${missing.sorted}.")
    PageBox.fromFields(
      pyInt(node.get("page_index"), "page_index"),
      pyFloat(node.get("left"), "left"), pyFloat(node.get("top"), "top"),
      pyFloat(node.get("right"), "right"), pyFloat(node.get("bottom"), "bottom"))
  }

  /** `_parse_page_boxes_json`: `{"pages":[{page_index,left,top,right,bottom}…]}`
    * → boxes sorted by page_index; strict validation.
    */
  def parsePageBoxesJson(output: String): Vector[PageBox] = {
    val payload = parseJsonObject(stripCodeFence(output), "LLM page detection")
    val pages = payload.get("pages")
    if (pages == null || !pages.isArray)
      throw ParseError("LLM page detection response must include a `pages` list.")
    val boxes = pages.elements().asScala.zipWithIndex.map { case (page, i) =>
      if (!page.isObject)
        throw ParseError(s"LLM page detection entry $i must be an object.")
      try boxFromJson(page)
      catch { case e: ParseError => throw ParseError(s"LLM page detection entry $i is invalid: ${e.message}") }
    }.toVector
    boxes.sortBy(_.pageIndex)
  }

  /** `_parse_target_box_json`: box-or-not-found protocol with fallback keys. */
  def parseTargetBoxJson(output: String, targetKey: String, foundKey: String,
                         errorContext: String): Option[PageBox] = {
    val payload = parseJsonObject(stripCodeFence(output), errorContext)
    def buildTarget(n: JsonNode): Option[PageBox] = {
      val required = Seq("left", "top", "right", "bottom")
      if (required.exists(k => !n.has(k)))
        throw ParseError(s"$errorContext bbox is invalid: missing keys")
      Some(PageBox.fromFields(1,
        pyFloat(n.get("left"), "left"), pyFloat(n.get("top"), "top"),
        pyFloat(n.get("right"), "right"), pyFloat(n.get("bottom"), "bottom")))
    }
    if (Seq("left", "top", "right", "bottom").forall(payload.has))
      return buildTarget(payload)
    var rawTarget = payload.get(targetKey)
    if (rawTarget == null || rawTarget.isNull) {
      val bbox = payload.get("bbox")
      if (bbox != null && !bbox.isNull) rawTarget = bbox
    }
    if (rawTarget != null && rawTarget.isObject) return buildTarget(rawTarget)
    if (rawTarget != null && !rawTarget.isNull)
      throw ParseError(s"$errorContext response `$targetKey` must be an object or null.")

    val notFound =
      (payload.has(foundKey) && payload.get(foundKey).isBoolean && !payload.get(foundKey).asBoolean()) ||
        (payload.has("found") && payload.get("found").isBoolean && !payload.get("found").asBoolean()) ||
        (payload.has(targetKey) && payload.get(targetKey).isNull) ||
        (payload.has("bbox") && payload.get("bbox").isNull)
    if (notFound) None
    else throw ParseError(
      s"$errorContext response must include a `$targetKey` object or explicitly mark `$foundKey` false.")
  }

  def parseTextBlockBoxJson(output: String): Option[PageBox] =
    parseTargetBoxJson(output, targetKey = "block", foundKey = "block_found",
      errorContext = "LLM text-block localization")

  // ---- edge-review decisions ---------------------------------------------------

  sealed trait EdgeAction
  case object Expand extends EdgeAction
  case object Shrink extends EdgeAction
  case object NoChange extends EdgeAction

  final case class EdgeDecision(action: EdgeAction, amount: Int)

  final case class BoxReviewDecision(
      pageIndex: Int, left: EdgeDecision, top: EdgeDecision,
      right: EdgeDecision, bottom: EdgeDecision)

  /** `_parse_edge_review_decision` — action∈{expand,shrink,no_change},
    * amount clamped 0–1000 (banker's rounding), zeroed for no_change.
    */
  def parseEdgeDecision(node: JsonNode, edgeName: String): EdgeDecision = {
    if (node == null || !node.isObject)
      throw ParseError(s"Review edge '$edgeName' must be an object.")
    var rawAction = node.get("action")
    if (rawAction == null || rawAction.isNull) rawAction = node.get("decision")
    if (rawAction == null || !rawAction.isTextual)
      throw ParseError(s"Review edge '$edgeName' must include string 'action'.")
    val action = PyStr.lower(PyStr.strip(rawAction.asText())) match {
      case "expand" => Expand
      case "shrink" => Shrink
      case "no_change" => NoChange
      case _ => throw ParseError(
        s"Review edge '$edgeName' action must be one of 'expand', 'shrink', 'no_change'.")
    }
    val rawAmount = node.get("amount")
    val amount0 =
      if (rawAmount == null || rawAmount.isNull) 0
      else
        try Math.rint(pyFloat(rawAmount, "amount")).toInt
        catch { case _: ParseError => throw ParseError(s"Review edge '$edgeName' amount must be numeric.") }
    val amount = if (action == NoChange) 0 else math.max(0, math.min(1000, amount0))
    EdgeDecision(action, amount)
  }

  /** `_parse_single_edge_review_decision_json`. */
  def parseSingleEdgeReviewDecisionJson(output: String): (Int, String, EdgeDecision) = {
    val payload =
      try mapper.readTree(stripCodeFence(output))
      catch { case e: Exception => throw ParseError(s"Failed to decode edge-review response as JSON: $e") }
    if (payload == null || !payload.isObject)
      throw ParseError("Edge-review response must be a JSON object.")
    if (!payload.has("page_index"))
      throw ParseError("Edge-review response must include 'page_index'.")
    val rawEdge = payload.get("edge")
    if (rawEdge == null || !rawEdge.isTextual)
      throw ParseError("Edge-review response must include string 'edge'.")
    val edgeName = PyStr.lower(PyStr.strip(rawEdge.asText()))
    if (!EdgeNames.contains(edgeName))
      throw ParseError("Edge-review response 'edge' must be left/top/right/bottom.")
    val decisionNode = payload.get("decision")
    val decision =
      if (decisionNode != null && decisionNode.isObject) parseEdgeDecision(decisionNode, edgeName)
      else {
        val synthetic = mapper.createObjectNode()
        if (payload.has("action")) synthetic.set[JsonNode]("action", payload.get("action"))
        if (payload.has("amount")) synthetic.set[JsonNode]("amount", payload.get("amount"))
        parseEdgeDecision(synthetic, edgeName)
      }
    (pyInt(payload.get("page_index"), "page_index"), edgeName, decision)
  }

  /** `_boxes_equal` — element-wise fixpoint test for the review loop. */
  def boxesEqual(left: Seq[PageBox], right: Seq[PageBox]): Boolean =
    left.length == right.length && left.zip(right).forall { case (a, b) => a == b }
}
