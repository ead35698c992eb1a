package graft.detect

import graft.detect.PageDetect._

/** Iterative page-review refinement state machine.
  *
  * Ports of `/root/reference/src/churro_ocr/providers/_page_detection_review.py`:
  * edge-decision application with min-span-2 degenerate repair (`:23-64`),
  * the per-edge freeze state (deadband ≤6 for 2 stable rounds → freeze;
  * sign-flip oscillation with magnitude ratio ∈ [0.5, 2] → freeze at the
  * more-expansive coordinate, `:87-180`), and the strip-delta rescale
  * (`:228-238`). Constants from `_page_detection_helpers.py:25-28`.
  *
  * In the reference this loop wraps model calls; here it is the pure driver
  * logic, iterated driver-side between Spark stages (SURVEY.md §4 "early
  * termination").
  */
object Review {

  val StopDeadband = 6
  val StopStableRounds = 2
  val OscillationRatioMin = 0.5
  val OscillationRatioMax = 2.0

  /** `_apply_edge_decision_to_coordinate`. */
  def applyEdgeDecisionToCoordinate(currentValue: Int, decision: EdgeDecision,
                                    isMinEdge: Boolean): Int =
    decision.action match {
      case _ if decision.amount <= 0 => currentValue
      case NoChange => currentValue
      case Expand => if (isMinEdge) currentValue - decision.amount else currentValue + decision.amount
      case Shrink => if (isMinEdge) currentValue + decision.amount else currentValue - decision.amount
    }

  private def repairDegenerate(left0: Int, top0: Int, right0: Int, bottom0: Int): (Int, Int, Int, Int) = {
    var (left, top, right, bottom) = (left0, top0, right0, bottom0)
    val minSpan = 1
    if (left >= right) {
      val center = Math.floorDiv(left + right, 2)
      left = math.max(0, center - minSpan)
      right = math.min(1000, center + minSpan)
    }
    if (top >= bottom) {
      val center = Math.floorDiv(top + bottom, 2)
      top = math.max(0, center - minSpan)
      bottom = math.min(1000, center + minSpan)
    }
    (left, top, right, bottom)
  }

  /** `_apply_box_review_decision` — apply all four edges, repair degenerate
    * spans, re-clamp through PageBox construction.
    */
  def applyBoxReviewDecision(currentBox: PageBox, decision: BoxReviewDecision,
                             expectedPageIndex: Int): PageBox = {
    val l = applyEdgeDecisionToCoordinate(currentBox.xmin, decision.left, isMinEdge = true)
    val t = applyEdgeDecisionToCoordinate(currentBox.ymin, decision.top, isMinEdge = true)
    val r = applyEdgeDecisionToCoordinate(currentBox.xmax, decision.right, isMinEdge = false)
    val b = applyEdgeDecisionToCoordinate(currentBox.ymax, decision.bottom, isMinEdge = false)
    val (left, top, right, bottom) = repairDegenerate(l, t, r, b)
    PageBox.fromFields(expectedPageIndex, left, top, right, bottom)
  }

  /** Per-edge freeze state (`_new_page_review_stop_state`). */
  final class EdgeState {
    var frozen: Boolean = false
    var stableRounds: Int = 0
    var lastSign: Option[Int] = None
    var lastMag: Option[Int] = None
  }

  final class PageState {
    val edges: Map[String, EdgeState] = EdgeNames.map(_ -> new EdgeState).toMap
    def fullyFrozen: Boolean = edges.values.forall(_.frozen)
  }

  private def isOscillatingMagnitude(current: Int, previous: Int): Boolean = {
    if (current <= 0 || previous <= 0) return false
    val ratio = current.toDouble / previous
    ratio >= OscillationRatioMin && ratio <= OscillationRatioMax
  }

  private def moreExpansive(edgeName: String, priorValue: Int, candidateValue: Int): Int =
    if (edgeName == "left" || edgeName == "top") math.min(priorValue, candidateValue)
    else math.max(priorValue, candidateValue)

  private def edgeCoords(box: PageBox): Map[String, Int] =
    Map("left" -> box.xmin, "top" -> box.ymin, "right" -> box.xmax, "bottom" -> box.ymax)

  private def buildBox(pageIndex: Int, coords: Map[String, Int]): PageBox = {
    val (left, top, right, bottom) =
      repairDegenerate(coords("left"), coords("top"), coords("right"), coords("bottom"))
    PageBox.fromFields(pageIndex, left, top, right, bottom)
  }

  /** `_apply_page_review_stop_condition` — deadband/stability/oscillation
    * freeze logic; returns the accepted box for this round and mutates the
    * per-edge state.
    */
  def applyStopCondition(priorBox: PageBox, reviewedBox: PageBox,
                         state: PageState, roundIndex: Int): PageBox = {
    val prior = edgeCoords(priorBox)
    val reviewed = edgeCoords(reviewedBox)
    val finalCoords = scala.collection.mutable.Map(reviewed.toSeq: _*)

    EdgeNames.foreach { edgeName =>
      val es = state.edges(edgeName)
      val priorValue = prior(edgeName)
      val candidateValue = reviewed(edgeName)
      val delta = candidateValue - priorValue
      val magnitude = math.abs(delta)

      if (es.frozen) {
        finalCoords(edgeName) = priorValue
      } else if (magnitude <= StopDeadband) {
        finalCoords(edgeName) = priorValue
        es.stableRounds += 1
        if (es.stableRounds >= StopStableRounds) es.frozen = true
      } else {
        es.stableRounds = 0
        val sign = if (delta > 0) 1 else -1
        val oscillating = es.lastSign.exists(ps => ps != 0 && ps != sign) &&
          es.lastMag.exists(pm => pm > StopDeadband && isOscillatingMagnitude(magnitude, pm))
        if (oscillating) {
          finalCoords(edgeName) = moreExpansive(edgeName, priorValue, candidateValue)
          es.frozen = true
        } else {
          es.lastSign = Some(sign)
          es.lastMag = Some(magnitude)
        }
      }
    }
    buildBox(priorBox.pageIndex, finalCoords.toMap)
  }

  /** `_strip_axis_size_pixels`. */
  def stripAxisSizePixels(bounds: (Int, Int, Int, Int), edgeName: String): Int = {
    val (x0, y0, x1, y1) = bounds
    if (edgeName == "left" || edgeName == "right") x1 - x0 else y1 - y0
  }

  /** `_convert_strip_delta_to_local_delta` — rescale a normalized strip-space
    * delta into the local crop's normalized space.
    */
  def convertStripDeltaToLocalDelta(stripDeltaNormalized: Int, stripAxisPixels: Int,
                                    localAxisPixels: Int): Int = {
    if (stripDeltaNormalized <= 0 || stripAxisPixels <= 0 || localAxisPixels <= 0) return 0
    val deltaPixels = stripDeltaNormalized.toDouble * stripAxisPixels / 1000
    val localDelta = Math.rint(deltaPixels * 1000 / localAxisPixels).toInt
    math.max(0, math.min(1000, localDelta))
  }
}
