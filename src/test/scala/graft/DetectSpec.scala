package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.detect.{PageDetect, Review}
import graft.detect.PageDetect._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Differential parity for the page-detection coordinate math, JSON protocol
  * parsers, and the review freeze state machine (goldens generated from the
  * reference's own functions — see FIXTURES.md §3 derivation notes).
  */
class DetectSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private val root: JsonNode = {
    val in = getClass.getResourceAsStream("/goldens/detect_goldens.json")
    require(in != null)
    try mapper.readTree(in) finally in.close()
  }
  private def cases(f: String) = root.get(f).elements().asScala.toVector

  test("clamp_normalized parity (banker's rounding)") {
    cases("clamp_normalized").foreach { c =>
      assert(PageDetect.clampNormalized(c.get("in").asDouble()) == c.get("out").asInt(),
        s"in=${c.get("in")}")
    }
  }

  private def boxOf(n: JsonNode): PageBox =
    PageBox.fromFields(n.get("page_index").asInt(), n.get("left").asDouble(),
      n.get("top").asDouble(), n.get("right").asDouble(), n.get("bottom").asDouble())

  test("PageBox normalization + denormalize parity") {
    cases("denormalize").foreach { c =>
      val pb = boxOf(c.get("box"))
      val norm = c.get("norm").elements().asScala.map(_.asInt()).toVector
      assert(Vector(pb.pageIndex, pb.xmin, pb.ymin, pb.xmax, pb.ymax) == norm)
      val (l, t, r, b) = pb.denormalize(c.get("w").asInt(), c.get("h").asInt())
      val exp = c.get("out").elements().asScala.map(_.asInt()).toVector
      assert(Vector(l, t, r, b) == exp, s"box=${c.get("box")} w=${c.get("w")} h=${c.get("h")}")
    }
  }

  test("detection transform + map_box_to_original parity") {
    val boxes = Vector(
      PageBox.fromFields(0, 100, 200, 900, 800),
      PageBox.fromFields(1, 47.2, 954.9, 500.5, 499.5),
      PageBox.fromFields(2, 0, 0, 1000, 1000))
    cases("transform").foreach { c =>
      val tr = PageDetect.prepareDetectionTransform(c.get("w").asInt(), c.get("h").asInt())
      def pair(n: JsonNode) = (n.get(0).asInt(), n.get(1).asInt())
      assert((tr.border._1, tr.border._2) == pair(c.get("border")))
      assert((tr.paddedSize._1, tr.paddedSize._2) == pair(c.get("padded")))
      assert((tr.processedSize._1, tr.processedSize._2) == pair(c.get("processed")))
      assert(math.abs(tr.scaleX - c.get("scale_x").asDouble()) < 1e-12)
      assert(math.abs(tr.scaleY - c.get("scale_y").asDouble()) < 1e-12)
      val mapped = c.get("mapped").elements().asScala.toVector
      boxes.zip(mapped).foreach { case (b, m) =>
        val (x0, y0, x1, y1) = tr.mapBoxToOriginal(b)
        val exp = m.elements().asScala.map(_.asDouble()).toVector
        assert(Vector(x0, y0, x1, y1).zip(exp).forall { case (a, e) => math.abs(a - e) < 1e-9 },
          s"w=${c.get("w")} h=${c.get("h")} box=$b got=${(x0, y0, x1, y1)} exp=$exp")
      }
    }
  }

  test("strip_code_fence parity") {
    cases("strip_code_fence").foreach { c =>
      assert(PageDetect.stripCodeFence(c.get("in").asText()) == c.get("out").asText())
    }
  }

  test("parse_page_boxes_json parity (incl. error cases)") {
    cases("parse_page_boxes").foreach { c =>
      val in = c.get("in").asText()
      if (c.has("err")) {
        intercept[ParseError](PageDetect.parsePageBoxesJson(in))
      } else {
        val got = PageDetect.parsePageBoxesJson(in)
          .map(b => Vector(b.pageIndex, b.xmin, b.ymin, b.xmax, b.ymax))
        val exp = c.get("ok").elements().asScala
          .map(_.elements().asScala.map(_.asInt()).toVector).toVector
        assert(got == exp, s"in=$in")
      }
    }
  }

  test("parse_target_box_json parity (fallback keys + not-found protocol)") {
    cases("parse_target_box").foreach { c =>
      val in = c.get("in").asText()
      if (c.has("err")) intercept[ParseError](PageDetect.parseTextBlockBoxJson(in))
      else {
        val got = PageDetect.parseTextBlockBoxJson(in)
          .map(b => Vector(b.pageIndex, b.xmin, b.ymin, b.xmax, b.ymax))
        val ok = c.get("ok")
        if (ok.isNull) assert(got.isEmpty, s"in=$in")
        else assert(got.contains(ok.elements().asScala.map(_.asInt()).toVector), s"in=$in")
      }
    }
  }

  test("edge-review decision parse parity") {
    cases("parse_edge_review").foreach { c =>
      val in = c.get("in").asText()
      if (c.has("err")) intercept[ParseError](PageDetect.parseSingleEdgeReviewDecisionJson(in))
      else {
        val (pi, edge, d) = PageDetect.parseSingleEdgeReviewDecisionJson(in)
        val exp = c.get("ok")
        assert(pi == exp.get(0).asInt() && edge == exp.get(1).asText(), s"in=$in")
        val action = d.action match {
          case Expand => "expand"; case Shrink => "shrink"; case NoChange => "no_change"
        }
        assert(action == exp.get(2).asText() && d.amount == exp.get(3).asInt(), s"in=$in")
      }
    }
  }

  private def edgeDecision(n: JsonNode): EdgeDecision = {
    val a = n.get(0).asText() match {
      case "expand" => Expand; case "shrink" => Shrink; case _ => NoChange
    }
    EdgeDecision(a, n.get(1).asInt())
  }

  test("apply_box_review_decision parity (incl. degenerate repair)") {
    cases("apply_review").foreach { c =>
      val cur = boxOf(c.get("box"))
      val ds = c.get("decision").elements().asScala.toVector.map(edgeDecision)
      val dec = BoxReviewDecision(cur.pageIndex, ds(0), ds(1), ds(2), ds(3))
      val got = Review.applyBoxReviewDecision(cur, dec, cur.pageIndex)
      val exp = c.get("out").elements().asScala.map(_.asInt()).toVector
      assert(Vector(got.pageIndex, got.xmin, got.ymin, got.xmax, got.ymax) == exp)
    }
  }

  test("review freeze state machine parity (deadband, stability, oscillation)") {
    cases("stop_condition").foreach { c =>
      val seq = c.get("seq").elements().asScala.toVector
      def mk(n: JsonNode) = PageBox.fromFields(0, n.get("left").asDouble(),
        n.get("top").asDouble(), n.get("right").asDouble(), n.get("bottom").asDouble())
      var prior = mk(seq.head)
      val state = new Review.PageState
      val trace = c.get("trace").elements().asScala.toVector
      seq.tail.zip(trace).zipWithIndex.foreach { case ((reviewedRaw, expected), i) =>
        val accepted = Review.applyStopCondition(prior, mk(reviewedRaw), state, i + 1)
        val exp = expected.get("accepted").elements().asScala.map(_.asInt()).toVector
        assert(Vector(accepted.xmin, accepted.ymin, accepted.xmax, accepted.ymax) == exp,
          s"round ${i + 1}")
        PageDetect.EdgeNames.foreach { e =>
          assert(state.edges(e).frozen == expected.get("frozen").get(e).asBoolean(),
            s"round ${i + 1} edge $e frozen")
        }
        assert(state.fullyFrozen == expected.get("fully").asBoolean())
        prior = accepted
      }
    }
  }

  test("strip-delta → local-delta rescale parity") {
    cases("strip_delta").foreach { c =>
      val in = c.get("in").elements().asScala.map(_.asInt()).toVector
      assert(Review.convertStripDeltaToLocalDelta(in(0), in(1), in(2)) == c.get("out").asInt())
    }
  }

  test("normalize_polygon + bbox_from_polygon parity") {
    cases("normalize_polygon").foreach { c =>
      val in = Option(c.get("in")).filter(!_.isNull)
        .map(_.elements().asScala.map(_.asDouble()).toVector).getOrElse(null)
      val got = PageDetect.normalizePolygon(in)
      val exp = c.get("out").elements().asScala
        .map(p => (p.get(0).asDouble(), p.get(1).asDouble())).toVector
      assert(got == exp)
      if (c.has("bbox")) {
        val bb = c.get("bbox").elements().asScala.map(_.asDouble()).toVector
        val (x0, y0, x1, y1) = PageDetect.bboxFromPolygon(got)
        assert(Vector(x0, y0, x1, y1) == bb)
      }
    }
  }

  test("azure polygon -> image-space scale join (_page_detection_helpers.py:628-638)") {
    // page 850x1100 -> image 1700x2200: scale 2x both axes
    val poly = Seq(10.0, 20.0, 400.0, 20.0, 400.0, 500.0, 10.0, 500.0)
    val got = PageDetect.normalizeAzurePagePolygon(poly, 850.0, 1100.0, 1700, 2200)
    assert(got == Vector((20.0, 40.0), (800.0, 40.0), (800.0, 1000.0), (20.0, 1000.0)))
    // zero page dims fall back to image dims (scale 1.0)
    val same = PageDetect.normalizeAzurePagePolygon(poly, 0.0, 0.0, 1700, 2200)
    assert(same == PageDetect.normalizePolygon(poly))
    // degenerate polygon stays empty
    assert(PageDetect.normalizeAzurePagePolygon(Seq(1.0, 2.0), 10, 10, 20, 20).isEmpty)
    // mixed axes: page 100x200 -> image 300x100 (x3, x0.5)
    val mixed = PageDetect.normalizeAzurePagePolygon(Seq(10.0, 40.0, 20.0, 80.0, 30.0, 100.0), 100.0, 200.0, 300, 100)
    assert(mixed == Vector((30.0, 20.0), (60.0, 40.0), (90.0, 50.0)))
  }

  test("merge_instruction_prompts (_page_detection_helpers.py:618-625)") {
    assert(PageDetect.mergeInstructionPrompts(Seq("  a  ", null, "", "b")) == "a\n\nb")
    assert(PageDetect.mergeInstructionPrompts(Seq("only")) == "only")
    intercept[IllegalArgumentException](PageDetect.mergeInstructionPrompts(Seq("", "  ", null)))
  }
}
