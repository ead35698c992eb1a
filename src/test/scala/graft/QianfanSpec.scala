package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.media.{ImageDecode, ImagePrep}
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Qianfan 448-tile dynamic preprocessing parity
  * (`/root/reference/src/churro_ocr/providers/hf.py:87-101,157-240`):
  * ratio table (pinned CPython set order), closest-aspect scan, tile grid
  * fan-out, thumbnail rule, ImageNet float32 normalization — goldens from
  * the independent Python transcription in tools/gen_qianfan_goldens.py.
  */
class QianfanSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private val root = {
    val in = getClass.getResourceAsStream("/goldens/qianfan_goldens.json")
    require(in != null)
    try mapper.readTree(in) finally in.close()
  }

  test("target-ratio table matches the reference module's evaluated order") {
    val exp = root.get("ratios").elements().asScala
      .map(n => (n.get(0).asInt(), n.get(1).asInt())).toVector
    assert(ImagePrep.QianfanTargetRatios == exp)
  }

  test("tile plans: ratio, grid, boxes, thumbnail rule over 20 sizes") {
    root.get("tiles").elements().asScala.foreach { c =>
      val (w, h) = (c.get("width").asInt(), c.get("height").asInt())
      val plan = ImagePrep.qianfanTiles(w, h)
      assert(plan.ratio == ((c.get("ratio").get(0).asInt(), c.get("ratio").get(1).asInt())), s"($w,$h) ratio")
      assert(plan.targetW == c.get("target_w").asInt() && plan.targetH == c.get("target_h").asInt(), s"($w,$h) target")
      assert(plan.boxes.length == c.get("blocks").asInt(), s"($w,$h) blocks")
      assert(plan.thumbnail == c.get("thumbnail").asBoolean(), s"($w,$h) thumbnail")
      assert(plan.nImages == c.get("n_images").asInt(), s"($w,$h) n_images")
      val expBoxes = c.get("boxes").elements().asScala
        .map(b => (b.get(0).asInt(), b.get(1).asInt(), b.get(2).asInt(), b.get(3).asInt())).toVector
      assert(plan.boxes == expBoxes, s"($w,$h) boxes")
    }
  }

  test("ImageNet float32 normalization is bit-exact vs numpy") {
    root.get("normalize").elements().asScala.foreach { c =>
      val rgb = Array(
        c.get("rgb").get(0).asInt().toByte,
        c.get("rgb").get(1).asInt().toByte,
        c.get("rgb").get(2).asInt().toByte)
      val got = ImagePrep.qianfanNormalizeChw(rgb, 1, 1)
      (0 until 3).foreach { ch =>
        val exp = c.get("chw").get(ch).asDouble().toFloat
        assert(got(ch) == exp, s"rgb=${c.get("rgb")} channel $ch: ${got(ch)} != $exp")
      }
    }
  }

  test("pixel path: tile crops are exact sub-grids; batch shape (n, 3, 448, 448)") {
    // deterministic 896x448 image -> 2 tiles + thumbnail; no resize on the
    // tile pass (already grid-sized), so tile pixels are exact crops
    val (w, h) = (896, 448)
    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    while (i < rgb.length) { rgb(i) = ((i * 31) % 251).toByte; i += 1 }
    val d = ImageDecode.Decoded(w, h, rgb)
    val tensors = ImageDecode.qianfanPixelValues(d)
    assert(tensors.length == 3)
    assert(tensors.forall(_.length == 3 * 448 * 448))
    // left tile, channel 0, pixel (0,0) must equal the source pixel's red
    val expR = ((rgb(0) & 0xFF) / 255.0f - ImagePrep.QianfanMean(0)) / ImagePrep.QianfanStd(0)
    assert(tensors.head(0) == expR)
    // right tile (x offset 448), pixel (0,0) red
    val srcR = rgb(448 * 3) & 0xFF
    val expR2 = (srcR / 255.0f - ImagePrep.QianfanMean(0)) / ImagePrep.QianfanStd(0)
    assert(tensors(1)(0) == expR2)
  }
}
