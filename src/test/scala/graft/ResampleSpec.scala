package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.media.{ImageDecode, PilResample}
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Differential parity for the Pillow-exact bicubic: the pure-Python twin
  * (tools/gen_resample_fixture.py) implements the same published Resample.c
  * pipeline from scratch; any drift in kernel, window math, fixed-point
  * rounding, pass order or clamping fails here byte-for-byte.
  */
class ResampleSpec extends AnyFunSuite {

  private val root: JsonNode = {
    val in = getClass.getResourceAsStream("/goldens/resample_goldens.json")
    try new ObjectMapper().readTree(in) finally in.close()
  }

  private def pattern(w: Int, h: Int, seed: Int): Array[Byte] = {
    val out = new Array[Byte](w * h * 3)
    var i = 0
    for (y <- 0 until h; x <- 0 until w) {
      out(i) = ((x * 7 + y * 13 + seed * 31) % 256).toByte
      out(i + 1) = ((x * 3 + y * 5 + seed * 17) % 256).toByte
      out(i + 2) = ((x * 11 + y * 2 + seed * 53) % 256).toByte
      i += 3
    }
    out
  }

  test("bicubic resize matches the independent twin byte-for-byte") {
    val cases = root.get("bicubic").elements().asScala.toVector
    assert(cases.size == 8)
    cases.foreach { c =>
      val (iw, ih, seed) = (c.get("in_w").asInt, c.get("in_h").asInt, c.get("seed").asInt)
      val (ow, oh) = (c.get("out_w").asInt, c.get("out_h").asInt)
      val res = PilResample.resize(ImageDecode.Decoded(iw, ih, pattern(iw, ih, seed)), ow, oh)
      assert(res.width == ow && res.height == oh)
      val firstRow = c.get("first_row").elements().asScala.map(_.asInt).toVector
      assert(res.rgb.take(firstRow.length).map(_ & 0xFF).toVector == firstRow,
        s"first-row drift at ${iw}x$ih -> ${ow}x$oh")
      assert(ImageDecode.sha256Hex(res.rgb) == c.get("sha").asText,
        s"pixel drift at ${iw}x$ih -> ${ow}x$oh")
    }
  }

  test("downscale kernel widens (area averaging), upscale keeps support 2") {
    // structural sanity independent of the twin: a 4x downscale of a
    // constant image stays constant; an upscale of a constant stays constant
    val const = ImageDecode.Decoded(32, 32, Array.fill(32 * 32 * 3)(77.toByte))
    assert(PilResample.resize(const, 8, 8).rgb.forall(_ == 77.toByte))
    assert(PilResample.resize(const, 64, 64).rgb.forall(_ == 77.toByte))
  }
}
