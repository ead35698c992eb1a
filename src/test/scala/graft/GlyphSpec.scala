package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.media.{GlyphFont, ImageDecode}
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Differential parity for the table-mask token-label step: the pure-Python
  * twin (tools/gen_glyph_fixture.py) renders avg-fill + centered 5×7 glyph
  * labels from the same deterministic pattern arrays and records the final
  * RGB sha256 — any drift in the font table, fit rule, centering or
  * contrast color fails here.
  */
class GlyphSpec extends AnyFunSuite {

  private val root: JsonNode = {
    val in = getClass.getResourceAsStream("/goldens/glyph_goldens.json")
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

  test("avg-fill + glyph label matches the pure-Python twin byte-for-byte") {
    val cases = root.get("glyph_draw").elements().asScala.toVector
    assert(cases.size == 5)
    cases.foreach { c =>
      val (w, h, seed) = (c.get("w").asInt, c.get("h").asInt, c.get("seed").asInt)
      val b = c.get("box")
      val box = (b.get(0).asInt, b.get(1).asInt, b.get(2).asInt, b.get(3).asInt)
      val token = c.get("token").asText
      val base = ImageDecode.Decoded(w, h, pattern(w, h, seed))
      val avg = ImageDecode.averageColor(base, box)
      assert(avg == ((c.get("avg").get(0).asInt, c.get("avg").get(1).asInt, c.get("avg").get(2).asInt)),
        s"avg color drift for $token")
      val filled = ImageDecode.fillRect(base, (box._1, box._2, box._3 + 1, box._4 + 1), avg)
      assert(GlyphFont.fitScale(token.length, box._3 - box._1, box._4 - box._2)
        == c.get("scale").asInt, s"fit scale drift for $token")
      val labeled = GlyphFont.drawCenteredLabel(filled, token, box, avg)
      assert(ImageDecode.sha256Hex(labeled.rgb) == c.get("sha").asText,
        s"pixel drift for $token (scale ${c.get("scale").asInt})")
    }
  }

  test("font covers the token alphabet plus the round-5 raster extension") {
    // the table-mask token alphabet must stay covered (its bitmaps are
    // frozen by the goldens); round 5 extends the table with the rest of
    // the uppercase alphabet, remaining digits and punctuation for the
    // PDF rasterizer — additions only
    val tokenAlphabet = ("ACDGHKTWXYZ" + "2345678" + "[]").toSet
    val rasterExtension = ("BEFIJLMNOPQRSUV" + "019" + ".,-:!").toSet
    assert(GlyphFont.rows.keySet == tokenAlphabet ++ rasterExtension)
    // every glyph is 7 rows of 5-bit masks
    GlyphFont.rows.values.foreach { g =>
      assert(g.length == 7 && g.forall(r => r >= 0 && r <= 0x1F))
    }
  }

  test("skip case leaves the filled image untouched") {
    val base = ImageDecode.Decoded(20, 10, pattern(20, 10, 1))
    val out = GlyphFont.drawCenteredLabel(base, "[ACD2]", (2, 2, 12, 8), (10, 10, 10))
    assert(out.rgb.sameElements(base.rgb))
  }
}
