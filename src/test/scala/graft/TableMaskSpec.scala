package graft

import graft.media.{ImageDecode, TableMask}
import org.scalatest.funsuite.AnyFunSuite

/** `_mask_and_encode_table_image` pixel pipeline + the font-size binary
  * search (`_mineru25.py:251-280,486-576`).
  */
class TableMaskSpec extends AnyFunSuite {

  test("optimal text size: binary search against a monotone measure") {
    // measure: width = 10*size, height = 2*size; box 300x100, fill 0.7 ->
    // width constraint: 10*s <= 210 -> s <= 21; height: 2*s <= 70 -> s <= 35
    val (size, w, h) = TableMask.optimalTextSize(s => (10 * s, 2 * s), 300, 100)
    assert(size == 21 && w == 210 && h == 42)
    // nothing fits: best stays (minSize, 0, 0) like the reference
    val (s2, w2, h2) = TableMask.optimalTextSize(s => (10000 + s, 10000 + s), 10, 10)
    assert(s2 == 4 && w2 == 0 && h2 == 0)
    // bounded by maxSize
    val (s3, _, _) = TableMask.optimalTextSize(_ => (1, 1), 1000, 1000, maxSize = 64)
    assert(s3 == 64)
  }

  test("rotate_box_in_image parity (_mineru25.py:301-315)") {
    val box = (10, 20, 30, 50)
    val size = (100, 200)
    assert(TableMask.rotateBoxInImage(box, size, 0) == box)
    assert(TableMask.rotateBoxInImage(box, size, 90) == ((20, 70, 50, 90)))
    assert(TableMask.rotateBoxInImage(box, size, 180) == ((70, 150, 90, 180)))
    assert(TableMask.rotateBoxInImage(box, size, 270) == ((150, 10, 180, 30)))
  }

  test("mask pipeline: avg-color fill, deterministic tokens, JPEG data URIs") {
    // page 100x100 all gray 80; table occupies (0.1,0.1)-(0.9,0.9);
    // one absorbed image at (0.3,0.3)-(0.5,0.5) painted red on the page
    val gray = Array.fill(100 * 100 * 3)(80.toByte)
    val page0 = ImageDecode.Decoded(100, 100, gray)
    val page = ImageDecode.fillRect(page0, (30, 30, 50, 50), (200, 10, 10))
    val table = ImageDecode.crop(page, 10, 10, 90, 90)
    val out = TableMask.maskAndEncodeTableImage(
      page, (0.1, 0.1, 0.9, 0.9), tableAngle = 0,
      imageBBoxes = Seq((0.3, 0.3, 0.5, 0.5)),
      tableImage = table, docId = "doc_x", tableIdx = 0)
    assert(out.tokenMap.length == 1)
    val (token, uri) = out.tokenMap.head
    assert(token.matches("\\[[ACDGHKTWXYZ2345678]{4}\\]"))
    assert(uri.startsWith("data:image/jpeg;base64,"))
    // tokens are deterministic: same (docId, tableIdx) -> same token
    val again = TableMask.maskAndEncodeTableImage(
      page, (0.1, 0.1, 0.9, 0.9), 0, Seq((0.3, 0.3, 0.5, 0.5)), table, "doc_x", 0)
    assert(again.tokenMap.head._1 == token)
    // masked region (table-relative (20,20)-(40,40)) is filled with the
    // 8-point average color = gray 80 (all samples land outside the red box)
    def px(img: ImageDecode.Decoded, x: Int, y: Int): Seq[Int] =
      img.rgb.slice((y * img.width + x) * 3, (y * img.width + x) * 3 + 3).map(_ & 0xFF).toSeq
    assert(px(out.image, 30, 30) == Seq(80, 80, 80)) // was red, now masked
    assert(px(out.image, 5, 5) == Seq(80, 80, 80)) // untouched
    // the data URI decodes back to the red crop
    val png = java.util.Base64.getDecoder.decode(uri.stripPrefix("data:image/jpeg;base64,"))
    val crop = ImageDecode.loadImage(png)
    assert(crop.width == 20 && crop.height == 20)
    val c = px(crop, 10, 10)
    assert(c(0) > 150 && c(1) < 80 && c(2) < 80, s"JPEG crop should be red-ish: $c")
  }

  test("rotated table: mask box and crop follow the rotation") {
    val gray = Array.fill(60 * 40 * 3)(50.toByte)
    val page = ImageDecode.fillRect(ImageDecode.Decoded(60, 40, gray), (12, 8, 24, 16), (0, 250, 0))
    val table = ImageDecode.crop(page, 6, 4, 54, 36) // table crop (0.1..0.9 both axes)
    val out = TableMask.maskAndEncodeTableImage(
      page, (0.1, 0.1, 0.9, 0.9), tableAngle = 90,
      imageBBoxes = Seq((0.2, 0.2, 0.4, 0.4)),
      tableImage = table, docId = "d", tableIdx = 1)
    // rotated table dims swap
    assert(out.image.width == table.height && out.image.height == table.width)
    assert(out.tokenMap.length == 1)
  }
}
