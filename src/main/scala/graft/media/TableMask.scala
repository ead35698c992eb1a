package graft.media

import graft.layout.TableImageTokens

/** Real-pixel port of `_mask_and_encode_table_image`
  * (`/root/reference/src/churro_ocr/providers/_mineru25.py:486-576`) and the
  * font-size binary search (`:251-280`). Mask rectangle, average-color
  * fill, token map, rotations, JPEG data-URIs AND the token glyph labels
  * are real pixels end to end — labels render through the built-in 5×7
  * bitmap font ([[GlyphFont]]; the reference rasterizes a system TrueType
  * font, absent in this sandbox, with the same fit/center/contrast rules).
  * The point-size binary search semantics are additionally ported against
  * an injectable measure in [[optimalTextSize]].
  */
object TableMask {

  /** `_get_optimal_pil_font` (`_mineru25.py:251-280`): binary search for the
    * largest size whose measured text box fits `fillRatio` of the target
    * box; ≤30 iterations, returns (size, width, height) of the best fit
    * (best size defaults to `minSize`, best dims to 0 like the original).
    */
  def optimalTextSize(measure: Int => (Int, Int), boxW: Int, boxH: Int,
                      fillRatio: Double = 0.7, minSize: Int = 4, maxSize: Int = 256): (Int, Int, Int) = {
    var left = minSize
    var right = maxSize
    var best = (minSize, 0, 0)
    var iter = 0
    while (iter < 30 && left <= right) {
      val mid = (left + right) / 2
      val (w, h) = measure(mid)
      if (w <= boxW * fillRatio && h <= boxH * fillRatio) {
        best = (mid, w, h)
        left = mid + 1
      } else right = mid - 1
      iter += 1
    }
    best
  }

  /** `_pil_image_to_jpg_data_uri` (`_mineru25.py:283-287`): JPEG encode +
    * base64 data URI (unchunked).
    */
  def jpegDataUri(d: ImageDecode.Decoded): String =
    "data:image/jpeg;base64," +
      java.util.Base64.getEncoder.encodeToString(ImageDecode.encode(d, "jpg"))

  /** `_rotate_box_in_image` (`_mineru25.py:301-315`). */
  def rotateBoxInImage(box: (Int, Int, Int, Int), imageSize: (Int, Int), angle: Int): (Int, Int, Int, Int) = {
    val (x1, y1, x2, y2) = box
    val (width, height) = imageSize
    angle match {
      case 90 => (y1, width - x2, y2, width - x1)
      case 180 => (width - x2, height - y2, width - x1, height - y1)
      case 270 => (height - y2, x1, height - y1, x2)
      case _ => box
    }
  }

  /** One absorbed image's mask result. */
  final case class MaskedTable(image: ImageDecode.Decoded, tokenMap: Vector[(String, String)])

  /** The pixel pipeline of `_mask_and_encode_table_image`: rotate the table
    * crop, and for each absorbed image block — crop it from the page, rotate
    * it, record token → JPEG data-URI, rotate its table-relative box, fill
    * the box with the 8-point average color. Tokens come from the same
    * deterministic generator the span pipeline uses (seeded by
    * (docId, tableIdx) — the reference's `random.choices` replaced for
    * reproducibility, FIXTURES.md).
    */
  def maskAndEncodeTableImage(
      pageImage: ImageDecode.Decoded,
      tableBBox: (Double, Double, Double, Double), // normalized 0–1
      tableAngle: Int,
      imageBBoxes: Seq[(Double, Double, Double, Double)], // normalized 0–1
      tableImage: ImageDecode.Decoded,
      docId: String,
      tableIdx: Int): MaskedTable = {
    val (width, height) = (pageImage.width, pageImage.height)
    val absX1T = (tableBBox._1 * width).toInt
    val absY1T = (tableBBox._2 * height).toInt
    val originalSize = (tableImage.width, tableImage.height)
    var masked = ImageDecode.rotateByAngle(tableImage, tableAngle)
    val gen = new TableImageTokens.Gen(docId, tableIdx)
    val tokenMap = Vector.newBuilder[(String, String)]

    imageBBoxes.foreach { case (ix1, iy1, ix2, iy2) =>
      val absIx1 = ix1 * width; val absIy1 = iy1 * height
      val absIx2 = ix2 * width; val absIy2 = iy2 * height
      val relX1 = math.max(0.0, absIx1 - absX1T).toInt
      val relY1 = math.max(0.0, absIy1 - absY1T).toInt
      val relX2 = math.min(originalSize._1.toDouble, absIx2 - absX1T).toInt
      val relY2 = math.min(originalSize._2.toDouble, absIy2 - absY1T).toInt
      if (relX2 > relX1 && relY2 > relY1) {
        val cropImage = ImageDecode.crop(pageImage, absIx1.toInt, absIy1.toInt, absIx2.toInt, absIy2.toInt)
        if (cropImage.width >= 1 && cropImage.height >= 1) {
          val tokenText = s"[${gen.next()}]"
          val rotatedCrop = ImageDecode.rotateByAngle(cropImage, tableAngle)
          tokenMap += tokenText -> jpegDataUri(rotatedCrop)
          val maskBox = rotateBoxInImage((relX1, relY1, relX2, relY2), originalSize, tableAngle)
          val avg = ImageDecode.averageColor(masked, maskBox)
          // PIL's draw.rectangle includes the bottom/right edge pixel
          masked = ImageDecode.fillRect(masked, (maskBox._1, maskBox._2, maskBox._3 + 1, maskBox._4 + 1), avg)
          // token label drawn with the built-in 5×7 bitmap font (the
          // reference's TrueType draw at `_mineru25.py:566-574`; no system
          // fonts here) — same 0.7 fill-ratio fit, centering and
          // luminance-contrast color, differentially golden-tested
          masked = GlyphFont.drawCenteredLabel(masked, tokenText, maskBox, avg)
        }
      }
    }
    MaskedTable(masked, tokenMap.result())
  }
}
