package graft.layout

import java.util.regex.Pattern
import graft.text.PyStr

/** Extraction pipeline configuration.
  *
  * Mirrors `MinerU25PipelineHelper`'s flags
  * (`/root/reference/src/churro_ocr/providers/_mineru25.py:936-951`).
  */
final case class ExtractConfig(
    simplePostProcess: Boolean = false,
    handleEquationBlock: Boolean = true,
    abandonList: Boolean = false,
    abandonParatext: Boolean = false,
    imageAnalysis: Boolean = true,
    enableTableFormulaEqWrap: Boolean = false,
    notExtract: Set[String] = Set.empty)

object ExtractConfig {
  val Default: ExtractConfig = ExtractConfig()
}

/** Block postprocessing and reading-order rendering.
  *
  * Ports `prepare_for_extract`'s deterministic joins/filters
  * (`_mineru25.py:1045-1108`), `post_process` (`:1110-1154`) and `json2md`
  * (`:916-933`). The image masking/re-encode step is inherently pixel-bound;
  * its data-plane effect — absorbed images disappear as standalone blocks and
  * reappear as `<img src=…>` substitutions inside the table HTML — is
  * reproduced with media refs instead of JPEG data URIs (multimodal decode is
  * stubbed; the schema/ordering plumbing is real).
  */
object Render {

  private val cjkRe = Pattern.compile("[一-鿿㐀-䶿]")

  private val eqTagSplitRe = Pattern.compile("(?s)(<eq>.*?</eq>)")
  private val inlineMathRe = Pattern.compile("(?s)\\\\\\((.+?)\\\\\\)")
  private val blockMathRe = Pattern.compile("(?s)\\\\\\[(.+?)\\\\\\]")

  /** `_replace_table_formula_delimiters` (`_mineru25.py:454-476`). */
  def replaceTableFormulaDelimiters(content: String, enabled: Boolean): String = {
    if (!enabled || content == null || content.isEmpty) return content
    def wrap(pattern: Pattern, text: String): String = {
      val m = pattern.matcher(text)
      val sb = new java.lang.StringBuilder
      var last = 0
      while (m.find()) {
        sb.append(text, last, m.start())
        sb.append("<eq>").append(PyStr.strip(m.group(1))).append("</eq>")
        last = m.end()
      }
      sb.append(text, last, text.length)
      sb.toString
    }
    // Split on existing <eq> spans (kept), wrap math only outside them.
    val m = eqTagSplitRe.matcher(content)
    val parts = Vector.newBuilder[String]
    var last = 0
    while (m.find()) {
      parts += content.substring(last, m.start())
      parts += m.group(1)
      last = m.end()
    }
    parts += content.substring(last)
    parts.result().map { part =>
      if (part.isEmpty || eqTagSplitRe.matcher(part).matches()) part
      else wrap(blockMathRe, wrap(inlineMathRe, part))
    }.mkString("")
  }

  /** The deterministic half of `prepare_for_extract` (`_mineru25.py:1045-1108`):
    * drop captions covered by image containers, absorb images into covering
    * tables (building the token → media-ref map), and null the content of
    * block kinds the extract step would never transcribe.
    */
  def prepareBlocks(docId: String, blocks0: Vector[Block], cfg: ExtractConfig): Vector[Block] = {
    // caption-in-container anti-join
    val internalCaptions = SpatialJoins.findCoveredBlockIndices(
      blocks0,
      candidateTypes = Set("image_caption"),
      containerTypes = Blocks.ImageCaptionContainerTypes)
    val blocks1 =
      if (internalCaptions.isEmpty) blocks0
      else blocks0.indices.filterNot(internalCaptions.contains).map(blocks0(_)).toVector

    var skipTypes: Set[String] = Set("list", "equation_block", "image_block")
    if (!cfg.imageAnalysis) skipTypes = skipTypes ++ Blocks.ImageAnalysisTypes
    skipTypes = skipTypes ++ cfg.notExtract

    val tableIndices = blocks1.indices
      .filter(i => blocks1(i).kind == "table" && !skipTypes.contains("table")).toVector
    val tableToImages = SpatialJoins.buildTableImageMap(blocks1, tableIndices0 = Some(tableIndices))
    val absorbed: Set[Int] = tableToImages.values.flatten.toSet

    blocks1.indices.map { i =>
      var b = blocks1(i)
      if (absorbed.contains(i)) b = b.copy(absorbedByTable = true, content = None)
      else if (b.content.isDefined && skipTypes.contains(b.kind)) b = b.copy(content = None)
      if (b.kind == "table") {
        val imgs = tableToImages.getOrElse(i, Vector.empty)
        if (imgs.nonEmpty) {
          val gen = new TableImageTokens.Gen(docId, i)
          val tokenMap = imgs.map { imgIdx =>
            val token = "[" + gen.next() + "]"
            val ref = blocks1(imgIdx).mediaRef
            token -> (if (ref.nonEmpty) ref else s"media://$docId/$imgIdx")
          }
          b = b.copy(tokenMap = tokenMap)
        }
      }
      b
    }.toVector
  }

  /** `post_process` (`_mineru25.py:1110-1154`). */
  def postProcess(blocks0: Vector[Block], cfg: ExtractConfig): Vector[Block] = {
    val fixed = blocks0.map { block =>
      val orig = block.content.orNull
      val content = if (orig == null) "" else PyStr.strip(orig)
      if (content.isEmpty) {
        if (block.content.isEmpty) block else block.copy(content = None)
      } else block.kind match {
        case "table" =>
          var tableHtml = Otsl.toHtml(content)
          if (block.tokenMap.nonEmpty)
            tableHtml = TableImageTokens.replaceTokens(tableHtml, block.tokenMap)
          tableHtml = replaceTableFormulaDelimiters(tableHtml, cfg.enableTableFormulaEqWrap)
          block.copy(content = Some(tableHtml))
        case "equation" =>
          block.copy(content = Some(Equations.wrapEquation(Equations.fixEquationDelimiters(content))))
        case "text" =>
          // all three fixes require a backslash — one scan gates them
          if (content.indexOf('\\') < 0) {
            if (content eq orig) block else block.copy(content = Some(content))
          } else {
            var f = Equations.convertDisplayToInline(content)
            f = Equations.fixMacroSpacingInMarkdown(f)
            f = Equations.moveUnderscoresOutside(f)
            if (f eq orig) block else block.copy(content = Some(f))
          }
        case _ =>
          if (content eq orig) block else block.copy(content = Some(content))
      }
    }

    val processed =
      if (!cfg.simplePostProcess && cfg.handleEquationBlock) Equations.handleEquationBlocks(fixed)
      else fixed

    processed.filter { block =>
      block.kind != "equation_block" &&
        !(block.kind == "image" && block.absorbedByTable) &&
        !(cfg.abandonList && block.kind == "list") &&
        !(cfg.abandonParatext && Blocks.ParatextTypes.contains(block.kind))
    }.map(b =>
      if (b.tokenMap.nonEmpty || b.absorbedByTable)
        b.copy(tokenMap = Vector.empty, absorbedByTable = false)
      else b)
  }

  /** `json2md` (`_mineru25.py:916-933`) — reading-order fold with CJK-aware
    * `merge_prev` continuation — emitting ordered output spans instead of one
    * concatenated markdown string. Each surviving block is one span; a
    * `merge_prev` text block merges into the most recent *text* span (no
    * separator before CJK, single space otherwise).
    */
  def emitSpans(blocks: Vector[Block]): Vector[(String, String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    var lastTextIdx = -1
    blocks.foreach { block =>
      block.content match {
        case Some(content) if content.nonEmpty =>
          if (block.mergePrev && lastTextIdx >= 0) {
            val (k, t, m) = out(lastTextIdx)
            val sep = if (cjkRe.matcher(content).find()) "" else " "
            out(lastTextIdx) = (k, t + sep + content, m)
          } else {
            out += ((block.kind, content, block.mediaRef))
            if (block.kind == "text") lastTextIdx = out.length - 1
          }
        case _ =>
      }
    }
    out.toVector
  }

  /** `json2md`'s exact string form, for parity tests and the markdown sink. */
  def renderMarkdown(blocks: Vector[Block]): String =
    PyStr.strip(emitSpans(blocks).map(_._2).mkString("\n\n"))
}
