package graft.metrics

import scala.collection.mutable

/** Sentence BLEU with the exact semantics of the reference's metric stack:
  * `/root/reference/tooling/evaluation/evaluate_page.py:108-118` calls HF
  * `evaluate.load("bleu")`, which is the standard NMT `compute_bleu`
  * (modified n-gram precision up to order 4, geometric mean, brevity
  * penalty, smooth=False) over mteval-v13a-tokenized text (sacrebleu
  * `Tokenizer13a` — both are public reference implementations). Single
  * prediction, single reference — the per-page evaluation shape.
  *
  * Differentially tested against an independent pure-Python implementation
  * (tools/gen_eval_fixture.py) in BleuSpec.
  */
object Bleu {

  val MaxOrder = 4

  // TokenizerRegexp (sacrebleu): punctuation splits, digit-aware . , and -
  private val RePunct = "([\\{-\\~\\[-\\` -\\&\\(-\\+\\:-\\@/])".r
  private val ReDotCommaAfter = "([^0-9])([\\.,])".r
  private val ReDotCommaBefore = "([\\.,])([^0-9])".r
  private val ReDigitDash = "([0-9])(-)".r

  /** mteval-v13a tokenization: language-independent normalization then the
    * common punctuation post-tokenizer, split on whitespace.
    */
  def tokenize13a(line0: String): Array[String] = {
    var line = line0
      .replace("<skipped>", "")
      .replace("-\n", "")
      .replace("\n", " ")
    if (line.contains("&")) {
      line = line
        .replace("&quot;", "\"")
        .replace("&amp;", "&")
        .replace("&lt;", "<")
        .replace("&gt;", ">")
    }
    line = " " + line + " "
    line = RePunct.replaceAllIn(line, " $1 ")
    line = ReDotCommaAfter.replaceAllIn(line, "$1 $2 ")
    line = ReDotCommaBefore.replaceAllIn(line, " $1 $2")
    line = ReDigitDash.replaceAllIn(line, "$1 - ")
    val t = line.trim
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }

  private def ngramCounts(tokens: Array[String], maxOrder: Int): mutable.Map[Seq[String], Int] = {
    val counts = mutable.Map.empty[Seq[String], Int]
    var order = 1
    while (order <= maxOrder) {
      var i = 0
      while (i + order <= tokens.length) {
        val ng = tokens.slice(i, i + order).toSeq
        counts.update(ng, counts.getOrElse(ng, 0) + 1)
        i += 1
      }
      order += 1
    }
    counts
  }

  /** BLEU of one (prediction, reference) pair over pre-normalized text. */
  def bleu(prediction: String, reference: String, maxOrder: Int = MaxOrder): Double = {
    val t = tokenize13a(prediction)
    val r = tokenize13a(reference)
    if (t.isEmpty || r.isEmpty) return 0.0 // ratio guards (div-by-zero in the original)

    val matchesByOrder = new Array[Long](maxOrder)
    val possibleByOrder = new Array[Long](maxOrder)
    val refCounts = ngramCounts(r, maxOrder)
    val tCounts = ngramCounts(t, maxOrder)
    tCounts.foreach { case (ng, c) =>
      val overlap = math.min(c, refCounts.getOrElse(ng, 0))
      if (overlap > 0) matchesByOrder(ng.length - 1) += overlap
    }
    var order = 1
    while (order <= maxOrder) {
      val possible = t.length - order + 1
      if (possible > 0) possibleByOrder(order - 1) += possible
      order += 1
    }
    val precisions = (0 until maxOrder).map { i =>
      if (possibleByOrder(i) > 0) matchesByOrder(i).toDouble / possibleByOrder(i) else 0.0
    }
    val geoMean =
      if (precisions.min > 0)
        math.exp(precisions.map(p => math.log(p) * (1.0 / maxOrder)).sum)
      else 0.0
    val ratio = t.length.toDouble / r.length
    val bp = if (ratio > 1.0) 1.0 else math.exp(1.0 - 1.0 / ratio)
    geoMean * bp
  }
}
