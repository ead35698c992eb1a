package graft

import graft.metrics.{Bleu, Eval}
import org.scalatest.funsuite.AnyFunSuite

/** Differential goldens for BLEU: expected values computed by the
  * independent pure-Python implementation in tools/gen_eval_fixture.py
  * (mteval-13a tokenization + NMT compute_bleu, the semantics of HF
  * evaluate's "bleu" loaded by the reference at
  * /root/reference/tooling/evaluation/evaluate_page.py:60,108-118).
  */
class BleuSpec extends AnyFunSuite {

  test("13a tokenization: punctuation, digit-aware dot/comma/dash, entities") {
    assert(Bleu.tokenize13a("a quick, fox 12-34 &amp; 1.5 end.").toSeq ===
      Seq("a", "quick", ",", "fox", "12", "-", "34", "&", "1.5", "end", "."))
    assert(Bleu.tokenize13a("hy-\nphen\nnewline").toSeq === Seq("hyphen", "newline"))
    assert(Bleu.tokenize13a("").isEmpty)
  }

  test("bleu matches the independent Python implementation bit-for-bit") {
    assert(Bleu.bleu("the cat sat on the mat", "the cat sat on the mat") === 1.0)
    assert(Bleu.bleu("the cat sat on mat", "the cat sat on the mat") === 0.5789300674674098)
    assert(Bleu.bleu("a quick brown fox jumps, over 12-34 lazy dogs.",
      "the quick brown fox jumped over 12-34 lazy dogs.") === 0.5783569866465142)
    // shorter than the max n-gram order -> zero precision -> 0 (smooth=False)
    assert(Bleu.bleu("one two", "one two three four five six") === 0.0)
    assert(Bleu.bleu("x", "y") === 0.0)
  }

  test("metric gating: empty prediction means bleu 0, is_empty 1 (evaluate_page.py:108)") {
    val r = Eval.computeMetrics("e1", "", "<output>\ngold text here\n</output>", "en", "print")
    assert(r.is_empty === 1.0 && r.bleu === 0.0)
    val ok = Eval.computeMetrics("e2", "the gold text is here",
      "<output>\nthe gold text is here\n</output>", "en", "print")
    assert(ok.is_empty === 0.0 && ok.bleu === 1.0 && ok.nls === 1.0)
    // fewer tokens than the max n-gram order: bleu 0 even on exact match
    val short = Eval.computeMetrics("e3", "gold text here",
      "<output>\ngold text here\n</output>", "en", "print")
    assert(short.bleu === 0.0 && short.nls === 1.0)
  }
}
