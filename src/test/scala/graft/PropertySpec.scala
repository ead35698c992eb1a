package graft

import graft.layout.BBoxOps
import graft.text._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the normalizer/geometry core (SURVEY.md §5):
  * idempotence, whitespace-collapse invariants, clamp round-trips.
  * (scalatestplus isn't in the offline cache, so sampling is driven
  * manually from a fixed ScalaCheck seed — fully deterministic.)
  */
class PropertySpec extends AnyFunSuite {

  private def forAll[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    var misses = 0
    while (i < n && misses < 1000) {
      g.apply(Gen.Parameters.default, seed) match {
        case Some(a) => f(a); i += 1
        case None => misses += 1
      }
      seed = seed.next
    }
    assert(i > 0, "generator produced no samples")
  }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))

  private def forAll[A, B, C, D](ga: Gen[A], gb: Gen[B], gc: Gen[C], gd: Gen[D])(f: (A, B, C, D) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc, gd))(t => f(t._1, t._2, t._3, t._4))

  private val textGen: Gen[String] = Gen.frequency(
    6 -> Gen.asciiPrintableStr,
    2 -> Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '\n', '\t', '-', '*', '#', '|', '<', '>', 'ſ', '’', '¬', '世', '界'))).map(_.mkString),
    1 -> Gen.const(""),
    1 -> Gen.oneOf("<output>x</output>", "a **b** `c`", "Teſt-\n ing", "<td>a</td><td>b</td>")
  )

  test("normalize_text_for_evaluation is idempotent on marker-free results") {
    // the reference itself is not idempotent when NFKC re-introduces a
    // markdown marker (e.g. U+FE65 ﹥ → '>') — restrict to marker-free
    // normalized outputs, where a second application must be a no-op
    val markers = "<>#*_`~|[]()!-\\"
    forAll(textGen) { s =>
      val once = Normalization.normalizeTextForEvaluation(s)
      if (!once.exists(markers.contains(_)))
        assert(Normalization.normalizeTextForEvaluation(once) == once)
    }
  }

  test("normalized text has collapsed whitespace and no surrounding space") {
    forAll(textGen) { s =>
      val n = Normalization.normalizeTextForEvaluation(s)
      assert(!n.contains("  ") && !n.contains("\n") && !n.contains("\t"))
      assert(n == n.trim)
      assert(n == PyStr.lower(n)) // lowercase invariant
    }
  }

  test("strip/lstrip/rstrip compose like Python") {
    forAll(textGen) { s =>
      assert(PyStr.strip(s) == PyStr.lstrip(PyStr.rstrip(s)))
      assert(PyStr.strip(PyStr.strip(s)) == PyStr.strip(s))
    }
  }

  test("bbox convert: valid boxes land in [0,1] with positive area; invalid rejected") {
    forAll(Gen.choose(-100, 1100), Gen.choose(-100, 1100),
           Gen.choose(-100, 1100), Gen.choose(-100, 1100)) { (a, b, c, d) =>
      BBoxOps.convert(a, b, c, d) match {
        case Some(bb) =>
          assert(bb.forall(v => v >= 0.0 && v <= 1.0))
          assert(bb(0) < bb(2) && bb(1) < bb(3))
          assert(BBoxOps.area(bb) > 0.0)
        case None =>
          val inRange = Seq(a, b, c, d).forall(v => v >= 0 && v <= 1000)
          assert(!inRange || a == c || b == d ||
            math.min(a, c) == math.max(a, c) || math.min(b, d) == math.max(b, d))
      }
    }
  }

  test("cover ratio is within [0,1] and exact for containment") {
    forAll(Gen.choose(0.0, 0.4), Gen.choose(0.0, 0.4),
           Gen.choose(0.5, 1.0), Gen.choose(0.5, 1.0)) { (x1, y1, x2, y2) =>
      val inner = Array(x1 + 0.05, y1 + 0.05, x2 - 0.05, y2 - 0.05)
      val outer = Array(x1, y1, x2, y2)
      if (BBoxOps.area(inner) > 0) {
        assert(math.abs(BBoxOps.coverRatio(inner, outer) - 1.0) < 1e-9)
        val r = BBoxOps.coverRatio(outer, inner)
        assert(r >= 0.0 && r <= 1.0 + 1e-9)
      }
    }
  }

  test("levenshtein metric properties") {
    forAll(Gen.asciiPrintableStr, Gen.asciiPrintableStr) { (a, b) =>
      val d = Levenshtein.distance(a, b)
      assert(d == Levenshtein.distance(b, a)) // symmetry
      assert(d >= math.abs(a.length - b.length))
      assert(d <= math.max(a.length, b.length))
      if (a == b) assert(d == 0)
    }
  }

  test("constructed periodic tails are detected") {
    forAll(Gen.alphaStr.suchThat(s => s.length >= 2 && s.length <= 8),
           Gen.choose(3, 10)) { (unit, reps) =>
      val tail = unit * reps
      // a pure periodic string (tail = 100% of it) must be flagged
      assert(Repetition.hasLongRepetition(tail))
    }
  }

  test("levenshtein with affix trimming equals the textbook DP on random pairs") {
    def naive(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val g = Gen.listOf(Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString)
    forAll(g, g) { (a, b) =>
      assert(graft.text.Levenshtein.distance(a, b) == naive(a, b), s"a=$a b=$b")
    }
    // shared affixes (the optimized path) on structured pairs
    forAll(Gen.zip(g, g, g)) { case (pre, mid, suf) =>
      val a = pre + mid + suf
      val b = pre + mid.reverse + suf
      assert(graft.text.Levenshtein.distance(a, b) == naive(a, b))
    }
  }

  test("merge_prev fold: CJK gets no separator, Latin gets one space") {
    import graft.layout.{Block, Render}
    forAll(Gen.alphaStr.suchThat(_.nonEmpty), Gen.oneOf("世界", "appendix", "界x")) { (base, cont) =>
      val blocks = Vector(
        Block("text", Array(0.0, 0.0, 1.0, 0.1), content = Some(base)),
        Block("text", Array(0.0, 0.1, 1.0, 0.2), content = Some(cont), mergePrev = true))
      val out = Render.renderMarkdown(blocks)
      val hasCjk = cont.exists(c => c >= '一' && c <= '鿿')
      if (hasCjk) assert(out == base + cont)
      else assert(out == base + " " + cont)
    }
  }
}
