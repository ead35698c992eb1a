package graft

import graft.metrics.Eval
import graft.text.{Normalization, Repetition, XmlFlatten}
import org.scalatest.funsuite.AnyFunSuite

/** Literal assertions transplanted from the reference's OWN test suite —
  * the expected values below are copied verbatim from the cited pytest
  * cases (data, not code), so this suite demonstrates we match the
  * reference's results on its own test queries.
  */
class ReferenceTestsSpec extends AnyFunSuite {

  test("test_calculate_metrics_strips_output_tags_before_normalization " +
    "(/root/reference/tests/test_tooling_evaluate_page.py:94-118)") {
    val cases = Seq(
      "<output> Pred" -> "pred",
      "Pred </output>" -> "pred",
      "<output>\nPred\n</output>" -> "pred")
    cases.foreach { case (predicted, expected) =>
      val row = Eval.computeMetrics("ex", predicted, "gold", "English", "print")
      assert(row.normalized_predicted_text == expected, s"input=$predicted")
    }
  }

  test("test_extract_actual_text_from_xml_handles_plain_text_namespaces_and_parse_errors " +
    "(/root/reference/tests/test_tooling_support.py:95-120)") {
    val xmlContent =
      """
    <HistoricalDocument xmlns="urn:test">
      <Page>
        <Header>Header line</Header>
        <Body>Body line</Body>
        <Footer>Footer line</Footer>
        <Description>Ignore me</Description>
      </Page>
    </HistoricalDocument>
    """
    assert(XmlFlatten.extractActualTextFromXml("plain text") == "plain text")
    assert(XmlFlatten.extractActualTextFromXml(xmlContent) ==
      "Header line\nBody line\nFooter line")
    assert(XmlFlatten.extractActualTextFromXml("<HistoricalDocument>") == "")
  }

  test("test_normalize_text_for_evaluation_handles_markdown_linebreaks_and_substitutions " +
    "(/root/reference/tests/test_tooling_support.py:124-129)") {
    val text = "A~word\n![img](x)\n[figure 3]\nfoo-\nbar – baz ſ \uEADA"
    assert(Normalization.normalizeTextForEvaluation(text) == "aword foobar - baz s st")
  }

  test("test_normalize_text_for_evaluation_converts_markdown_with_embedded_html_to_plain_text " +
    "(/root/reference/tests/test_tooling_support.py:133-142)") {
    val text = "# Heading\n\n" +
      "<table><tr><td>Year</td><td>Value</td></tr><tr><td>1900</td><td>42</td></tr></table>\n\n" +
      "- Bullet item"
    assert(Normalization.normalizeTextForEvaluation(text) ==
      "heading year | value 1900 | 42 bullet item")
  }

  test("both-empty NLS is 1.0 (/root/reference/tests/test_tooling_evaluate_page.py:~85-91)") {
    val row = Eval.computeMetrics("ex", "", "", "English", "print")
    assert(row.nls == 1.0)
    assert(row.is_empty == 1.0)
  }

  test("repetition suffix discrimination (test_has_long_repetition_distinguishes_repeated_suffixes)") {
    assert(Repetition.hasLongRepetition("abcabcabc"))
    assert(!Repetition.hasLongRepetition("abcdef"))
  }
}
