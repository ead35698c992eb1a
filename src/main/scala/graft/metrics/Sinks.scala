package graft.metrics

import org.apache.spark.sql.Dataset
import java.nio.file.{Files, Paths}

/** Benchmark-output sinks mirroring the reference's
  * `outputs.json` / `all_metrics.json` writers
  * (`/root/reference/tooling/evaluation/metrics.py:112-148`):
  * per-example rows as a JSON array (non-ASCII preserved), plus a nested
  * aggregate document with language / type / language×type groupings and
  * ×100 one-decimal rounding.
  */
object Sinks {

  private def jstr(s: String): String = {
    val sb = new java.lang.StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c) // ensure_ascii=False parity: keep non-ASCII raw
    }
    sb.append("\"").toString
  }

  /** `round_metric` (`metrics.py:37-39`): one decimal, via the same
    * format-then-parse the reference uses.
    */
  def roundMetric(v: Double): Double = f"$v%.1f".toDouble

  /** Write per-example rows as `outputs.json`. */
  def writeOutputs(results: Dataset[EvalRow], outDir: String): Unit = {
    Files.createDirectories(Paths.get(outDir))
    val rows = results.collect().sortBy(_.example_id).map { r =>
      s"""  {"example_id": ${jstr(r.example_id)}, "main_language": ${jstr(r.main_language)}, """ +
        s""""document_type": ${jstr(r.document_type)}, "normalized_levenshtein_similarity": ${r.nls}, """ +
        s""""bleu": ${r.bleu}, "repetition": ${r.repetition}, "is_empty": ${r.is_empty}, """ +
        s""""normalized_predicted_text": ${jstr(r.normalized_predicted_text)}, """ +
        s""""normalized_gold_text": ${jstr(r.normalized_gold_text)}}"""
    }
    Files.writeString(Paths.get(s"$outDir/outputs.json"),
      rows.mkString("[\n", ",\n", "\n]"))
  }

  /** Scale path for `outputs.json`: a distributed JSON write — one file per
    * partition, no driver materialization (the collect-based
    * [[writeOutputs]] is reference-parity for goldens; at 10^12 docs it
    * would OOM the driver). Rows carry example_id so a consumer can
    * re-order; within-file order follows the sort.
    */
  def writeOutputsDistributed(results: Dataset[EvalRow], outDir: String): Unit =
    results.sortWithinPartitions("example_id")
      .write.mode("overwrite").json(s"$outDir/outputs_json")

  /** Scale path for `all_metrics.json`: the grouped aggregate (a few dozen
    * rows) written distributed — the only driver-side data is the plan.
    */
  def writeAllMetricsDistributed(results: Dataset[EvalRow], outDir: String): Unit =
    Eval.groupedMetrics(results)
      .write.mode("overwrite").json(s"$outDir/all_metrics_json")

  /** PNG page sink (`cli.py:243-250`: `page_%04d.png` per detected page,
    * path echoed) — distributed: each partition encodes and writes its own
    * pages; returns nothing driver-side (list the dir to enumerate).
    */
  def writePngPages(pages: Dataset[(Int, graft.media.ImageDecode.Decoded)], outDir: String): Unit = {
    pages.foreachPartition { it: Iterator[(Int, graft.media.ImageDecode.Decoded)] =>
      // dir creation must happen executor-side (a driver-side mkdir only
      // exists on the driver's filesystem); outDir must be shared storage
      Files.createDirectories(Paths.get(outDir))
      it.foreach { case (pageIndex, d) =>
        val bytes = graft.media.ImageDecode.encodePng(d)
        Files.write(Paths.get(f"$outDir/page_$pageIndex%04d.png"), bytes)
      }
    }
  }

  /** Write the nested aggregate document as `all_metrics.json`
    * (language / type / language_and_type / aggregate sections, percentages
    * rounded to one decimal like `to_rounded_percentage`).
    */
  def writeAllMetrics(results: Dataset[EvalRow], outDir: String, elapsedSec: Double): Unit = {
    Files.createDirectories(Paths.get(outDir))
    val rows = results.collect()
    def avg(sel: EvalRow => Double, f: EvalRow => Boolean): Double = {
      val xs = rows.filter(f)
      if (xs.isEmpty) 0.0 else roundMetric(100.0 * xs.map(sel).sum / xs.length)
    }
    def section(groups: Seq[String], f: String => EvalRow => Boolean): String =
      groups.sorted.map(g =>
        s"    ${jstr(g)}: ${avg(_.nls, f(g))}").mkString("{\n", ",\n", "\n  }")

    val langs = rows.map(_.main_language).distinct.toSeq
    val types = rows.map(_.document_type).distinct.toSeq
    val langTypes = rows.map(r => s"${r.main_language}_${r.document_type}").distinct.toSeq

    val json =
      s"""{
         |  "main_language_metrics": ${section(langs, g => r => r.main_language == g)},
         |  "type_metrics": ${section(types, g => r => r.document_type == g)},
         |  "aggregate_metrics": {
         |    "normalized_levenshtein_similarity": ${avg(_.nls, _ => true)},
         |    "bleu": ${avg(_.bleu, _ => true)},
         |    "repetition": ${avg(_.repetition, _ => true)},
         |    "is_empty": ${avg(_.is_empty, _ => true)},
         |    "elapsed_time (s)": ${roundMetric(elapsedSec)}
         |  },
         |  "main_language_and_type_metrics": ${section(langTypes,
              g => r => s"${r.main_language}_${r.document_type}" == g)}
         |}""".stripMargin
    Files.writeString(Paths.get(s"$outDir/all_metrics.json"), json)
  }
}
