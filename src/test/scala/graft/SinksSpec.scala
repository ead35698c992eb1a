package graft

import graft.metrics.{Eval, EvalRow, Sinks}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Sink parity: the driver-side JSON writers (reference-shaped goldens) and
  * the distributed scale path write the same information; the distributed
  * path never materializes rows on the driver.
  */
class SinksSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def rows = {
    import spark.implicits._
    spark.createDataset(Seq(
      EvalRow("e1", "en", "print", 0.9, 0.8, 0.0, 0.0, "p1", "g1"),
      EvalRow("e2", "en", "handwriting", 0.7, 0.5, 1.0, 0.0, "p2", "g2"),
      EvalRow("e3", "de", "print", 1.0, 1.0, 0.0, 0.0, "p3", "g3"),
      EvalRow("e4", "de", "print", 0.0, 0.0, 0.0, 1.0, "", "g4")))
  }

  test("driver sinks write reference-shaped JSON incl. bleu") {
    val dir = Files.createTempDirectory("graft_sinks").toString
    Sinks.writeOutputs(rows, dir)
    Sinks.writeAllMetrics(rows, dir, elapsedSec = 1.25)
    val outputs = Files.readString(java.nio.file.Paths.get(s"$dir/outputs.json"))
    assert(outputs.contains("\"example_id\": \"e1\"") && outputs.contains("\"bleu\": 0.8"))
    val metrics = Files.readString(java.nio.file.Paths.get(s"$dir/all_metrics.json"))
    assert(metrics.contains("\"bleu\": 57.5")) // mean(0.8,0.5,1.0,0.0)*100
    assert(metrics.contains("\"elapsed_time (s)\": 1.3"))
  }

  test("PNG page sink writes page_%04d.png per page, round-trips pixel-exact") {
    import spark.implicits._
    import graft.media.ImageDecode
    val dir = Files.createTempDirectory("graft_png_sink").toString
    def pat(w: Int, h: Int, s: Int) = ImageDecode.Decoded(w, h,
      Array.tabulate(w * h * 3)(i => ((i * 7 + s * 13) % 256).toByte))
    val pages = Seq(0 -> pat(8, 6, 0), 1 -> pat(5, 5, 1), 2 -> pat(3, 9, 2))
    Sinks.writePngPages(spark.createDataset(pages), dir)
    pages.foreach { case (idx, d) =>
      val bytes = Files.readAllBytes(java.nio.file.Paths.get(f"$dir/page_$idx%04d.png"))
      val back = ImageDecode.loadImage(bytes)
      assert(back.width == d.width && back.rgb.toSeq == d.rgb.toSeq, s"page $idx")
    }
  }

  test("distributed sinks write without driver materialization and round-trip") {
    val dir = Files.createTempDirectory("graft_sinks_dist").toString
    Sinks.writeOutputsDistributed(rows, dir)
    Sinks.writeAllMetricsDistributed(rows, dir)
    val back = spark.read.json(s"$dir/outputs_json")
    assert(back.count() == 4)
    assert(back.columns.toSet.contains("bleu"))
    val agg = spark.read.json(s"$dir/all_metrics_json")
    // grouping sets: 2 langs + 2 types + 3 lang×type combos = 7 rows
    assert(agg.count() == 7)
    val groupedDirect = Eval.groupedMetrics(rows).collect().map(_.toSeq.map(String.valueOf)).toSet
    val groupedViaJson = agg
      .selectExpr("language_g", "type_g", "nls_pct", "bleu_pct", "repetition_pct", "is_empty_pct", "n")
      .collect().map(_.toSeq.map(String.valueOf)).toSet
    assert(groupedDirect == groupedViaJson)
  }
}
