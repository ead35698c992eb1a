package graft

import graft.functions.{ChurroFunctions, GraftExtensions}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Native Catalyst expression surface: Column API, SQL registration via
  * SparkSessionExtensions, codegen participation, null handling, and value
  * parity with the pure functions (which are themselves reference-golden
  * verified in ParitySpec).
  */
class FunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .withExtensions(new GraftExtensions)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("SQL surface via extensions: expressions resolve and evaluate") {
    val rows = spark.sql(
      """SELECT churro_normalize('<output>Teſt-\ning **x**</output>') AS n,
        |       churro_strip_output_tag('<output> Pred </output>') AS t,
        |       churro_xml_flatten('<HistoricalDocument><Page><Body>B</Body></Page></HistoricalDocument>') AS x,
        |       has_long_repetition('abcabcabc') AS r,
        |       nls('kitten', 'sitting') AS d,
        |       nls('', '') AS both_empty""".stripMargin).collect()(0)
    assert(rows.getString(0) == graft.text.Normalization.normalizeTextForEvaluation("<output>Teſt-\ning **x**</output>"))
    assert(rows.getString(1) == "Pred")
    assert(rows.getString(2) == "B")
    assert(rows.getBoolean(3))
    assert(math.abs(rows.getDouble(4) - (1.0 - 3.0 / 7.0)) < 1e-12)
    assert(rows.getDouble(5) == 1.0)
  }

  test("Column API over a DataFrame, inside whole-stage codegen") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // a range scan guarantees a WholeStageCodegen stage our expressions join
    val gen = spark.range(3).select(
      ChurroFunctions.churro_strip_output_tag(
        concat(lit("<output>v"), col("id"), lit("</output>"))).as("s"))
    val genPlan = gen.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    assert(genPlan.contains("*(1) Project"), s"expected codegen'd Project:\n$genPlan")
    assert(gen.collect().map(_.getString(0)).toSeq == Seq("v0", "v1", "v2"))

    val df = Seq("<output>A b</output>", "xyxyxy", null).toDF("t")
    val rows = df.select(
      ChurroFunctions.churro_strip_output_tag($"t").as("s"),
      ChurroFunctions.has_long_repetition($"t").as("r"),
      ChurroFunctions.nls($"t", $"t").as("n")).collect()
    assert(rows(0).getString(0) == "A b" && !rows(0).getBoolean(1) && rows(0).getDouble(2) == 1.0)
    assert(rows(1).getBoolean(1))
    assert(rows(2).isNullAt(0) && rows(2).isNullAt(1) && rows(2).isNullAt(2)) // null-intolerant
  }

  test("registry-based registration works on a plain session") {
    ChurroFunctions.register(spark)
    assert(spark.sql("SELECT churro_normalize('A  B')").collect()(0).getString(0) == "a b")
  }
}
