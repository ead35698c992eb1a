package graft

import graft.pipeline.{DocsGen, Extract}
import graft.plans.{ExtractSpans, ExtractSpansExec}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The custom Catalyst integration path: ExtractSpansPlan → ExtractStrategy
  * → ExtractSpansExec must produce byte-identical results to the typed
  * Dataset path, plan as a single narrow custom node (zero exchanges), and
  * survive further relational composition on top.
  */
class PlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def flat(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), explode(col("spans")).as("s"))
      .select(col("doc_id"), col("s.order"), col("s.kind"), col("s.media_ref"), col("s.text"))
      .orderBy("doc_id", "order").collect().toSeq

  test("native exec is byte-identical to the typed Dataset path") {
    val docs = DocsGen.docs(spark, 300, seed = 42L, skewEvery = 100)
    val typed = Extract.run(docs).toDF()
    val native = ExtractSpans.run(docs.toDF())
    assert(flat(native) == flat(typed))
  }

  test("plan shape: one custom exec node, zero exchanges") {
    val docs = DocsGen.docs(spark, 50, seed = 1L).toDF()
    val native = ExtractSpans.run(docs)
    val plan = native.queryExecution.executedPlan
    assert(plan.collect { case e: ExtractSpansExec => e }.nonEmpty, plan.toString)
    assert(!plan.toString.contains("Exchange"), "extraction must stay narrow")
  }

  test("composes under Catalyst: filter/agg on top of the custom node") {
    val docs = DocsGen.docs(spark, 100, seed = 7L).toDF()
    val out = ExtractSpans.run(docs)
      .select(col("doc_id"), size(col("spans")).as("n"))
      .filter(col("n") > 0)
      .agg(count(lit(1)), sum(col("n")))
      .collect()(0)
    assert(out.getLong(0) == 100)
    assert(out.getLong(1) > 0)
  }

  test("round-trips through parquet input (the production read path)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_plan").toString
    DocsGen.docs(spark, 120, seed = 3L).write.mode("overwrite").parquet(dir)
    val fromParquet = ExtractSpans.run(spark.read.parquet(dir))
    val direct = ExtractSpans.run(DocsGen.docs(spark, 120, seed = 3L).toDF())
    assert(flat(fromParquet) == flat(direct))
  }
}
