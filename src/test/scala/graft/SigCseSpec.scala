package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The 64 element_at projections over one minhash_sigs call must be
  * subexpression-eliminated in codegen — one digest pass per row, not 64.
  */
class SigCseSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("minhash_sigs is evaluated once per row under the 64-column expansion") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    import spark.implicits._
    // spark.range source: a LocalRelation would be collapsed without ever
    // entering WholeStageCodegen
    val df = spark.range(16)
      .select(col("id").as("doc_id"),
        expr("transform(sequence(0, 5), i -> concat('g', id, ' w', i))").as("grams"))
      .filter(size(col("grams")) > 0)
      .withColumn("sigs", graft.functions.ChurroFunctions
        .minhash_sigs(col("grams"), graft.ops.Queries.MinhashHashes, graft.ops.Queries.MinhashMod))
      .select(col("doc_id") +: (0 until graft.ops.Queries.MinhashHashes)
        .map(j => element_at(col("sigs"), j + 1).as(s"sig$j")): _*)
    val wsc = df.queryExecution.executedPlan.collectFirst {
      case w: WholeStageCodegenExec => w
    }.getOrElse(fail("projection not inside WholeStageCodegen"))
    val (_, source) = wsc.doCodeGen()
    val calls = "graft\\.functions\\.ExprImpl\\.minhashSigs".r.findAllIn(source.body).size
    // CSE: the call appears in ONE subexpression function, not 64 inline copies
    assert(calls <= 2, s"minhashSigs appears $calls times in generated code — CSE failed")
  }

  override def afterAll(): Unit = spark.stop()
}
