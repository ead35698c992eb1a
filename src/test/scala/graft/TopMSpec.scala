package graft

import graft.ops.TopM
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** TopM must equal the window form exactly (same rows, same ranks) while
  * never sorting a key's full candidate set in one task.
  */
class TopMSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def fixture = spark.range(10000).select(
    (col("id") % 7).cast("int").as("k"),
    ((col("id") * 2654435761L) % 97).cast("long").as("score"),
    col("id").cast("long").as("tie"))

  test("equals Window.partitionBy + row_number (asc and desc, with ties)") {
    val df = fixture
    val m = 25
    def windowed(asc: Boolean) = {
      val o = if (asc) Seq(col("score").asc, col("tie").asc) else Seq(col("score").desc, col("tie").asc)
      df.withColumn("rank", row_number().over(Window.partitionBy(col("k")).orderBy(o: _*)))
        .filter(col("rank") <= m)
        .select("k", "score", "tie", "rank")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    }
    def topped(asc: Boolean) =
      TopM.topM(df, "k", Seq(("score", asc), ("tie", true)), m, "rank")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(topped(asc = true) == windowed(asc = true))
    assert(topped(asc = false) == windowed(asc = false))
  }

  test("m larger than the group returns the whole group, ranked") {
    val df = fixture.filter(col("k") === 3).limit(10)
    val got = TopM.topM(df, "k", Seq(("score", true), ("tie", true)), 1000, "rank").collect()
    assert(got.length == 10)
    assert(got.map(_.getInt(3)).sorted.toSeq == (1 to 10))
  }

  test("plan contains no WindowExec") {
    val plan = TopM.topM(fixture, "k", Seq(("score", true), ("tie", true)), 5, "r")
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("Window"))
  }
}
