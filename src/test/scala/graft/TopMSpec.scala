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

  test("null and string ordering equal the window form (nulls-first asc, UTF8 binary strings)") {
    import spark.implicits._
    // U+1F600 (4-byte UTF-8, surrogate pair 0xD83D 0xDE00) vs U+FFFD
    // (3-byte UTF-8): binary UTF-8 sorts the emoji ABOVE U+FFFD, while
    // java.lang.String.compareTo (UTF-16 units: 0xD83D < 0xFFFD) sorts it
    // BELOW — a driver-side comparator that used String.compareTo would
    // pick a different top-m than the window form on exactly this pair
    val df = Seq(
      (1, Option("😀"), 10L), (1, Option("�"), 11L),
      (1, Option("a"), 12L), (1, None, 13L), (1, None, 14L),
      (2, Option("b"), 20L), (2, None, 21L)
    ).toDF("k", "s", "tie")
    for (asc <- Seq(true, false)) {
      val o = if (asc) Seq(col("s").asc, col("tie").asc) else Seq(col("s").desc, col("tie").asc)
      val windowed = df
        .withColumn("r", row_number().over(Window.partitionBy(col("k")).orderBy(o: _*)))
        .filter(col("r") <= 2).select("k", "s", "tie", "r")
        .collect().map(r => (r.getInt(0), Option(r.getString(1)), r.getLong(2), r.getInt(3))).toSet
      val topped = TopM.topM(df, "k", Seq(("s", asc), ("tie", true)), 2, "r")
        .collect().map(r => (r.getInt(0), Option(r.getString(1)), r.getLong(2), r.getInt(3))).toSet
      assert(topped == windowed, s"asc=$asc")
    }
  }

  test("plan contains no WindowExec") {
    val plan = TopM.topM(fixture, "k", Seq(("score", true), ("tie", true)), 5, "r")
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("Window"))
  }
}
