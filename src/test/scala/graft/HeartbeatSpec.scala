package graft

import graft.jobs.ExtractJob
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** The per-run progress surface (reference tqdm heartbeat analogue,
  * benchmark.py:454-475): progress.jsonl is written during the run, counters
  * are monotone, and the closing line carries the exact final totals.
  */
class HeartbeatSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("progress.jsonl: monotone counters, exact closing totals, mid-run stage activity") {
    val out = Files.createTempDirectory("graft_hb").toString
    ExtractJob.run(spark, ExtractJob.Args(nDocs = 300, buckets = 4, groupSize = 2,
      out = out, clock = () => 1L))
    val lines = Files.readAllLines(Paths.get(s"$out/progress.jsonl")).asScala
    assert(lines.nonEmpty)
    def field(l: String, k: String): Long =
      s""""$k":(\\d+)""".r.findFirstMatchIn(l).get.group(1).toLong
    val docs = lines.map(field(_, "docs"))
    assert(docs.zip(docs.tail).forall { case (a, b) => a <= b }, "docs counter must be monotone")
    val last = lines.last
    // extraction runs exactly ONCE per group (lineage stats come from the
    // written parquet, not a second extraction pass)
    assert(field(last, "docs") == 300, last)
    assert(field(last, "groups") == 2, last)
    assert(field(last, "stages") > 0 && field(last, "tasks") > 0, last)
    val spans = field(last, "spans")
    val actualSpans = spark.read.parquet(s"$out/data").count()
    assert(spans == actualSpans, s"spans=$spans actual=$actualSpans")
  }
}
