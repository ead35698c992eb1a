package graft

import graft.streaming.StreamOps
import graft.streaming.StreamOps.{SessionEvent, SessionOut}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** The streaming SCALE shapes: append-mode windowed aggregation under a
  * watermark (bounded state, only finalized windows emitted) and
  * flatMapGroupsWithState gap sessionization with event-time timeout.
  */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2026-01-01 $hhmm:00")

  test("append-mode window agg emits only watermark-closed windows, drops state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val events = in.toDF().toDF("ts", "event_type", "value")
    val out = StreamOps.streamWindowAppend(events, watermark = "30 minutes")
    val q = out.writeStream.format("memory").queryName("stream_append").outputMode("append").start()
    try {
      // hour-10 events, then an hour-13 event pushes the watermark to 12:30,
      // closing hour 10 (and 11) but NOT hour 13
      in.addData((ts("10:05"), "click", 1.0), (ts("10:40"), "click", 3.0), (ts("10:20"), "view", 2.0))
      q.processAllAvailable()
      in.addData((ts("13:00"), "click", 9.0))
      q.processAllAvailable()
      in.addData((ts("13:01"), "view", 5.0)) // no watermark advance past 13
      q.processAllAvailable()
      val rows = spark.table("stream_append")
        .select(col("hour"), col("event_type"), col("n"), col("min_v"), col("max_v"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
        .sortBy(r => (r._1.getTime, r._2))
      assert(rows.toSeq == Seq(
        (ts("10:00"), "click", 2L, 1.0, 3.0),
        (ts("10:00"), "view", 1L, 2.0, 2.0)))
      // hour-13 rows are still open (not emitted) — bounded-state behavior
      assert(!rows.exists(_._1 == ts("13:00")))
    } finally q.stop()
  }

  test("streaming dedup drops the planted in-stream copies, bounded state") {
    val dir = "/root/testdata/sf0.001"
    val out = StreamOps.streamDedupQuery(spark, dir).collect()
    val events = spark.read.parquet(s"$dir/events.parquet")
    val n = events.count()
    // every 3rd event streamed in twice; dedup must return EXACTLY the table
    assert(out.length == n, s"deduped rows ${out.length} != events $n")
    assert(out.map(_.getLong(0)).distinct.length == out.length, "event_id unique")
    assert(n / 3 > 0, "fixture must actually plant duplicates")
  }

  test("streaming near-dup flags every planted teh-copy, O(1) state per bucket") {
    val dir = "/root/testdata/sf0.001"
    val dups = StreamOps.streamNearDupQuery(spark, dir).collect().map(_.getLong(0)).toSet
    val planted = spark.read.parquet(s"$dir/documents.parquet")
      .filter(org.apache.spark.sql.functions.expr("doc_id % 10 = 1"))
      .collect().map(_.getAs[Long]("doc_id") + 200000).toSet
    assert(planted.nonEmpty, "fixture must actually plant near-copies")
    // a planted near-copy is flagged when ≥1 of its 32 band buckets matches
    // its base doc — probabilistic by design (a copy whose every changed
    // "the"→"teh" gram lands in every band escapes banding, same as the
    // batch chain), so assert RECALL, not totality; exact bucket membership
    // is what the DuckDB oracle verifies hash-exactly
    val recall = (planted & dups).size.toDouble / planted.size
    assert(recall >= 0.9, s"banding recall $recall on planted near-copies")
    // base docs may also be flagged (natural collisions), but a flagged doc
    // must exist in the duplicated stream
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(dups.forall(d => ids.contains(d) || ids.contains(d - 200000)))
  }

  test("flatMapGroupsWithState sessionization: gap split + event-time timeout emission") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    val out = StreamOps.sessionize(in.toDS(), gapMs = 10 * 60 * 1000, watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("stream_sessions").outputMode("append").start()
    try {
      // user 1: two events 5 min apart (one session); user 2: one event
      in.addData(
        SessionEvent(1L, ts("10:00"), 1.0),
        SessionEvent(1L, ts("10:05"), 2.0),
        SessionEvent(2L, ts("10:02"), 7.0))
      q.processAllAvailable()
      // a much later event advances the watermark far past every timeout,
      // closing the user-1 and user-2 sessions
      in.addData(SessionEvent(3L, ts("12:00"), 0.5))
      q.processAllAvailable()
      in.addData(SessionEvent(3L, ts("14:00"), 0.25)) // closes 12:00 session too
      q.processAllAvailable()
      val rows = spark.table("stream_sessions").as[SessionOut].collect()
        .sortBy(r => (r.user_id, r.session_start.getTime))
      assert(rows.map(r => (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value)).toSeq ==
        Seq(
          (1L, ts("10:00"), ts("10:05"), 2L, 3.0),
          (2L, ts("10:02"), ts("10:02"), 1L, 7.0),
          (3L, ts("12:00"), ts("12:00"), 1L, 0.5)))
    } finally q.stop()
  }

  test("streaming extraction twin: byte-identical to the batch job, resume skips processed files") {
    import graft.pipeline.{DocsGen, Extract}
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("graft_sin").toString
    val out = java.nio.file.Files.createTempDirectory("graft_sout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sckpt").toString
    DocsGen.docs(spark, 200, seed = 42L).write.mode("overwrite").parquet(in)
    StreamOps.streamExtract(spark, in, out, ckpt)
    val streamed = spark.read.parquet(out)
      .select("doc_id", "order", "kind", "media_ref", "text")
      .orderBy("doc_id", "order").collect().toSeq
    val batch = Extract.run(DocsGen.docs(spark, 200, seed = 42L)).toDF()
      .select(col("doc_id"), explode(col("spans")).as("s"))
      .select(col("doc_id"), col("s.order"), col("s.kind"), col("s.media_ref"), col("s.text"))
      .orderBy("doc_id", "order").collect().toSeq
    assert(streamed == batch)
    // resume against the same checkpoint: already-processed files are
    // skipped, output unchanged (the streaming analogue of lineage resume)
    StreamOps.streamExtract(spark, in, out, ckpt)
    assert(spark.read.parquet(out).count() == batch.length)
  }

  test("sessionizeFn splits same-batch events farther apart than the gap") {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    // pure-function check through the batch path: two sessions in one group
    import spark.implicits._
    val events = Seq(
      SessionEvent(9L, ts("09:00"), 1.0),
      SessionEvent(9L, ts("09:04"), 1.0),
      SessionEvent(9L, ts("11:00"), 5.0))
    // batch flatMapGroupsWithState is exercised via the streaming API in the
    // test above; here assert the split logic directly on the state function
    val state = new TestState
    val out = StreamOps.sessionizeFn(10 * 60 * 1000)(9L, events.iterator, state).toSeq
    assert(out.map(o => (o.n_events, o.sum_value)) == Seq((2L, 2.0))) // first session closed by the gap
    assert(state.updated.exists(s => s.n == 1 && s.sum == 5.0)) // second session left open in state
  }

  private class TestState extends org.apache.spark.sql.streaming.GroupState[StreamOps.SessionState] {
    var updated: Option[StreamOps.SessionState] = None
    var timeoutTs: Long = -1L
    override def exists: Boolean = updated.isDefined
    override def get: StreamOps.SessionState = updated.get
    override def getOption: Option[StreamOps.SessionState] = updated
    override def update(s: StreamOps.SessionState): Unit = updated = Some(s)
    override def remove(): Unit = updated = None
    override def hasTimedOut: Boolean = false
    override def setTimeoutDuration(durationMs: Long): Unit = ()
    override def setTimeoutDuration(duration: String): Unit = ()
    override def setTimeoutTimestamp(timestampMs: Long): Unit = timeoutTs = timestampMs
    override def setTimeoutTimestamp(timestampMs: Long, additionalDuration: String): Unit = ()
    override def setTimeoutTimestamp(timestamp: java.sql.Date): Unit = ()
    override def setTimeoutTimestamp(timestamp: java.sql.Date, additionalDuration: String): Unit = ()
    override def getCurrentWatermarkMs(): Long = 0L
    override def getCurrentProcessingTimeMs(): Long = 0L
  }
}
