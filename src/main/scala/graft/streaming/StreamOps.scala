package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twin of the batch tumbling-window aggregation.
  *
  * The reference's concurrency layer is async batch, not streaming
  * (SURVEY.md §2.9); this is the streaming-ingest form the same pipeline
  * takes under `readStream → window agg → writeStream` (driven synchronously
  * here via the memory sink so the result is comparable to the batch oracle).
  */
object StreamOps {

  def streamWindow(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    // the file stream source wants a directory; glob-filter to the one table
    val events = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val agg = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("value")).as("min_v"), max(col("value")).as("max_v"))
    val queryName = "graft_stream_window"
    val q = agg.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("complete")
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(queryName)
      .select(col("window.start").as("hour"), col("event_type"), col("n"),
        col("min_v"), col("max_v"))
      .orderBy("hour", "event_type")
  }

  /** The SCALE shape of the streaming aggregation: append output mode with a
    * watermark, so state for closed windows is dropped instead of growing
    * without bound (the complete-mode memory sink above is the oracle twin,
    * not the production shape). Emits only finalized windows.
    */
  def streamWindowAppend(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("value")).as("min_v"), max(col("value")).as("max_v"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"),
        col("min_v"), col("max_v"))

  /** Driveable form of [[streamWindowAppend]] for the correctness gate: the
    * bounded events table through the SCALE shape (watermark + append mode,
    * state for closed windows dropped). Deterministic because the file
    * source reads the table in one batch, the watermark then advances to
    * max(ts) − 2h, and Spark's no-data batch emits exactly the windows with
    * `window.end <= watermark` — which is what the batch oracle selects.
    * Unclosed trailing windows are withheld by design (they'd emit on the
    * next day's data in production).
    */
  def streamWindowAppendQuery(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    val events = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      // watermarks require TIMESTAMP (the table stores NTZ; session TZ is
      // UTC so the cast is value-preserving) — cast back on output so the
      // result schema matches the batch oracle's NTZ
      .withColumn("ts", col("ts").cast("timestamp"))
    val queryName = "graft_stream_window_append"
    val q = streamWindowAppend(events).writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(queryName)
      .withColumn("hour", col("hour").cast("timestamp_ntz"))
      .orderBy("hour", "event_type")
  }

  /** Streaming exact dedup — the ingest-time shape of the dedup family
    * (`q_dedup_exact` is the batch form): duplicates planted INSIDE the
    * stream (every 3rd event arrives twice) are dropped by
    * `dropDuplicatesWithinWatermark`, the bounded-state production dedup —
    * state for an event id is held only until the watermark passes it, so
    * the store cannot grow without bound on an infinite stream (a plain
    * `dropDuplicates` would). Deterministic: the planted copies are exact
    * row copies, so whichever arrives first yields the same output row; the
    * batch oracle is simply the original events table.
    */
  def streamDedupQuery(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    val events = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .withColumn("ts", col("ts").cast("timestamp"))
    val dupped = events
      .withColumn("copy", explode(when(col("event_id") % 3 === 0,
        array(lit(1), lit(2))).otherwise(array(lit(1)))))
      .drop("copy")
    val deduped = dupped
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    val queryName = "graft_stream_dedup"
    val q = deduped.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(queryName)
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .orderBy("event_id")
  }

  /** One closed user session: the custom-state shape the brief calls for
    * (`flatMapGroupsWithState` + event-time timeout). Gap-based
    * sessionization: events of one user belong to one session while they
    * arrive within `gapMs`; the session row is emitted when the watermark
    * passes the gap.
    */
  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionState(start: Long, end: Long, n: Long, sum: Double)
  final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
                              session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  def sessionizeFn(gapMs: Long)(
      userId: Long,
      events: Iterator[SessionEvent],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator.single(SessionOut(userId, new java.sql.Timestamp(s.start),
        new java.sql.Timestamp(s.end), s.n, s.sum))
    } else {
      val sorted = events.toSeq.sortBy(_.ts.getTime)
      var out = Vector.empty[SessionOut]
      var cur = state.getOption
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.end <= gapMs =>
            cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1, s.sum + e.value))
          case Some(s) =>
            out :+= SessionOut(userId, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.end), s.n, s.sum)
            cur = Some(SessionState(t, t, 1, e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.end + gapMs)
      }
      out.iterator
    }
  }

  /** Streaming-ingest form of the FLAGSHIP extraction: `readStream` over the
    * docs table → the same narrow per-document extraction → checkpointed
    * parquet sink. Extraction is stateless (row-local), so the streaming
    * plan needs no watermark or state store — each micro-batch is exactly
    * the batch job on its file slice, and the checkpoint gives the same
    * at-least-once-commit/no-recompute resume property the batch job's
    * lineage table provides.
    */
  def streamExtract(spark: SparkSession, inputDir: String, outDir: String,
                    checkpointDir: String): Unit = {
    import spark.implicits._
    val schema = spark.read.parquet(inputDir).schema
    val docs = spark.readStream.schema(schema).parquet(inputDir).as[graft.model.Doc]
    val extracted = graft.pipeline.Extract.run(docs)
      .select(col("doc_id"), explode(col("spans")).as("s"))
      .select(col("doc_id"), col("s.order").as("order"), col("s.kind").as("kind"),
        col("s.media_ref").as("media_ref"), col("s.text").as("text"))
    val q = extracted.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** Streaming gap sessionization over `(user_id, ts, value)` events. */
  def sessionize(events: Dataset[SessionEvent], gapMs: Long,
                 watermark: String = "1 hour"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        sessionizeFn(gapMs))
  }
}
