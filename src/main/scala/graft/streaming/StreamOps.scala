package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
}
