package graft.metrics

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Per-run progress surface — the Spark-native analogue of the reference's
  * tqdm heartbeat thread (`/root/reference/tooling/benchmarking/
  * benchmark.py:454-475`, 1 s postfix refresh): executors bump shared
  * accumulators as documents/spans complete; a driver-side daemon thread
  * appends one JSON line per tick to `<out>/progress.jsonl`, readable
  * mid-run by any consumer (`tail -f`). Cluster metrics (completed stages /
  * tasks) come from a SparkListener, so the surface also moves during
  * shuffle/write phases that don't touch the row counters.
  */
final class Heartbeat(spark: SparkSession, outDir: String, intervalMs: Long = 1000L) {

  val docsDone: LongAccumulator = spark.sparkContext.longAccumulator("graft.docs_done")
  val spansDone: LongAccumulator = spark.sparkContext.longAccumulator("graft.spans_done")
  val groupsDone: LongAccumulator = spark.sparkContext.longAccumulator("graft.groups_done")

  @volatile private var stages = 0L
  @volatile private var tasks = 0L
  private val listener = new SparkListener {
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = stages += 1
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = tasks += 1
  }

  private val path = Paths.get(s"$outDir/progress.jsonl")
  private val t0 = System.nanoTime()
  @volatile private var running = false

  private def tick(): Unit = {
    val line = s"""{"elapsed_sec":${(System.nanoTime() - t0) / 1e9},""" +
      s""""docs":${docsDone.value},"spans":${spansDone.value},""" +
      s""""groups":${groupsDone.value},"stages":$stages,"tasks":$tasks}""" + "\n"
    Files.write(path, line.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  private val thread = new Thread(() => {
    var interrupted = false
    while (running && !interrupted) {
      try tick() catch { case _: Throwable => () }
      try Thread.sleep(intervalMs) catch { case _: InterruptedException => interrupted = true }
    }
  }, "graft-heartbeat")
  thread.setDaemon(true)

  def start(): Heartbeat = {
    Files.createDirectories(Paths.get(outDir))
    spark.sparkContext.addSparkListener(listener)
    running = true
    thread.start()
    this
  }

  /** Stop the ticker and write one final line with the closing totals. */
  def stop(): Unit = {
    running = false
    thread.interrupt()
    spark.sparkContext.removeSparkListener(listener)
    // stop() runs in callers' finally blocks: an IO failure writing the
    // closing line (out dir removed mid-run) must not REPLACE the real
    // exception that unwound the job
    try tick()
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[heartbeat] closing tick failed: ${e.getMessage}")
    }
  }
}
