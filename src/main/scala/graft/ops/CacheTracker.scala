package graft.ops

import org.apache.spark.sql.DataFrame

/** Registry for caches created inside query builders, released by the
  * CALLER after the terminal action.
  *
  * A query function returns a LAZY DataFrame, so it cannot unpersist its own
  * intermediates (the action hasn't run yet); instead every persist is
  * tracked here and Bench/Verify/specs call [[releaseAll]] after each
  * query. Round-2 lesson: five untracked persists accumulated across the
  * 45-query bench session and degraded unrelated queries (q_json_extract
  * 0.7s → 6.4s); OpsSpec now asserts `getPersistentRDDs.isEmpty` after
  * every catalog query.
  *
  * Scoping (round-4 hardening): the registry is THREAD-LOCAL, not
  * JVM-global. Build → action → release for one logical query happens on
  * one caller thread (Bench, Verify and the specs all work this way), so a
  * `releaseAll()` can only ever drop caches the SAME logical query
  * registered — two sessions or two concurrent queries on different
  * threads no longer unpersist each other's working set mid-flight, which
  * the round-3 global queue allowed. [[releaseAll]] also skips handles
  * whose SparkContext has already stopped (their blocks died with the
  * executor store; unpersisting them NPEs inside BlockManagerMaster) —
  * observed when a suite leaked tracked caches past its session's stop().
  */
object CacheTracker {

  private val live = new ThreadLocal[java.util.ArrayDeque[DataFrame]] {
    override def initialValue(): java.util.ArrayDeque[DataFrame] =
      new java.util.ArrayDeque[DataFrame]()
  }

  def track(df: DataFrame): DataFrame = {
    val p = df.persist()
    // idempotent per handle: re-tracking the same frame (a caller persists
    // for a count, then hands it to a builder that tracks its input) must
    // not register a second deque entry — liveCount would double-count one
    // cache and releaseAll would unpersist it twice
    val q = live.get()
    if (!q.contains(p)) q.add(p)
    p
  }

  /** Unpersist ONE tracked handle immediately (eager mid-query release —
    * iterative queries drop round r−1's caches as soon as round r is
    * materialized instead of accumulating 2×rounds handles to the end).
    * No-op if the handle was never tracked on this thread.
    */
  def release(df: DataFrame): Unit =
    if (live.get().remove(df) && !df.sparkSession.sparkContext.isStopped)
      df.unpersist(blocking = false)

  /** Number of live tracked handles on this thread (spec observability). */
  def liveCount: Int = live.get().size()

  def releaseAll(): Unit = {
    val q = live.get()
    var d = q.poll()
    while (d != null) {
      if (!d.sparkSession.sparkContext.isStopped) d.unpersist(blocking = false)
      d = q.poll()
    }
  }
}
