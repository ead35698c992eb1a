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
  */
object CacheTracker {

  private val live = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  def track(df: DataFrame): DataFrame = {
    val p = df.persist()
    live.add(p)
    p
  }

  def releaseAll(): Unit = {
    var d = live.poll()
    while (d != null) { d.unpersist(blocking = false); d = live.poll() }
  }
}
