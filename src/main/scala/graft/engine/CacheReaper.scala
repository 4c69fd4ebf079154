package graft.engine

import org.apache.spark.sql.DataFrame

/**
 * Session-scoped registry of long-lived library caches (r07, ADVICE r06 #1).
 *
 * Iterative operators ([[graft.operators.Graph]], the q145/q149 query
 * builders) persist iteration-invariant tables — the GraphX edge-cache
 * discipline. Those caches are DELIBERATELY left alive across queries:
 * Spark's CacheManager dedupes by analyzed plan, so q139/q143/q145/q150 all
 * share one materialized item-edge aggregate instead of rebuilding it four
 * times (measured: the graph family's steady state depends on this reuse).
 *
 * What was previously unbounded — entries accumulating for the JVM lifetime
 * across a 151-query bench and the test suite — is now bounded by this
 * registry: every such persist is registered here, and the session-level
 * harnesses (Bench / Verify / test suites) call [[release]] once their
 * lazily-returned plans are fully materialized. Intermediate per-round
 * state (BFS frontiers) is NOT routed here — it is unpersisted inline by
 * the operator as soon as the next round is materialized.
 */
object CacheReaper {
  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Register a persisted DataFrame for session-end release; returns it. */
  def track(df: DataFrame): DataFrame = { tracked.add(df); df }

  /** Unpersist every tracked DataFrame. Call only at a point where no
    * still-unmaterialized plan depends on the caches (end of a bench /
    * verify run, test-suite teardown). Non-blocking; idempotent. */
  def release(): Unit = {
    var d = tracked.poll()
    while (d != null) {
      try d.unpersist(false) catch { case _: Throwable => () }
      d = tracked.poll()
    }
  }
}
