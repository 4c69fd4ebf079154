package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming dedup ledgers over `flatMapGroupsWithState` — the reusable
 * forms of q104's ingest shape (engine/ops/StreamingOps).
 *
 * Two retention policies:
 *  - q104 itself: the ledger PERSISTS (NoTimeout) — correct when the dedup
 *    scope is "ever ingested" and the fingerprint space is bounded.
 *  - [[dedupWithTtl]] (r05, VERDICT r04 #3): the production variant for
 *    UNBOUNDED streams — a claim holds for a retention horizon measured in
 *    EVENT TIME from the first claim, after which the state store evicts
 *    the key (`GroupStateTimeout.EventTimeTimeout`) and the fingerprint
 *    re-admits. State size is bounded by the distinct keys per horizon, not
 *    per stream lifetime.
 */
object StreamDedup {

  /** One deduplicatable event: `key` is the dedup fingerprint. */
  case class Event(id: Long, key: Long, ts: Timestamp)

  /** One admitted survivor: the MIN id among the batch's claimants of a
    * newly-claimed key (deterministic, like q104 — never "first seen",
    * which is partition-order dependent), with the claimant count. */
  case class Claim(id: Long, key: Long, nClaims: Long)

  /**
   * TTL'd dedup ledger: admit the first claimant of each key, drop later
   * ones while the claim is live, evict the claim once the WATERMARK
   * passes `first claim's max event time + ttlMs`, after which the key
   * re-admits.
   *
   * The caller must set `withWatermark` on the event-time column BEFORE
   * converting to `Dataset[Event]` — EventTimeTimeout requires one — and
   * `ttlMs` must exceed the watermark delay (a timeout timestamp at or
   * below the current watermark is rejected by Spark).
   *
   * Expiry is enforced BOTH ways a key can come back:
   *  - no new data: the state store's timeout fires once the watermark
   *    passes the expiry and the callback removes the state (bounding
   *    state size even for keys never seen again);
   *  - new data first: the data path re-checks `expiry ≤ watermark` and
   *    re-claims immediately, so re-admission does not depend on the
   *    eviction batch having run before the data arrived.
   * A claim is NOT extended by duplicates (retention measures from the
   * FIRST claim) — a steady duplicate trickle cannot keep a key alive
   * forever, which is what bounds state at 100 TB ingest rates.
   */
  def dedupWithTtl(events: Dataset[Event], ttlMs: Long): Dataset[Claim] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[Long, Claim](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, rows: Iterator[Event], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove() // watermark passed the expiry: the key re-admits
            Iterator.empty
          } else if (state.exists && state.get > state.getCurrentWatermarkMs()) {
            Iterator.empty // claim still live: drop all duplicates
          } else {
            // no claim, or an expired claim whose eviction batch hasn't
            // run yet — (re-)admit
            var minId = Long.MaxValue
            var n = 0L
            var maxTs = Long.MinValue
            rows.foreach { e =>
              n += 1
              if (e.id < minId) minId = e.id
              val t = e.ts.getTime
              if (t > maxTs) maxTs = t
            }
            // clamp: a LATE claimant (event time already behind the
            // watermark by more than the TTL) still claims, but its expiry
            // must sit above the watermark — Spark rejects a timeout at or
            // below it — so the claim is evicted at the next opportunity
            // rather than crashing the query on out-of-order input.
            val expiry =
              math.max(maxTs + ttlMs, state.getCurrentWatermarkMs() + 1)
            state.update(expiry)
            state.setTimeoutTimestamp(expiry)
            Iterator(Claim(minId, key, n))
          }
      }
  }
}
