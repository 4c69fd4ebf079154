package graft

import org.apache.spark.sql.functions._

import graft.engine.CacheReaper

/** The session-cache registry's contract (r07, ADVICE r06 #1): tracked
  * frames are released on demand, release is idempotent, and a released
  * frame is genuinely uncached (re-use recomputes; no stale blocks). */
class CacheReaperSpec extends SparkTestBase {

  test("track returns its argument; release unpersists and is idempotent") {
    val df = spark.range(0, 1000).withColumn("x", col("id") * 2).persist()
    val tracked = CacheReaper.track(df.toDF())
    assert(tracked.count() === 1000L)
    assert(df.storageLevel.useMemory, "frame should be cached after the action")
    CacheReaper.release()
    assert(!df.storageLevel.useMemory && !df.storageLevel.useDisk,
      "release() must unpersist tracked frames")
    CacheReaper.release() // second release: no tracked frames, no throw
    assert(tracked.count() === 1000L, "released frame must still compute from lineage")
  }

  test("release only touches tracked frames") {
    val tracked = spark.range(0, 10).toDF().persist()
    val untracked = spark.range(100, 200).toDF().persist()
    CacheReaper.track(tracked)
    tracked.count(); untracked.count()
    CacheReaper.release()
    assert(!tracked.storageLevel.useMemory)
    assert(untracked.storageLevel.useMemory,
      "an untracked cache must survive release()")
    untracked.unpersist()
  }
}
