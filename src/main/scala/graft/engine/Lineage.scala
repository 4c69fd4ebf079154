package graft.engine

import org.apache.spark.sql.DataFrame

/**
 * Lineage-truncation helpers for iterative operators (r08).
 *
 * House discipline (SCALING.md §Graph): an iterative operator whose step
 * references its prior state more than once must `localCheckpoint` every
 * step — persist alone bounds neither re-execution nor Catalyst planning
 * (the tree is walked before cached-plan substitution). The cost of that
 * discipline is block lifetime: `Dataset.unpersist` is a NO-OP on a
 * localCheckpoint'ed frame, because the persistence lives at the RDD
 * level where the CacheManager never sees it — blocks are otherwise only
 * reclaimed by GC + the ContextCleaner, which at 100 TB state sizes is
 * real memory pressure (ADVICE r07). This helper exposes the RDD handle
 * so operators can release a dead round's blocks eagerly.
 */
object Lineage {

  /** The RDD behind a `localCheckpoint`ed DataFrame, or None when the
    * frame is not a checkpoint scan (also None-safe against a future
    * Spark that stops exposing LogicalRDD — callers then degrade to
    * ContextCleaner reclamation instead of breaking). */
  def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }

  /** Best-effort eager release of a dead checkpoint frame's blocks — call
    * only once a successor step is materialized (a released frame cannot
    * recompute; correctness must never depend on it being retained). */
  def releaseCheckpoint(df: DataFrame): Unit =
    checkpointRdd(df).foreach { r =>
      try r.unpersist(false) catch { case _: Throwable => () }
    }
}
