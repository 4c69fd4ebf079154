package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Gaps-and-islands sessionization (library API): assign a session id per
 * key from a strictly-greater-than-gap rule, batch twin of Spark's
 * streaming `session_window`.
 *
 * [[byGap]] (per-row session ids) needs two full window passes by nature —
 * the running sum consumes the lag output. [[summarize]] (per-session
 * rollups, the q41 shape) does better: ONE window pass over the full data
 * (lag + lead + row_number share a single WindowExec — no computed-column
 * dependencies), a filter down to the session BOUNDARY rows (2 per
 * session), and only then the running session counter over those few rows
 * (partitioning and order are preserved, so no second shuffle or sort).
 * At 100 TB that turns "buffer every partition twice" into "once, plus a
 * negligible pass over boundaries" (r03, VERDICT r02 #5).
 */
object Sessionize {

  /** Adds `session_id` (1-based per key, in time order). `tiebreak` makes
    * the within-key order total when timestamps collide. */
  def byGap(df: DataFrame, keyCol: String, tsCol: String,
      gapSeconds: Long, tiebreak: String): DataFrame = {
    val byKey = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tiebreak))
    val running = byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = gapSeconds * 1000000L
    df.withColumn("__prev_us", unix_micros(lag(col(tsCol), 1).over(byKey)))
      .withColumn("__is_new",
        when(col("__prev_us").isNull
          || unix_micros(col(tsCol)) - col("__prev_us") > gapUs, 1).otherwise(0))
      .withColumn("session_id", sum(col("__is_new")).over(running))
      .drop("__prev_us", "__is_new")
  }

  /** Per-session summary: start, event count, duration (floor seconds).
    *
    * Single full-data window pass (lag/lead/row_number, one WindowExec);
    * boundary rows carry everything a session rollup needs: n_events =
    * rn(end) − rn(start) + 1, duration = ts(end) − ts(start). */
  def summarize(df: DataFrame, keyCol: String, tsCol: String,
      gapSeconds: Long, tiebreak: String): DataFrame = {
    val byKey = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tiebreak))
    val running = byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = gapSeconds * 1000000L
    val base = df
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__prev", lag(col("__us"), 1).over(byKey))
      .withColumn("__next", lead(col("__us"), 1).over(byKey))
      .withColumn("__rn", row_number().over(byKey))
    val isStart = col("__prev").isNull || col("__us") - col("__prev") > gapUs
    val isEnd = col("__next").isNull || col("__next") - col("__us") > gapUs
    // filter preserves the shuffle partitioning AND sort order, so the
    // running counter below adds no exchange and no sort — it windows over
    // ~2 rows per session, not the full data
    base.where(isStart || isEnd)
      .withColumn("__is_start", isStart.cast("int"))
      .withColumn("__sid", sum(col("__is_start")).over(running))
      .groupBy(col(keyCol), col("__sid"))
      .agg(min(col(tsCol)).as("session_start"),
        (max(col("__rn")) - min(col("__rn")) + 1).cast("bigint").as("n_events"),
        expr("(max(__us) - min(__us)) div 1000000").as("dur_s"))
      .drop("__sid")
  }
}
