package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Gaps-and-islands sessionization (library API): assign a session id per
 * key from a strictly-greater-than-gap rule, batch twin of Spark's
 * streaming `session_window`. Two window passes over ONE shuffle on the
 * key (the partitioning is reused), no joins.
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

  /** Per-session summary: start, event count, duration (floor seconds). */
  def summarize(df: DataFrame, keyCol: String, tsCol: String,
      gapSeconds: Long, tiebreak: String): DataFrame =
    byGap(df, keyCol, tsCol, gapSeconds, tiebreak)
      .groupBy(col(keyCol), col("session_id"))
      .agg(min(col(tsCol)).as("session_start"),
        count(lit(1)).as("n_events"),
        expr(s"(unix_micros(max($tsCol)) - unix_micros(min($tsCol))) div 1000000").as("dur_s"))
      .drop("session_id")
}
