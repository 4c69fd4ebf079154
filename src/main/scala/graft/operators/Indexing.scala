package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Deterministic global ordinals — the DataFrame-world zipWithIndex.
 *
 * `ROW_NUMBER() OVER (ORDER BY ...)` funnels the corpus through ONE
 * partition (the canonical scale anti-pattern); `monotonically_increasing_id`
 * is partition-layout-dependent, so re-running on a different cluster
 * renumbers everything. This is the scale-safe, reproducible middle:
 * bucket rows by fixed-width ranges of a roughly-uniform numeric key
 * (bucketing is monotone, so bucket order == key order), count per bucket,
 * prefix-sum the bucket counts into offsets on the tiny aggregated frame,
 * and finish with offset + per-bucket row_number − 1. One corpus shuffle
 * (the per-bucket window) plus an aggregate bounded by `buckets`.
 */
object Indexing {

  /** Global ordinal of each row under ORDER BY (keyCol, tiebreak), without
    * a global sort. `keyCol` must be numeric in [0, keySpace) and roughly
    * uniform (a hash/fingerprint qualifies by construction); `tiebreak`
    * must make (keyCol, tiebreak) unique. At 100 TB raise `buckets` to
    * O(cluster cores) — the per-bucket window is the only corpus-wide
    * stage, and its parallelism is exactly `buckets`. Adds `global_idx`. */
  def globalIndex(df: DataFrame, keyCol: String, tiebreak: String,
      keySpace: Long, buckets: Int = 32): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val width = keySpace / buckets + 1 // ceil-ish: monotone, covers keySpace
    val withB = df.withColumn("__bucket", expr(s"$keyCol div ${width}L"))
    val counts = withB.groupBy("__bucket").agg(count(lit(1)).as("__n"))
    // prefix sum over the ≤`buckets`-row aggregated frame — the bounded
    // single-partition window (the q107 histogram-cumsum pattern), never
    // over the corpus
    val offW = Window.orderBy("__bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__n")).over(offW), lit(0L)))
      .select(col("__bucket").as("__ob"), col("__off"))
    val rnW = Window.partitionBy("__bucket")
      .orderBy(col(keyCol), col(tiebreak))
    withB.join(broadcast(offsets), col("__bucket") === col("__ob"))
      .withColumn("global_idx",
        col("__off") + row_number().over(rnW).cast("long") - 1L)
      .drop("__bucket", "__ob", "__off")
  }
}
