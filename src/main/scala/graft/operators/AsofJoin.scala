package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * As-of join (library API): for each left row, the single right row with
 * the greatest `rightTs` strictly earlier than the left row's `leftTs`,
 * matched on an equi key — ASOF LEFT semantics (unmatched lefts keep NULL
 * right columns).
 *
 * Spark has no native ASOF. The scalable formulation is union + one window
 * over a single shuffle on the key: tag both sides, order by time within
 * the key, and carry the latest right timestamp backward with a µs range
 * frame ending at -1 (strict "earlier than", tie-exact). The right payload
 * is then recovered with ONE equi join on (key, matched ts) — never a
 * pairwise time-range join.
 */
object AsofJoin {

  /** @param left   probe rows
    * @param right  reference rows (their latest-earlier row is attached)
    * @param on     equi-key column present in both
    * @param leftTs / rightTs  timestamp columns (TimestampType)
    * @param rightPayload right columns to attach (renamed as given) */
  def left(left: DataFrame, right: DataFrame, on: String,
      leftTs: String, rightTs: String,
      rightPayload: Map[String, String]): DataFrame = {
    val l = left.withColumn("__ts_us", unix_micros(col(leftTs)))
      .withColumn("__side", lit(0))
    val r = right.select(col(on), col(rightTs).as("__rts"))
      .withColumn("__ts_us", unix_micros(col("__rts")))
      .withColumn("__side", lit(1))
    // union only the columns the window needs; left payload stays on `l`
    val lk = l.select(col(on), col("__ts_us"), col("__side"))
    val events = lk.unionByName(r.select(col(on), col("__ts_us"), col("__side")))
    val w = Window.partitionBy(on).orderBy("__ts_us")
      .rangeBetween(Window.unboundedPreceding, -1)
    val matched = events
      .withColumn("__match_us",
        max(when(col("__side") === 1, col("__ts_us"))).over(w))
      .where(col("__side") === 0)
      .select(col(on).as("__k"), col("__ts_us").as("__lts"), col("__match_us"))
      .distinct()
    // attach the left payload back, then the right payload at the matched ts
    val withMatch = l.join(matched,
        col(on) === col("__k") && col("__ts_us") === col("__lts"), "left")
      .drop("__k", "__lts")
    // right side deduped per (key, ts): ONE deterministic survivor row via
    // min_by on the whole payload struct — per-column min() would stitch a
    // synthetic row out of different right rows when the payload has >1
    // column.
    val payloadCols = rightPayload.toSeq.sortBy(_._1)
    val payloadStruct = struct(payloadCols.map { case (src, _) => col(src) }: _*)
    val rightSlim = right
      .groupBy(col(on).as("__rk"), unix_micros(col(rightTs)).as("__rus"))
      .agg(min_by(payloadStruct, payloadStruct).as("__p"))
      .select(Seq(col("__rk"), col("__rus")) ++
        payloadCols.map { case (src, dst) => col("__p").getField(src).as(dst) }: _*)
    withMatch.join(rightSlim,
        col(on) === col("__rk") && col("__match_us") === col("__rus"), "left")
      .drop("__rk", "__rus", "__ts_us", "__side", "__match_us")
  }
}
