package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.engine.Tables

/** Dev utility (r17, VERDICT r16 #2): A/B the q42 self-union source shapes.
  *
  * The shipped q42 builds its at-least-once input as `def src; src.union(src)`
  * — `def` means TWO independent FileStreamSource instances (two directory
  * listings, two offset-log entries, two getBatch scans per micro-batch).
  * Candidates to coalesce the duplication into ONE source:
  *   - "val":    `val src; src.union(src)` — the same logical source node
  *               twice; MicroBatchExecution tracks unique sources, so offset
  *               bookkeeping halves while the scan is still unioned.
  *   - "explode": one source, rows duplicated in-plan via
  *               explode(array(0,1)) — one listing, one scan, same
  *               every-event-arrives-twice property feeding the dedup.
  * All three run the full q42 pipeline (watermark → dropDuplicatesWithin-
  * Watermark → windowed agg → append foreachBatch parquet sink, AvailableNow)
  * and print wall + emitted row count, interleaved round-robin so all
  * variants share the host window (the r13 A/B ordering lesson).
  * Not part of the contract.
  */
object Q42SourceProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    graft.engine.FastScratch.init()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(tag: String)(mkDoubled: SparkSession => DataFrame): Unit = {
      val doubled = mkDoubled(spark)
      val stream = doubled
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("event_id")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("wstart"), col("event_type"), col("n"))
      val target = java.nio.file.Files.createTempDirectory("q42probe").toString
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      val t0 = System.nanoTime()
      try {
        val query = stream.writeStream
          .outputMode("append")
          .foreachBatch { (batch: DataFrame, _: Long) =>
            batch.write.mode("append").parquet(s"$target/out")
          }
          .trigger(Trigger.AvailableNow())
          .start()
        query.awaitTermination()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      val n = spark.read.parquet(s"$target/out").count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"Q42PROBE $tag%-8s wall=$wall%.3f rows=$n")
    }

    for (r <- 1 to reps) {
      println(s"Q42PROBE rep=$r")
      run("def") { s => // shipped shape: two source instances
        def src = Tables.eventsStream(s, sfDir)
        src.union(src)
      }
      run("val") { s => // one source node unioned with itself
        val src = Tables.eventsStream(s, sfDir)
        src.union(src)
      }
      run("explode") { s => // one source, in-plan row duplication
        Tables.eventsStream(s, sfDir)
          .withColumn("dup__", explode(array(lit(0), lit(1))))
          .drop("dup__")
      }
    }
    spark.stop()
  }
}
