package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev utility: where does a true-streaming query's wall time go?
  * Runs the q85 pipeline (watermark + session_window + append foreachBatch)
  * at a parameterized state-partition count and prints per-batch
  * durationMs from the query progress — separating state-store commit
  * cost from micro-batch fixed overhead. Not part of the contract. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val parts = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq else Seq(8, 4, 1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    graft.engine.FastScratch.init()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (p <- parts; r <- 1 to reps) {
      val t0 = System.nanoTime()
      val sessions = graft.engine.Tables.eventsStream(spark, sfDir)
        .withWatermark("ts", "1 hour")
        .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("session_window.start").as("session_start"),
          col("user_id"), col("n_events"))
      val target = java.nio.file.Files.createTempDirectory("probe_sink").toString
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", p.toString)
      val query = try {
        val q = sessions.writeStream
          .outputMode("append")
          .foreachBatch { (batch: DataFrame, _: Long) =>
            batch.write.mode("append").parquet(s"$target/out") // r08: match the shipped single-execution pattern
          }
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        q
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      val wall = (System.nanoTime() - t0) / 1e9
      val batches = query.recentProgress.toSeq.map { pr =>
        val d = pr.durationMs
        f"b${pr.batchId}%s[rows=${pr.numInputRows}%d total=${d.get("triggerExecution")}%dms " +
          f"addBatch=${d.get("addBatch")}%dms getBatch=${d.get("getBatch")}%dms " +
          f"commit=${d.getOrDefault("commitOffsets", -1L)}%dms wal=${d.getOrDefault("walCommit", -1L)}%dms]"
      }.mkString(" ")
      println(f"STREAMPROBE parts=$p%-3d rep=$r wall=$wall%.2f $batches")
    }
    spark.stop()
  }
}
