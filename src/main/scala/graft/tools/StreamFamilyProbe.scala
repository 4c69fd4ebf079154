package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.SparkEntry

/** Dev utility: per-batch cost breakdown for every TRUE-streaming query in
  * the suite. Attaches a session-wide listener, runs each key via its
  * normal `SparkEntry.queries` entry (so checkpoints/sinks/partitions are
  * exactly the shipped ones), and prints wall time plus each micro-batch's
  * durationMs split — separating micro-batch fixed overhead (planning,
  * WAL/offset commits, the no-data finalization batch) from data work.
  * Not part of the contract. */
object StreamFamilyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val keys = if (args.length > 2) args(2).split(",").toSeq else Seq(
      "q42_stream_watermark_dedup", "q53_stream_stateful",
      "q56_stream_interval_join", "q61_stream_foreachbatch",
      "q73_stream_static_join", "q93_stream_outer_interval_join",
      "q85_stream_session_native", "q104_stream_incremental_dedup",
      "q105_stream_sliding")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    graft.engine.FastScratch.init()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // One listener PER RUN, removed before its queue is read (r11 review
    // finding: a session-wide listener with clear() between runs both
    // mis-attributes a late event from the previous key to the current
    // one and can drop the current key's final event behind a fixed
    // sleep). Removal bounds attribution; the quiescence poll below
    // bounds omission.
    for (r <- 1 to reps; k <- keys) {
      val batches = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val listener = new StreamingQueryListener {
        override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
          val p = e.progress
          val d = p.durationMs
          batches.add(f"b${p.batchId}[rows=${p.numInputRows} " +
            f"total=${d.getOrDefault("triggerExecution", -1L)} addBatch=${d.getOrDefault("addBatch", -1L)} " +
            f"getBatch=${d.getOrDefault("getBatch", -1L)} latestOffset=${d.getOrDefault("latestOffset", -1L)} " +
            f"commit=${d.getOrDefault("commitOffsets", -1L)} wal=${d.getOrDefault("walCommit", -1L)} " +
            f"state=${p.stateOperators.map(s => s"c=${s.commitTimeMs}").mkString("/")}]")
        }
        override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      }
      spark.streams.addListener(listener)
      val t0 = System.nanoTime()
      SparkEntry.queries(k)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // Drain until the event bus is quiescent: two consecutive 100 ms
      // polls with no new events, capped at 2 s.
      var last = -1
      var stable = 0
      var waited = 0
      while (stable < 2 && waited < 2000) {
        Thread.sleep(100); waited += 100
        if (batches.size == last) stable += 1
        else { stable = 0; last = batches.size }
      }
      spark.streams.removeListener(listener)
      import scala.jdk.CollectionConverters._
      println(f"SFPROBE rep=$r $k%-32s wall=$wall%.2f ${batches.asScala.mkString(" ")}")
    }
    spark.stop()
  }
}
