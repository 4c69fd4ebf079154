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
    // "-" as the keys arg = the default family (so A/B confs in args 4+
    // can be passed without spelling out all nine keys).
    val keys = if (args.length > 2 && args(2) != "-") args(2).split(",").toSeq else Seq(
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
    // Optional A/B session confs (r13, VERDICT r12 #1): args 4+ are k=v
    // pairs applied before any run, so a conf lever can be probed against
    // the shipped query builders without editing them. With a leading
    // "--ab" the pairs are instead toggled PER (rep, key) — each key runs
    // once at session defaults (tag A) and once with the confs (tag B),
    // back-to-back, so both sides share the host window (the r13 lesson:
    // sequential full-family runs straddled a window shift and the conf
    // "effect" was the window).
    val abMode = args.length > 3 && args(3) == "--ab"
    val confArgs = args.drop(if (abMode) 4 else 3).map { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => (k, v)
        case _ => sys.error(s"conf arg '$kv' is not k=v (note: --ab must " +
          "be arg 4, immediately after the keys arg)")
      }
    }
    if (!abMode) confArgs.foreach { case (k, v) =>
      spark.conf.set(k, v)
      println(s"SFPROBE conf $k=$v")
    }
    // One listener PER RUN, removed before its queue is read (r11 review
    // finding: a session-wide listener with clear() between runs both
    // mis-attributes a late event from the previous key to the current
    // one and can drop the current key's final event behind a fixed
    // sleep). Removal bounds attribution; the quiescence poll below
    // bounds omission.
    // Side order flips per rep (odd reps A-then-B, even reps B-then-A):
    // the second run of a key inherits its page-cache/JIT warmth, so a
    // fixed order would systematically favor one side.
    def sidesFor(r: Int): Seq[String] =
      if (!abMode) Seq("")
      else if (r % 2 == 1) Seq("A", "B") else Seq("B", "A")
    for (r <- 1 to reps; k <- keys; side <- sidesFor(r)) {
      // B side: apply the confs for exactly this run, then restore.
      val saved = if (side == "B") confArgs.map { case (ck, cv) =>
        val prev = spark.conf.getOption(ck)
        spark.conf.set(ck, cv)
        (ck, prev)
      } else Array.empty[(String, Option[String])]
      val batches = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val listener = new StreamingQueryListener {
        override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
          val p = e.progress
          val d = p.durationMs
          batches.add(f"b${p.batchId}[rows=${p.numInputRows} " +
            f"total=${d.getOrDefault("triggerExecution", -1L)} addBatch=${d.getOrDefault("addBatch", -1L)} " +
            f"plan=${d.getOrDefault("queryPlanning", -1L)} " +
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
      saved.foreach { case (ck, prev) =>
        prev.fold(spark.conf.unset(ck))(spark.conf.set(ck, _))
      }
      import scala.jdk.CollectionConverters._
      val tag = if (side.isEmpty) "" else s" side=$side"
      println(f"SFPROBE rep=$r$tag $k%-32s wall=$wall%.2f ${batches.asScala.mkString(" ")}")
    }
    spark.stop()
  }
}
