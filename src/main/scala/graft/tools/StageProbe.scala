package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev utility: run declared queries with a stage listener, printing each
  * stage's task count, wall/CPU time, and shuffle record in/out counts.
  *
  * Exists because of the q124 finding (r05): AQE coalesces a shuffle read
  * by its INPUT bytes, so a stage whose operator EXPANDS its input (a
  * pair Generator emitting O(n²) rows per bucket row) can silently fold
  * into one task and serialize all downstream work. The tell in this
  * probe's output is a 1-task stage whose `out` is orders of magnitude
  * above its `in` with seconds of CPU; the fix is an explicit spread of
  * the generator input (see Dedup.jaccardPostings).
  *
  * Usage: runMain graft.tools.StageProbe [sfDir] [reps] [q1,q2,...]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for { s <- si.submissionTime; c <- si.completionTime }
          yield c - s).getOrElse(-1L)
        val m = si.taskMetrics
        println(f"STAGE ${si.stageId}%4d tasks=${si.numTasks}%3d " +
          f"wall=$wall%5d ms cpu=${m.executorCpuTime / 1000000}%6d ms " +
          f"in=${m.shuffleReadMetrics.recordsRead}%9d " +
          f"out=${m.shuffleWriteMetrics.recordsWritten}%9d")
      }
    })
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        (1 to reps).foreach { rep =>
          println(s"=== $name rep $rep")
          val t0 = System.nanoTime()
          fn(spark, sfDir).collect()
          println(f"PROBE $name%-28s rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f")
        }
      }
    spark.stop()
  }
}
