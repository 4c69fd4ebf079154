package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

import graft.SparkEntry

/** Dev utility (r17 optimization round): dump `explain("formatted")` for a
  * set of queries to files — the `plans/r17/<query>_{before,after}.txt`
  * evidence the optimization judge checks plan claims against.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> [q1,q2,...]
  * (no query list = all declared queries). Runs at the bench's record
  * shape — local[32], 32 shuffle partitions, sf0.1 — so Exchange counts
  * and join strategies match what the timed run plans.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scratch = graft.engine.FastScratch.init()
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    scratch.foreach(d => builder.config("spark.local.dir", d))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try {
          val p = fn(spark, sfDir).queryExecution
            .explainString(ExplainMode.fromString("formatted"))
          Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), p)
          println(s"PLANDUMP $name ok")
        } catch { case e: Throwable =>
          println(s"PLANDUMP $name ERROR ${String.valueOf(e.getMessage).take(80)}")
        }
      }
    graft.engine.CacheReaper.release()
    spark.stop()
  }
}
