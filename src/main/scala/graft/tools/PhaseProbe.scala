package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility (r12): decompose a query's wall time into DataFrame
  * construction, Catalyst planning (analyze→optimize→physical), and
  * execution — to size the per-query FIXED cost the 137-query bench tail
  * pays (VERDICT r11 brief item 1: "attack the floor, not the plans").
  *
  * Usage: runMain graft.tools.PhaseProbe [sfDir] [reps] [q1,q2,...] [warmupDir]
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
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
    // Same warm treatment as Bench so rep 1 isn't classloading. Warmup
    // dir is arg 4 when given, else the smallest-sf sibling of sfDir when
    // present, else sfDir itself; skipped entirely when absent (r13,
    // ADVICE r12 #5: the hardcoded /root/testdata path crashed the probe
    // on any host without it).
    val warmDir = (if (args.length > 3) Seq(args(3)) else Seq.empty[String]) ++
      Seq(new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001").toString,
        sfDir)
    warmDir.find(d => new java.io.File(d).exists()).foreach { d =>
      Seq("q12_join_multiway", "q18_agg_hash", "q25_window_rank")
        .foreach(q => graft.SparkEntry.queries(q)(spark, d).count())
    }
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        (1 to reps).foreach { rep =>
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          val t1 = System.nanoTime()
          df.queryExecution.executedPlan // forces analyze+optimize+planning
          val t2 = System.nanoTime()
          df.count()
          val t3 = System.nanoTime()
          println(f"PHASE $name%-30s rep$rep construct=${(t1-t0)/1e3}%8.0f us " +
            f"plan=${(t2-t1)/1e3}%8.0f us exec=${(t3-t2)/1e3}%8.0f us " +
            f"total=${(t3-t0)/1e9}%6.3f s")
        }
      }
    spark.stop()
  }
}
