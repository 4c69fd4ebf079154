package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{Bench, SparkEntry}

/** Dev utility (r17 optimization round, guide §1): measure how much
  * first-run cost still lands in each bench timed slot AFTER the bench's
  * own warm-session pass.
  *
  * Mirrors Bench exactly — FastScratch, local[$SPARK_GRAFT_CPUS], the
  * `Bench.warmupQueries` list at sf0.001, the untimed q52 target-sf
  * materialization — then times ONE pass over all queries in sorted order
  * (pass A = what the bench's timed loop sees), releases the library
  * caches + schema memo (the recapture's library-cold semantics), and
  * times a second pass (pass B = steady). Per query, A−B bounds the
  * residual first-touch cost; shapes with a large gap are candidates for
  * the warm-session list. The gap OVERSTATES what an sf0.001 warmup can
  * recover (pass B also enjoys target-sf OS page cache), so candidates
  * are confirmed on the real bench before shipping.
  */
object WarmupGapProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
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
    val warmSf = "/root/testdata/sf0.001"
    Bench.warmupQueries.foreach { q =>
      try SparkEntry.queries(q)(spark, warmSf).count()
      catch { case e: Throwable => System.err.println(s"warmup $q: $e") }
    }
    try SparkEntry.queries("q52_bucketed_join")(spark, sfDir).count()
    catch { case _: Throwable => () }
    val sorted = SparkEntry.queries.toSeq.sortBy(_._1)
    def pass(): Seq[(String, Double)] = sorted.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val a = pass()
    graft.engine.CacheReaper.release()
    graft.engine.Tables.clearSchemaCache()
    val b = pass().toMap
    a.foreach { case (name, ta) =>
      println(f"GAP $name%-35s A=$ta%6.2f B=${b(name)}%6.2f gap=${ta - b(name)}%6.2f")
    }
    println(f"GAP TOTAL A=${a.map(_._2).sum}%.1f B=${b.values.sum}%.1f")
    graft.engine.CacheReaper.release()
    spark.stop()
  }
}
