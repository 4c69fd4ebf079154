package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: decode-throughput A/B behind the r11 JsonIntKey swap —
  * the native byte walk vs the Jackson-backed `get_json_object` path on
  * the same events corpus, interleaved in one JVM so JIT/page-cache
  * state is shared (the DbgBuild interleaving discipline). Reported as
  * an aggregate over the extracted key so the whole pipeline stays in
  * one codegen stage and nothing but the decode differs. Not part of
  * the contract. */
object JsonDecodeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    graft.engine.FastScratch.init()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = graft.engine.Tables.table(spark, sfDir, "events")
    def time(label: String, mk: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val r = mk.agg(sum("k")).collect()(0)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"JSONPROBE $label%-10s $dt%.3f s (sum=${r.get(0)})")
    }
    for (_ <- 1 to reps) {
      time("native", ev.select(
        graft.engine.expr.JsonIntKey.of(col("props"), "k").as("k")))
      time("jackson", ev.select(
        get_json_object(col("props"), "$.k").cast("long").as("k")))
    }
    spark.stop()
  }
}
