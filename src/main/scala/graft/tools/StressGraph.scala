package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Graph-family scaling stress (r06-late): run the REAL q139/q141
 * pipelines (via SparkEntry.queries over generated canonical-schema
 * events parquet) at 1×/10×/100× of an sf0.1-sized base, in TWO catalog
 * regimes, and report wall time.
 *
 * The claims under test:
 * - q139's edge build is corpus-linear (one window pass + map-side-
 *   combined count), and its iterations cost |edge aggregate|, NOT
 *   |events| — so with a FIXED item catalog the iteration side must stay
 *   flat while the corpus grows 100×;
 * - with a GROWING catalog (|items| ∝ scale) the whole pipeline must
 *   still scale ~linearly: the edge aggregate is |observed pairs| and
 *   every iteration shuffle is keyed on node id;
 * - q141 is one map-side-combined aggregation pass — linear, trivially.
 *
 * Fixture: deterministic xxhash64 events (the StressQuality recipe) with
 * VARIED props.$.k so transitions exist; per-user event chains come from
 * a user cardinality that scales with the corpus (constant ~67 events
 * per user, the sf0.1 density).
 *
 * Usage: runMain graft.tools.StressGraph [scales, default "1,10,100"]
 */
object StressGraph {

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val scales = (if (args.nonEmpty) args(0) else "1,10,100")
      .split(",").map(_.trim.toInt).toSeq
    val eventsBase = 100000L // = sf0.1's events row count
    graft.engine.FastScratch.init()
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def writeEvents(dir: String, nEv: Long, nItems: Long): Unit =
      spark.range(0, nEv, 1, 32)
        .select(col("id").as("event_id"),
          timestamp_seconds(lit(1704067200L) +
            pmod(xxhash64(col("id"), lit(1)), lit(2592000L))).as("ts"),
          pmod(xxhash64(col("id"), lit(2)), lit(nEv / 67 + 1)).as("user_id"),
          element_at(array(lit("view"), lit("click"), lit("purchase"),
            lit("signup"), lit("error")),
            (pmod(xxhash64(col("id"), lit(3)), lit(5)) + 1).cast("int")).as("event_type"),
          (pmod(xxhash64(col("id"), lit(4)), lit(50000L)) / lit(100.0)).as("value"),
          concat(lit("""{"k": """),
            pmod(xxhash64(col("id"), lit(6)), lit(nItems)) + 1,
            lit("}")).as("props"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")

    println("| scale | events | regime | items | q139 pagerank s | q141 corr s |")
    println("|---|---|---|---|---|---|")
    for (scale <- scales) {
      val nEv = eventsBase * scale
      for ((regime, nItems) <- Seq("fixed-catalog" -> 100L,
          "growing-catalog" -> 500L * scale)) {
        val dir = java.nio.file.Files
          .createTempDirectory(s"graph_${scale}x_$regime").toString
        writeEvents(dir, nEv, nItems)
        def run(q: String): Double =
          timed(graft.SparkEntry.queries(q)(spark, dir).count())._2
        if (scale == scales.head && regime == "fixed-catalog") {
          run("q139_pagerank"); run("q141_corr_audit") // codegen warm
        }
        val t139 = run("q139_pagerank")
        val t141 = run("q141_corr_audit")
        println(f"| ${scale}x | $nEv | $regime | $nItems | $t139%.1f | $t141%.1f |")
      }
    }

    // BFS hop-linearity (r07, after the frontier localCheckpoint fix):
    // each round is one materialized join+MIN job over O(1)-size plans,
    // so wall time must grow ~linearly in maxHops. The lazy fold was 2^k
    // in EXECUTION; the intermediate persist+count variant still OOMed
    // at 12 hops because the logical tree (walked by Catalyst before
    // cached-plan substitution) doubled per hop — 241 s of planning at
    // h=9. CacheReaper.release() between configs so every run pays its
    // own edge materialization.
    import spark.implicits._
    val nNodes = 200000L
    val bfsEdges = spark.range(0, nNodes * 3, 1, 32)
      .select(pmod(xxhash64(col("id"), lit(11)), lit(nNodes)).as("src"),
        pmod(xxhash64(col("id"), lit(12)), lit(nNodes)).as("dst"))
      .where(col("src") =!= col("dst"))
    val bfsSources = Seq(0L).toDF("v")
    graft.operators.Graph.shortestPaths(bfsEdges, bfsSources, 2).count() // warm
    graft.engine.CacheReaper.release()
    println()
    println(s"| maxHops | reached | wall s (200k nodes / 600k edges) |")
    println("|---|---|---|")
    for (h <- Seq(3, 6, 9, 12)) {
      val (n, t) = timed(
        graft.operators.Graph.shortestPaths(bfsEdges, bfsSources, h).count())
      graft.engine.CacheReaper.release()
      println(f"| $h | $n | $t%.1f |")
    }
    spark.stop()
  }
}
