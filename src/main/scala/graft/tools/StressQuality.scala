package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Data-quality family scaling stress (r06): run the REAL q129/q131/q132/
 * q133 pipelines (via SparkEntry.queries over generated canonical-schema
 * events/documents parquet) at 1×/10×/100× of an sf0.1-sized base and
 * report wall time.
 *
 * The claim under test: the family is corpus-linear —
 * - q129 (outliers) is two map-side-combined aggs + 5-row broadcast
 *   joins: one scan per pass, state per group is 3 decimals;
 * - q131 (EWMA) is ONE WindowExec after one shuffle on user_id: the 8
 *   lag() taps share a single sort pass;
 * - q132 (novelty) explodes to (doc, gram) postings and aggregates per
 *   gram; the join back is posting-count-bound, nothing pairwise;
 * - q133 (funnel) is agg→join→agg chained ON THE SAME KEY (user_id),
 *   so every stage re-partitions identically (co-partitioned at scale).
 * A scale-safe run grows ~linearly in wall time (modulo the fixed
 * JVM/codegen floor at 1×). Results → SCALING.md.
 *
 * Events are deterministic xxhash64 functions of the row id (the
 * StressStream fixture recipe): ts spread over Jan 2024, 5 event types,
 * value with a heavy-ish tail so q129 has real outliers. Documents are
 * token sequences drawn from a 1000-token vocabulary with doc-dependent
 * offsets so gram posting lists stay bounded.
 *
 * Usage: runMain graft.tools.StressQuality [scales, default "1,10,100"]
 */
object StressQuality {

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val scales = (if (args.nonEmpty) args(0) else "1,10,100")
      .split(",").map(_.trim.toInt).toSeq
    val eventsBase = 100000L  // = sf0.1's events row count
    val docsBase = 5000L
    graft.engine.FastScratch.init()
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println("| scale | events | docs | q129 outlier s | q130 tvd s | q131 ewma s | q132 novelty s | q133 funnel s | q134 winsor s | q135 retention s | q136 lift s | q137 iqr s | q138 gap s |")
    println("|---|---|---|---|---|---|---|---|---|---|---|---|---|")
    for (scale <- scales) {
      val nEv = eventsBase * scale
      val nDoc = docsBase * scale
      val dir = java.nio.file.Files.createTempDirectory(s"quality_${scale}x").toString
      spark.range(0, nEv, 1, 32)
        .select(col("id").as("event_id"),
          // spread over Jan 2024 at second granularity
          timestamp_seconds(lit(1704067200L) + pmod(xxhash64(col("id"), lit(1)), lit(2592000L)))
            .as("ts"),
          pmod(xxhash64(col("id"), lit(2)), lit(1500L * scale)).as("user_id"),
          element_at(array(lit("view"), lit("click"), lit("purchase"),
            lit("signup"), lit("error")),
            (pmod(xxhash64(col("id"), lit(3)), lit(5)) + 1).cast("int")).as("event_type"),
          // heavy tail: 1-in-50 rows get a 10× value so q129 finds outliers
          (cast_u(xxhash64(col("id"), lit(4)), 50000) / lit(100.0) *
            when(pmod(xxhash64(col("id"), lit(5)), lit(50)) === 0, 10.0).otherwise(1.0))
            .as("value"),
          lit("""{"k": 1}""").as("props"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      spark.range(0, nDoc, 1, 32)
        .select(col("id").as("doc_id"),
          // 40 tokens from a 1000-token vocab, offset by doc id
          expr("""concat_ws(' ', transform(sequence(0, 39),
                 |  i -> concat('tok', pmod(xxhash64(id, i), 1000))))""".stripMargin)
            .as("text"),
          lit("en").as("lang"), lit("src0").as("source"),
          lit(200L).as("n_chars"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      def run(q: String): Double =
        timed(graft.SparkEntry.queries(q)(spark, dir).count())._2
      val family = Seq("q129_outlier_zscore", "q130_drift_tvd",
        "q131_ewma_smooth", "q132_ngram_novelty", "q133_event_funnel",
        "q134_winsorize", "q135_cohort_retention", "q136_token_lift",
        "q137_outlier_iqr", "q138_interevent_gap")
      if (scale == scales.head) {
        // warm each pipeline's codegen once — timed runs measure data work
        family.foreach(run)
      }
      val t = family.map(run)
      println(f"| ${scale}x | $nEv | $nDoc | ${t.map(v => f"$v%.1f").mkString(" | ")} |")
    }

    // Skew probe for the funnel's left-join chain (Quality.funnel skew
    // note): plant ONE user owning ~a third of all events and compare
    // against the uniform distribution at the same size — the partial-
    // aggregatable MIN + AQE skew splitting should keep the hot key from
    // serializing the stage (ratio ~1×, not rows-on-one-task blowup).
    val nEv = 1000000L
    def writeSkewed(dir: String, skewed: Boolean): Unit =
      spark.range(0, nEv, 1, 32)
        .select(col("id").as("event_id"),
          timestamp_seconds(lit(1704067200L) + pmod(xxhash64(col("id"), lit(1)), lit(2592000L)))
            .as("ts"),
          (if (skewed)
            when(pmod(xxhash64(col("id"), lit(9)), lit(3)) === 0, 0L)
              .otherwise(pmod(xxhash64(col("id"), lit(2)), lit(15000L)))
          else pmod(xxhash64(col("id"), lit(2)), lit(15000L))).as("user_id"),
          element_at(array(lit("view"), lit("click"), lit("purchase"),
            lit("signup"), lit("error")),
            (pmod(xxhash64(col("id"), lit(3)), lit(5)) + 1).cast("int")).as("event_type"),
          lit(1.0).as("value"), lit("""{"k": 1}""").as("props"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val uniDir = java.nio.file.Files.createTempDirectory("funnel_uni").toString
    val skewDir = java.nio.file.Files.createTempDirectory("funnel_skew").toString
    writeSkewed(uniDir, skewed = false)
    writeSkewed(skewDir, skewed = true)
    def funnelTime(dir: String): Double =
      timed(graft.SparkEntry.queries("q133_event_funnel")(spark, dir).count())._2
    funnelTime(uniDir) // warm
    val uni = funnelTime(uniDir)
    val skew = funnelTime(skewDir)
    println(f"FUNNEL SKEW PROBE: uniform $uni%.1f s vs 1-user-owns-33%% $skew%.1f s (ratio ${skew / uni}%.2f)")
    spark.stop()
  }

  /** uniform [0, bound) as a column from a hash — keeps value generation
    * deterministic and engine-independent (no Spark RNG). */
  private def cast_u(h: org.apache.spark.sql.Column, bound: Int) =
    pmod(h, lit(bound.toLong)).cast("double")
}
