package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Vector-compression scaling stress (r06): run the REAL q125/q126/q127
 * pipelines (via SparkEntry.queries, reading a generated embeddings
 * parquet) at 1×/10×/100× of a 20k-vector base and report wall time.
 *
 * The claim under test: all three are corpus-linear — q125 is pure map
 * work + a tiny label agg; q126 assigns against a CONSTANT broadcast
 * codebook with a map-side-combined argmin; q127's probe count and
 * distance tables are constant, so the ADC scan is one linear pass over
 * the codes. A scale-safe run therefore grows ~linearly in wall time
 * (modulo the fixed JVM/codegen floor at 1×). Results → SCALING.md.
 *
 * Vectors are deterministic xxhash64 functions of (vec_id, dim) — the
 * StressSimilarity fixture recipe — written as float arrays in the
 * canonical embeddings schema (vec_id, embedding, label).
 *
 * Usage: runMain graft.tools.StressQuant [scales, default "1,10,100"]
 */
object StressQuant {

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val scales = (if (args.nonEmpty) args(0) else "1,10,100")
      .split(",").map(_.trim.toInt).toSeq
    val base = 20000L
    graft.engine.FastScratch.init()
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println("| scale | vectors | q125 sq s | q126 pq s | q127 adc s |")
    println("|---|---|---|---|---|")
    for (scale <- scales) {
      val n = base * scale
      val dir = java.nio.file.Files.createTempDirectory(s"quant_${scale}x").toString
      spark.range(0, n, 1, 32)
        .select(col("id").as("vec_id"),
          expr("""transform(sequence(0, 63),
                 |  i -> cast(cast(xxhash64(id, i) % 1000003 as double) / 1000003.0d as float))""".stripMargin)
            .as("embedding"),
          (col("id") % 10).cast("int").as("label"))
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      // warm each pipeline's codegen once at the smallest scale only —
      // the timed runs then measure data work, not first-touch compile
      def run(q: String): Double =
        timed(graft.SparkEntry.queries(q)(spark, dir).count())._2
      if (scale == scales.head) {
        run("q125_embedding_quantize"); run("q126_pq_codes"); run("q127_pq_adc_topk")
      }
      val sq = run("q125_embedding_quantize")
      val pq = run("q126_pq_codes")
      val adc = run("q127_pq_adc_topk")
      println(f"| ${scale}x | $n | $sq%.1f | $pq%.1f | $adc%.1f |")
    }
    spark.stop()
  }
}
