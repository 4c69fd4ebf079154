package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Similarity scaling stress (r04-end): run the SRP-banded pairwise family
 * (q34/q111's candidate generator, `Similarity.srpBandedPairs`) over
 * synthetic 64-dim vectors at 1×/10×/100× the sf0.1 embeddings volume
 * (5 000 vectors), and report wall time + bucket-size distribution.
 *
 * The claim under test is the documented scale knob itself: bitsPerTable
 * grows with log2(corpus) (6 bits at 1×, 9 at 10×, 13 at 100×), so the
 * per-bucket member count — and with it the per-bucket quadratic pair
 * work — stays FLAT while the corpus grows 100×. A scale-safe run must
 * therefore grow ~linearly in wall time with flat bucket p99. Results are
 * recorded in SCALING.md.
 *
 * Vectors are deterministic functions of (vec_id, dim index) via xxhash64
 * — genuinely decorrelated components (arithmetic scrambles of a shared id
 * leave vectors multiplicatively related — all-pairs-similar, which no
 * blocking scheme can or should compress; no oracle reads these vectors,
 * so portability is not needed here). Near-uniform directions are the
 * worst case for bucket balance claims; real embedding clusters only make
 * buckets more selective.
 *
 * Usage: runMain graft.tools.StressSimilarity [scales, default "1,10,100"]
 */
object StressSimilarity {

  private def vectors(s: SparkSession, n: Long): DataFrame =
    s.range(0, n, 1, 32).select(col("id").as("vec_id"),
      expr("""transform(sequence(0, 63),
             |  i -> cast(xxhash64(id, i) % 1000003 as double) / 1000003.0d)""".stripMargin)
        .as("embedding"))

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val scales = (if (args.nonEmpty) args(0) else "1,10,100")
      .split(",").map(_.trim.toInt).toSeq
    val base = 5000L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println("| scale | vectors | bits/table | seconds | pairs>=0.5 | bucket max | bucket p99 |")
    println("|---|---|---|---|---|---|---|")
    for (scale <- scales) {
      val n = base * scale
      // the knob: keep expected bucket size ~n / 2^bits ≈ 78 constant
      val bits = math.max(6,
        math.ceil(math.log(n.toDouble / 78.0) / math.log(2.0)).toInt)
      // cache the fixture: the interpreted xxhash64-lambda GENERATION is
      // not the operator under test and must not pollute the timing
      val v = vectors(spark, n).persist()
      v.count()
      val bucketed = v.select(col("vec_id"),
        posexplode(array(graft.operators.Similarity
          .srpBuckets(col("embedding"), tables = 8, bitsPerTable = bits, dim = 64): _*))
          .as(Seq("t", "bkt")))
      val stats = bucketed.groupBy("t", "bkt").agg(count(lit(1)).as("m"))
        .agg(max("m").as("mx"), expr("percentile_approx(m, 0.99)").as("p99"))
        .collect()(0)
      val (pairs, secs) = timed(
        graft.operators.Similarity.srpBandedPairs(
          v, "vec_id", "embedding", threshold = 0.5, dim = 64,
          tables = 8, bitsPerTable = bits).count())
      println(f"| ${scale}x | $n | $bits | $secs%.1f | $pairs | ${stats.getLong(0)} | ${stats.getLong(1)} |")
      v.unpersist()
    }
    spark.stop()
  }
}
