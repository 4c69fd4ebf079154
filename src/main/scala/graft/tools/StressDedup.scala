package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.operators.Dedup

/**
 * Dedup scaling stress (VERDICT r02 #7): run the blocked dedup family over
 * `SyntheticDocsSource withText` corpora at 1×/10×/100× the sf0.1
 * documents volume (5 000 docs) and report wall time + block-size
 * distributions. The planted-dup fraction is constant and cluster sizes
 * are bounded, so a scale-safe implementation must grow ~linearly and its
 * block sizes must stay flat. Results are recorded in SCALING.md.
 *
 * Usage: runMain graft.tools.StressDedup [scales, default "1,10,100"]
 */
object StressDedup {

  private def corpus(s: SparkSession, rows: Long): DataFrame =
    s.read.format("graft-docs")
      .option("rows", rows).option("partitions", 32).option("withText", "true")
      .load().select("doc_id", "text")

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

    println("| scale | docs | op | seconds | result | block max | block p99 |")
    println("|---|---|---|---|---|---|---|")
    for (scale <- scales) {
      val rows = base * scale
      val df = corpus(spark, rows)

      // q31 shape: exact token-set signature clusters
      val (sigN, sigT) = timed(Dedup.signatureClusters(df, "doc_id", "text").count())

      // q32 shape: MinHash-LSH candidate pairs (xxhash64, banded, capped)
      val (mhN, mhT) = timed(
        Dedup.minhashCandidates(df, "doc_id", "text",
          numHashes = 16, bands = 4, bucketCap = 64).count())

      // q48/q75 shape: portable banded-MinHash blocks → pairs → components.
      // Also the block-size distribution the cap argument rests on.
      val keyed = df
        .withColumn("l", split(col("text"), " "))
        .where(size(col("l")) >= 3)
        .select(col("doc_id"), GraftFunctions.hashedShingles("l").as("sh"))
        .select(col("doc_id"),
          posexplode(GraftFunctions.minhashBandKeys("sh")).as(Seq("band", "key")))
      val blocks = keyed.groupBy("band", "key").agg(count(lit(1)).as("n"))
        .agg(max("n").as("mx"),
          expr("percentile_approx(n, 0.99)").as("p99"))
        .collect()(0)
      val (blockMax, blockP99) = (blocks.getLong(0), blocks.getLong(1))
      val a = keyed.select(col("band"), col("key"), col("doc_id").as("doc_a"))
      val b = keyed.select(col("band").as("band_b"), col("key").as("key_b"),
        col("doc_id").as("doc_b"))
      def pairs = a.join(b,
        col("band") === col("band_b") && col("key") === col("key_b")
          && col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
      val (prN, prT) = timed(pairs.count())
      val (ccN, ccT) = timed(
        Dedup.connectedComponents(pairs, "doc_a", "doc_b", maxIter = 20)
          .select("label").distinct().count())

      // q88 shape: exact-substring pairs via the rolling-window inverted
      // index (VERDICT r03 #8 — the newest quadratic-risk operator; the
      // hot-window df cap is what bounds pair generation)
      val (ssN, ssT) = timed(
        Dedup.substringPairs(df.withColumn("toks", split(col("text"), " ")),
          "doc_id", "toks", k = 8, maxDocFreq = 50).count())

      // q124 shape: exact-Jaccard inverted index (promoted r05) — the df
      // cap bounds per-shingle pair generation; the generator-input
      // repartition keeps the pair stage spread when AQE's input-byte
      // coalescing would fold the compacted bucket frame into few tasks
      val shingled = df
        .withColumn("l", split(col("text"), " "))
        .where(size(col("l")) >= 3)
        .select(col("doc_id"), GraftFunctions.hashedShingles("l").as("sh"))
      val (jpN, jpT) = timed(
        Dedup.jaccardPostings(shingled, "doc_id", "sh",
          minJaccard = 0.5, maxDocFreq = 50).count())

      // q116 shape: bucketed global ordinal (r04) — the claim under test is
      // that the construction stays linear with FLAT bucket skew (the
      // fingerprint is uniform, so each of the 32 range buckets carries
      // ~n/32 rows and the per-bucket window never degenerates).
      val fp = df.select(col("doc_id"),
        GraftFunctions.fingerprint("text").as("fingerprint"))
      val (giN, giT) = timed(
        graft.operators.Indexing
          .globalIndex(fp, "fingerprint", "doc_id", keySpace = 1000000007L)
          .agg(max(col("global_idx"))).collect()(0).getLong(0) + 1)

      // block stats apply to the banded-MinHash family only; rows for ops
      // without a blocking stage print "—" so the table can't imply the
      // band numbers describe them
      for ((op, t, n, blocked) <- Seq(
          ("q31 signatureClusters", sigT, sigN, true),
          ("q32 minhashCandidates", mhT, mhN, true),
          ("q48 banded pairs", prT, prN, true),
          ("q75 connectedComponents", ccT, ccN, true),
          ("q88 substringPairs", ssT, ssN, true),
          ("q124 jaccardPostings", jpT, jpN, false),
          ("q116 globalIndex", giT, giN, false))) {
        val (bm, bp) = if (blocked) (blockMax.toString, blockP99.toString)
                       else ("-", "-")
        println(f"| ${scale}x | $rows | $op | $t%.1f | $n | $bm | $bp |")
      }
    }
    spark.stop()
  }
}
