package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Posting-join text-family scaling stress (r09, VERDICT r08 #4): the one
 * major family without measured stress evidence. Runs the SHIPPING query
 * code — `SparkEntry.queries(...)`, not re-expressed shapes — for the
 * Σ df²-bounded posting-join queries (q132 novelty, q136 lift, q140 chi²)
 * plus the posting-statistics retrieval pair (q101 TF-IDF, q118 BM25) over
 * synthetic corpora at 1×/10×/100× the sf0.1 documents volume (5 000
 * docs), and reports wall time plus the document-frequency distribution
 * that bounds the join fanout.
 *
 * Why df stats: every query here joins a postings table (doc_id, term|gram)
 * back to a per-term aggregate; the join's output is Σ df per key (linear
 * shapes: q101/q118/q132) or, within the top-100 vocabulary, ≤ C(100,2)
 * pair keys with per-doc fanout ≤ min(|vocab∩doc|, 100)² (q136). The
 * generator's 5 000-word vocabulary means 100× growth raises df per term
 * ~100× while the term count stays flat — exactly the adversarial regime
 * for a posting join (an open vocabulary would grow keys, not df). A
 * scale-safe implementation must stay ~linear in Σ df; superlinear growth
 * here is the knee this tool exists to find.
 *
 * The corpus is written to a temp dir as `documents.parquet` with the
 * canonical documents schema so `Tables.table` + the real query builders
 * run untouched. Results are recorded in SCALING.md.
 *
 * Usage: runMain graft.tools.StressText [scales, default "1,10,100"]
 */
object StressText {

  private val keys = Seq(
    "q101_tfidf_topterms", "q118_bm25_topk",
    "q132_ngram_novelty", "q136_token_lift", "q140_chi2_feature")

  /** Canonical-schema documents table from the deterministic synthetic
    * source (the StressDedup corpus, plus the lang/source/n_chars columns
    * `Tables.normalize` requires). */
  private def corpus(s: SparkSession, rows: Long): DataFrame =
    s.read.format("graft-docs")
      .option("rows", rows).option("partitions", 32).option("withText", "true")
      .load()
      .select(col("doc_id"), col("text"), col("lang"),
        concat(lit("src_"), (col("doc_id") % 7).cast("string")).as("source"),
        length(col("text")).cast("long").as("n_chars"))

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

    println("| scale | docs | op | seconds | rows | df max | df p99 | Σdf |")
    println("|---|---|---|---|---|---|---|---|")
    for (scale <- scales) {
      val rows = base * scale
      val dir = Files.createTempDirectory(s"stress_text_${scale}x")
      corpus(spark, rows).write.mode("overwrite")
        .parquet(dir.resolve("documents.parquet").toString)

      // The df distribution that bounds every posting join below: token
      // postings (q101/q118/q136/q140) — grams (q132) scale the same way
      // on this generator (both vocabularies are closed).
      val tok = graft.engine.Tables.table(spark, dir.toString, "documents")
        .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("t"))
      val dfStats = tok.groupBy("t").agg(count(lit(1)).as("df"))
        .agg(max("df"), expr("percentile_approx(df, 0.99)"), sum("df"))
        .collect()(0)
      val (dfMax, dfP99, dfSum) =
        (dfStats.getLong(0), dfStats.getLong(1), dfStats.getLong(2))

      for (k <- keys) {
        val (n, t) = timed(
          graft.SparkEntry.queries(k)(spark, dir.toString).count())
        println(f"| ${scale}x | $rows | $k | $t%.1f | $n | $dfMax | $dfP99 | $dfSum |")
      }
      // Temp corpora are per-scale; drop eagerly so a 100x run doesn't
      // hold three corpora of parquet on /tmp.
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
    spark.stop()
  }
}
