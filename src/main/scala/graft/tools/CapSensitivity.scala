package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility (r13, VERDICT r12 #2): cap-sensitivity measurement for the
  * blocked-similarity family. The df-cap (q124 `maxDocFreq = 50`) and the
  * SRP bucket cap (q111/q128 `cap = 256`) are SEMANTIC — both sides of the
  * oracle carry them — so a cap may be lowered for speed ONLY if the query
  * output is row-identical at every tested sf. This probe runs each query
  * shape at the shipped cap and a lowered cap, reports wall times and
  * whether the outputs differ (full collected-row set comparison), and is
  * the measurement behind the SCALING.md adjudication. Not part of the
  * contract. */
object CapSensitivity {
  private def rowsOf(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  def main(args: Array[String]): Unit = {
    val sfDirs = if (args.nonEmpty) args(0).split(",").toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timeIt(body: => DataFrame): (Double, Set[String]) = {
      val t0 = System.nanoTime()
      val r = rowsOf(body)
      ((System.nanoTime() - t0) / 1e9, r)
    }

    for (dir <- sfDirs) {
      // q124 shape: df-cap 50 (shipped) vs 32.
      def q124(cap: Int): DataFrame = {
        val sh = graft.engine.Tables.table(spark, dir, "documents")
          .withColumn("l", split(col("text"), " "))
          .where(size(col("l")) >= 3)
          .select(col("doc_id"), graft.functions.GraftFunctions.hashedShingles("l").as("sh"))
        graft.operators.Dedup
          .jaccardPostings(sh, "doc_id", "sh", minJaccard = 0.5, maxDocFreq = cap)
          .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b")).limit(200)
      }
      // warm both shapes once
      q124(50).count()
      for (rep <- 1 to 3) {
        val (t50, r50) = timeIt(q124(50))
        val (t32, r32) = timeIt(q124(32))
        println(f"CAPPROBE $dir q124 rep=$rep cap50=$t50%.2f cap32=$t32%.2f " +
          f"identical=${r50 == r32} rows50=${r50.size} rows32=${r32.size}")
      }
      // q128 shape: SRP bucket cap 256 (shipped) vs 128. Reuses the
      // declared builder by calling the pair generator directly.
      def q128pairs(cap: Int): DataFrame = {
        val n = graft.engine.Tables.table(spark, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
        graft.operators.Similarity.srpBandedPairs(n, "vec_id", "e",
          threshold = 0.10, dim = 64, tables = 8, bitsPerTable = 6,
          bucketCap = cap)
      }
      q128pairs(256).count()
      for (rep <- 1 to 3) {
        val (t256, rA) = timeIt(q128pairs(256).groupBy().count())
        val (t128, rB) = timeIt(q128pairs(128).groupBy().count())
        println(f"CAPPROBE $dir srpPairs rep=$rep cap256=$t256%.2f cap128=$t128%.2f " +
          f"pairCounts=${rA.mkString}/${rB.mkString}")
      }
    }
    spark.stop()
  }
}
