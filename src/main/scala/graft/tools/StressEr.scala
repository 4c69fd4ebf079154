package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Entity-resolution scaling stress (r06-late): run the REAL q149 pipeline
 * over generated canonical-schema part tables at 1×/10×/100× of an
 * sf0.1-sized base and report wall time.
 *
 * The claim under test — the point of q149's ATOM-altitude design: the
 * fuzzy-candidate and connected-components work is keyed on the
 * (name, brand, type) vocabulary, whose cardinality does NOT grow with
 * row count; only the initial group-by scan is corpus-linear. So the
 * 100× run must cost ~the scan of 2M rows more than the 1× run, not
 * 100× the clustering work (a row-level formulation's pair set grows
 * ~quadratically in rows-per-name and would dominate).
 *
 * Fixture: deterministic xxhash64 parts over the driver generator's
 * name shape (adjective + noun from small vocabularies → ~64 distinct
 * names), 25 brands × 9 types.
 *
 * Usage: runMain graft.tools.StressEr [scales, default "1,10,100"]
 */
object StressEr {

  def main(args: Array[String]): Unit = {
    val scales = (if (args.nonEmpty) args(0) else "1,10,100")
      .split(",").map(_.trim.toInt).toSeq
    val base = 20000L // = sf0.1's part row count
    graft.engine.FastScratch.init()
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val adjs = Seq("old", "hot", "cold", "new", "big", "dim", "raw", "dry")
    val nouns = Seq("bolt", "rod", "ring", "cog", "pin", "nut", "cam", "gear")
    println("| scale | rows | q149 s |")
    println("|---|---|---|")
    for (scale <- scales) {
      val n = base * scale
      val dir = java.nio.file.Files.createTempDirectory(s"er_${scale}x").toString
      spark.range(0, n, 1, 32)
        .select(col("id").as("p_partkey"),
          concat(
            element_at(array(adjs.map(lit): _*),
              (pmod(xxhash64(col("id"), lit(1)), lit(adjs.size)) + 1).cast("int")),
            lit(" "),
            element_at(array(nouns.map(lit): _*),
              (pmod(xxhash64(col("id"), lit(2)), lit(nouns.size)) + 1).cast("int")))
            .as("p_name"),
          concat(lit("Brand#"), pmod(xxhash64(col("id"), lit(3)), lit(25)))
            .as("p_brand"),
          concat(lit("TYPE"), pmod(xxhash64(col("id"), lit(4)), lit(9)))
            .as("p_type"),
          (pmod(xxhash64(col("id"), lit(5)), lit(50)) + 1).cast("int").as("p_size"),
          (pmod(xxhash64(col("id"), lit(6)), lit(200000L)) / lit(100.0))
            .as("p_retailprice"))
        .write.mode("overwrite").parquet(s"$dir/part.parquet")
      def run(): Double = {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries("q149_entity_resolution")(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      if (scale == scales.head) run() // codegen warm
      println(f"| ${scale}x | $n | ${run()}%.1f |")
    }
    spark.stop()
  }
}
