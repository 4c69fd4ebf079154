package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.engine.Tables

/** r18 measurement for VERDICT r17 #3 ("re-measure the localCheckpoint
  * cadence"): shortestPaths materializes every hop's frontier with
  * localCheckpoint (one tiny job per hop). Side A = every hop (shipped),
  * side B = every 2nd hop — the skipped hop's frontier is referenced
  * twice by the next round (union + join arms), so its join+agg executes
  * TWICE there (and its logical plan doubles); the probe measures whether
  * the saved checkpoint job outweighs that locally. Interleaved,
  * library-cold per side, parity-checked. */
object GraphCadenceProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 4
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

    def root() = graft.engine.ops.GraphOps.purchaseCounts(spark, sfDir)
      .orderBy(col("n").desc, col("k")).limit(1).select(col("k").as("v"))

    def bfs(cadence: Int): DataFrame = {
      val e = graft.engine.CacheReaper.track(
        graft.engine.ops.GraphOps.itemEdges(spark, sfDir)
          .select(col("src"), col("dst"))
          .persist(StorageLevel.MEMORY_AND_DISK))
      var d = root().select(col("v"), lit(0L).as("dist")).localCheckpoint()
      for (hop <- 1 to 3) {
        val next0 = d.unionByName(
            e.join(d.withColumnRenamed("v", "src"), "src")
              .select(col("dst").as("v"), (col("dist") + 1).as("dist")))
          .groupBy("v").agg(min("dist").as("dist"))
        val next = if (hop % cadence == 0 || hop == 3) {
          val c = next0.localCheckpoint()
          graft.engine.Lineage.releaseCheckpoint(d)
          c
        } else next0
        d = next
      }
      d
    }
    def side(tag: String): String = {
      graft.engine.CacheReaper.release()
      graft.engine.Tables.clearSchemaCache()
      val t0 = System.nanoTime()
      val out = bfs(if (tag == "A") 1 else 2)
        .select(col("v").cast("int").as("item"), col("dist").as("hops"))
        .orderBy("hops", "item").limit(200)
      val n = out.count()
      f"side=$tag t=${(System.nanoTime() - t0) / 1e9}%.2f rows=$n"
    }
    side("A"); side("B") // untimed codegen warm
    for (r <- 1 to reps) {
      val order = if (r % 2 == 1) Seq("A", "B") else Seq("B", "A")
      order.foreach(t => println(s"GRAPHCAD rep=$r ${side(t)}"))
    }
    spark.stop()
  }
}
