package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: size the q149 atom graph at a given sf — decides whether
  * the bounded-CC driver guard actually engages. Builds the graph through
  * the SAME `SimilarityOps.entityAtomGraph` the shipped query uses (r11
  * review finding: an earlier copy of the pipeline here would silently
  * desynchronize from q149 edits and report guard sizing for a graph the
  * query no longer builds). Not part of the contract. */
object Q149Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    graft.engine.FastScratch.init()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (g, nn, edges) = graft.engine.ops.SimilarityOps.entityAtomGraph(spark, sfDir)
    println(s"Q149PROBE atoms=${g.count()} namePairs=${nn.count()} atomEdges=${edges.count()}")
    spark.stop()
  }
}
